"""float32 solver mode (the runtime analogue of the reference's
CONFIG_PRECISION=32 build, grackle_types.h:24-34)."""

import numpy as np
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


def make_chem(precision, chem=1, **kwargs):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = chem
    cd.precision = precision
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in kwargs.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def setup(cd, n=24):
    rng = np.random.RandomState(3)
    fc = FluidContainer(cd, n)
    tiny = 1e-20
    fc["density"][:] = 10.0 ** rng.uniform(-1, 2, n)
    fc["HI"][:] = 0.5 * 0.76 * fc["density"]
    fc["HII"][:] = 0.5 * 0.76 * fc["density"]
    fc["HeI"][:] = 0.24 * fc["density"]
    fc["HeII"][:] = tiny
    fc["HeIII"][:] = tiny
    fc["de"][:] = fc["HII"] + fc["HeII"] / 4 + fc["HeIII"] / 2
    if cd.primordial_chemistry > 1:
        fc["HM"][:] = tiny
        fc["H2I"][:] = 1e-5 * fc["density"]
        fc["H2II"][:] = tiny
    if cd.primordial_chemistry > 2:
        fc["DI"][:] = 2.0 * 3.4e-5 * fc["density"]
        fc["DII"][:] = tiny
        fc["HDI"][:] = tiny
    fc["metal"][:] = 0.0
    T = 10.0 ** rng.uniform(4.5, 6.5, n)
    fc.calculate_mean_molecular_weight()
    fc["energy"] = (T / cd.temperature_units / fc["mu"]
                    / (cd.Gamma - 1.0))
    return fc


@pytest.mark.parametrize("chem", [1, 3])
def test_f32_matches_f64(chem):
    """The float32 build tracks the double build to ~1e-3 over one
    physically-sized step (the reference's float build carries the same
    accuracy class: tolerance 1e-5 vs 1e-10)."""
    results = {}
    for prec in [64, 32]:
        cd = make_chem(prec, chem)
        fc = setup(cd)
        fc.calculate_cooling_time()
        dt = 0.1 * np.abs(fc["cooling_time"]).min()
        fc.solve_chemistry(dt)
        results[prec] = {k: fc[k].copy()
                         for k in ["HI", "HII", "de", "energy"]}
        assert fc["HI"].dtype == np.float64  # container is always f64

    for name in ["HI", "HII", "de", "energy"]:
        np.testing.assert_allclose(
            results[32][name], results[64][name], rtol=5e-3,
            err_msg=name,
        )


def test_f32_dtype_threaded():
    import jax.numpy as jnp

    cd = make_chem(32)
    ctx = cd.context
    assert ctx.tables.k1.dtype == jnp.float32
    fc = setup(cd, n=8)
    t = cd.calculate_temperature(fc._solver_fields())
    assert t.dtype == jnp.float32
