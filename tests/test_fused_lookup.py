"""The fused two-hot-matmul lookup path must agree with the native
gather path (both implement the identical linear interpolation; the
matmul accumulates exact zeros elsewhere)."""

import numpy as np
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.data.synthetic import make_synthetic_data_file
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "synthetic_cloudy.h5"
    return str(make_synthetic_data_file(path))


def make_chem(fused, chem=3, data_file=None, **kwargs):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = chem
    cd.use_fused_lookup = fused
    if data_file:
        cd.metal_cooling = 1
        cd.dust_chemistry = 1
        cd.grackle_data_file = data_file
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in kwargs.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def setup(cd, n=24):
    rng = np.random.RandomState(5)
    fc = FluidContainer(cd, n)
    tiny = 1e-20
    fc["density"][:] = 10.0 ** rng.uniform(-1, 3, n)
    fc["HI"][:] = 0.5 * 0.76 * fc["density"]
    fc["HII"][:] = 0.5 * 0.76 * fc["density"]
    fc["HeI"][:] = 0.24 * fc["density"]
    fc["HeII"][:] = tiny
    fc["HeIII"][:] = tiny
    fc["de"][:] = fc["HII"]
    if cd.primordial_chemistry > 1:
        fc["HM"][:] = tiny
        fc["H2I"][:] = 1e-4 * fc["density"]
        fc["H2II"][:] = tiny
    if cd.primordial_chemistry > 2:
        fc["DI"][:] = 2.0 * 3.4e-5 * fc["density"]
        fc["DII"][:] = tiny
        fc["HDI"][:] = tiny
    if cd.metal_cooling:
        fc["metal"][:] = 1e-3 * fc["density"]
    else:
        fc["metal"][:] = 0.0
    T = 10.0 ** rng.uniform(3.5, 6.5, n)
    fc.calculate_mean_molecular_weight()
    fc["energy"] = (T / cd.temperature_units / fc["mu"]
                    / (cd.Gamma - 1.0))
    return fc


@pytest.mark.parametrize("chem", [1, 3])
def test_fused_matches_gather_solve(chem, data_file):
    out = {}
    for fused in [0, 1]:
        cd = make_chem(fused, chem, data_file)
        fc = setup(cd)
        fc.solve_chemistry(1.0e-4)
        out[fused] = {k: fc[k].copy()
                      for k in ["HI", "HII", "de", "energy"]}
    # dust configs use the rank-16 log-SVD h2dust factorization on the
    # fused path (reconstruction error ~2e-9), so agreement is slightly
    # looser than the exact-zero-accumulation 1-D lookups
    for name in ["HI", "HII", "de", "energy"]:
        np.testing.assert_allclose(
            out[1][name], out[0][name], rtol=1e-7, err_msg=name
        )


def test_fused_matches_gather_tabulated(data_file):
    out = {}
    for fused in [0, 1]:
        cd = make_chem(fused, 0, data_file, UVbackground=1,
                       dust_chemistry=0, h2_on_dust=0,
                       dust_recombination_cooling=0)
        fc = FluidContainer(cd, 16)
        fc["density"][:] = np.logspace(-1, 2, 16)
        fc["metal"][:] = 0.01 * fc["density"]
        fc["energy"][:] = np.logspace(1, 4, 16)
        fc.calculate_temperature()
        t = fc["temperature"].copy()
        fc.calculate_cooling_time()
        out[fused] = (t, fc["cooling_time"].copy())
    np.testing.assert_allclose(out[1][0], out[0][0], rtol=1e-10)
    np.testing.assert_allclose(out[1][1], out[0][1], rtol=1e-10)
