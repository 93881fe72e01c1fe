"""Tabulated-cooling mode and data-file tests (synthetic data files with
the exact schema of the grackle distribution files)."""

import numpy as np
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.data.synthetic import make_synthetic_data_file
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs
from grackle_tpu.utilities.testing import assert_rel_equal


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "synthetic_cloudy.h5"
    return str(make_synthetic_data_file(path))


def make_tab_chem(data_file, **kwargs):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = 0
    cd.metal_cooling = 1
    cd.UVbackground = 1
    cd.grackle_data_file = data_file
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in kwargs.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def test_tabulated_h_fraction_override(data_file):
    """Tabulated mode forces the Cloudy H fraction
    (initialize_chemistry_data.c:129-136)."""
    cd = make_tab_chem(data_file)
    np.testing.assert_allclose(
        cd.HydrogenFractionByMass, 1.0 / (1.0 + 0.1 * 3.971), rtol=1e-12
    )


def test_tabulated_temperature_and_cooling(data_file):
    cd = make_tab_chem(data_file)
    n = 41
    fc = FluidContainer(cd, n)
    fc["density"][:] = 1.0
    fc["metal"][:] = 0.01 * fc["density"]
    T_want = np.logspace(2, 8, n)
    # invert: e = T / (gamma-1) / mu / utem with mu from the table; start
    # from mu = 1 and iterate the calculator
    fc["energy"][:] = T_want / cd.temperature_units / (cd.Gamma - 1.0)
    for _ in range(8):
        fc.calculate_temperature()
        mu = np.where(fc["temperature"] > 0,
                      fc["temperature"] / (cd.Gamma - 1.0)
                      / cd.temperature_units / fc["energy"], 1.0)
        fc["energy"] = T_want / cd.temperature_units / mu / \
            (cd.Gamma - 1.0)
    fc.calculate_temperature()
    assert_rel_equal(fc["temperature"], T_want, 2)

    fc.calculate_cooling_time()
    assert np.all(np.isfinite(fc["cooling_time"]))

    # hot gas cools in tabulated mode
    hot = T_want > 1e6
    assert np.all(fc["cooling_time"][hot] < 0)


def test_tabulated_mmw_monotonic(data_file):
    """Tabulated-mode mean molecular weight rises monotonically through
    the ionization transition (test_chemistry.py:226-274 analogue: mmw
    decreases with increasing T / increases with energy)."""
    cd = make_tab_chem(data_file)
    n = 31
    fc = FluidContainer(cd, n)
    fc["density"][:] = 1.0
    fc["metal"][:] = 0.0
    fc["energy"][:] = np.logspace(-2, 5, n)
    fc.calculate_temperature()
    mu = fc["temperature"] / (cd.Gamma - 1.0) / cd.temperature_units \
        / fc["energy"]
    # ionization can only reduce mu as energy increases
    assert np.all(np.diff(mu) <= 1e-10)


def test_tabulated_solve_chemistry(data_file):
    cd = make_tab_chem(data_file)
    n = 16
    fc = FluidContainer(cd, n)
    fc["density"][:] = 10.0
    fc["metal"][:] = 0.02 * fc["density"]
    fc["energy"][:] = np.logspace(2, 4, n)
    fc.calculate_temperature()
    T0 = fc["temperature"].copy()
    fc.calculate_cooling_time()
    dt = 0.1 * np.abs(fc["cooling_time"]).min()
    fc.solve_chemistry(dt)
    fc.calculate_temperature()
    assert np.all(np.isfinite(fc["temperature"]))
    assert not np.allclose(fc["temperature"], T0)


def test_uvb_rates_interpolation(data_file):
    """UVB z-interpolation: active inside [off, on], zero outside, ramped
    (update_UVbackground_rates.c:36-63)."""
    import jax.numpy as jnp
    from grackle_tpu.data.uvb import update_uvb_rates

    cd = ChemistryData()
    cd.use_grackle = 1
    cd.primordial_chemistry = 2
    cd.metal_cooling = 1
    cd.UVbackground = 1
    cd.grackle_data_file = data_file
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    cd.comoving_coordinates = 1
    cd.a_units = 1.0 / 100.0
    cd.a_value = 100.0 / (1.0 + 2.0)  # z = 2
    assert cd.initialize() == 1
    ctx = cd.context

    pr = update_uvb_rates(ctx.config, ctx.uvb, ctx.units)
    assert float(pr.k24) > 0
    assert float(pr.piHI) > 0

    # outside the table's z range -> all zero
    import dataclasses
    units_off = dataclasses.replace(
        ctx.units, a_value=100.0 / (1.0 + 50.0))
    pr_off = update_uvb_rates(ctx.config, ctx.uvb, units_off)
    assert float(pr_off.k24) == 0.0
    assert float(pr_off.piHI) == 0.0


def test_metal_cooling_scales_with_metallicity(data_file):
    cd = make_tab_chem(data_file, UVbackground=0)
    results = {}
    for zfrac in [0.0, 0.04]:
        n = 8
        fc = FluidContainer(cd, n)
        fc["density"][:] = 1.0
        fc["metal"][:] = zfrac * fc["density"]
        fc["energy"][:] = 1.0e3
        fc.calculate_cooling_time()
        results[zfrac] = fc["cooling_time"].copy()
    # metal-enriched gas cools faster
    assert np.all(
        np.abs(results[0.04]) < np.abs(results[0.0])
    )
