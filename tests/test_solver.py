"""Solver behavior tests across all chemistry tiers."""

import numpy as np
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


def make_chem(primordial_chemistry=1, **kwargs):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = primordial_chemistry
    cd.metal_cooling = 0
    cd.UVbackground = 0
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in kwargs.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def make_fc(cd, n=32, T0=1.0e6, density=1.0, fh=0.76):
    fc = FluidContainer(cd, n)
    tiny = 1e-20
    fc["density"][:] = density
    if cd.primordial_chemistry > 0:
        fc["HII"][:] = fh * fc["density"]
        fc["HI"][:] = tiny * fc["density"]
        fc["HeI"][:] = (1.0 - fh) * fc["density"]
        fc["HeII"][:] = tiny
        fc["HeIII"][:] = tiny
        fc["de"][:] = fc["HII"] + fc["HeII"] / 4 + fc["HeIII"] / 2
    if cd.primordial_chemistry > 1:
        fc["HM"][:] = tiny * fc["density"]
        fc["H2I"][:] = tiny * fc["density"]
        fc["H2II"][:] = tiny * fc["density"]
    if cd.primordial_chemistry > 2:
        fc["DI"][:] = 2.0 * 3.4e-5 * fc["density"]
        fc["DII"][:] = tiny * fc["density"]
        fc["HDI"][:] = tiny * fc["density"]
    fc["metal"][:] = 0.0
    fc.calculate_mean_molecular_weight()
    # mu from species requires nonzero dust check passthrough; fall back
    mu = fc["mu"]
    fc["energy"][:] = T0 / cd.temperature_units / mu / (cd.Gamma - 1.0)
    return fc


@pytest.mark.parametrize("chem", [1, 2, 3])
def test_solver_runs_all_tiers(chem):
    cd = make_chem(chem)
    fc = make_fc(cd, n=16)
    fc.calculate_cooling_time()
    assert np.all(np.isfinite(fc["cooling_time"]))
    dt = 0.01 * np.abs(fc["cooling_time"]).min()
    fc.solve_chemistry(dt)
    for name in ["HI", "HII", "de", "energy"]:
        assert np.all(np.isfinite(fc[name])), name
        assert np.all(fc[name] > 0), name


@pytest.mark.parametrize("chem", [1, 2, 3])
def test_elemental_conservation(chem):
    """After the solve, H/He/D sum to the configured mass fractions
    (make_consistent_g semantics)."""
    cd = make_chem(chem)
    fc = make_fc(cd, n=16, T0=2.0e4)
    fc.calculate_cooling_time()
    dt = 0.05 * np.abs(fc["cooling_time"]).min()
    for _ in range(3):
        fc.solve_chemistry(dt)
    d = fc["density"]
    totalH = fc["HI"] + fc["HII"]
    if chem > 1:
        totalH = totalH + fc["HM"] + fc["H2I"] + fc["H2II"]
    np.testing.assert_allclose(totalH, 0.76 * d, rtol=1e-10)
    totalHe = fc["HeI"] + fc["HeII"] + fc["HeIII"]
    np.testing.assert_allclose(totalHe, 0.24 * d, rtol=1e-10)
    if chem > 2:
        totalD = fc["DI"] + fc["DII"] + 2.0 / 3.0 * fc["HDI"]
        np.testing.assert_allclose(
            totalD, 0.76 * 2.0 * 3.4e-5 * d, rtol=1e-10
        )
    # charge conservation
    de = fc["HII"] + fc["HeII"] / 4.0 + fc["HeIII"] / 2.0
    if chem > 1:
        de = de - fc["HM"] + fc["H2II"] / 2.0
    np.testing.assert_allclose(fc["de"], de, rtol=1e-12)


def test_hot_gas_cools():
    cd = make_chem(1)
    fc = make_fc(cd, n=8, T0=1.0e7)
    fc.calculate_temperature()
    T0 = fc["temperature"].copy()
    fc.calculate_cooling_time()
    assert np.all(fc["cooling_time"] < 0)  # net cooling
    dt = 0.1 * np.abs(fc["cooling_time"]).min()
    fc.solve_chemistry(dt)
    fc.calculate_temperature()
    assert np.all(fc["temperature"] < T0)


def test_cooling_off_preserves_energy():
    cd = make_chem(1, with_radiative_cooling=0)
    fc = make_fc(cd, n=8, T0=1.0e6)
    e0 = fc["energy"].copy()
    fc.calculate_cooling_time()
    dt = 0.1 * np.abs(fc["cooling_time"]).min()
    fc.solve_chemistry(dt)
    np.testing.assert_array_equal(fc["energy"], e0)


def test_max_iterations_diagnostics():
    cd = make_chem(1)
    fc = make_fc(cd, n=8, T0=1.0e6)
    fields = fc._solver_fields()
    fc.calculate_cooling_time()
    dt = 0.5 * np.abs(fc["cooling_time"]).min()
    new_f, diag = cd.solve_chemistry(fields, dt)
    assert int(diag["n_iterations"]) >= 1
    assert bool(np.all(np.asarray(diag["converged"])))


def test_user_heating_fields():
    """Specific/volumetric heating arrays shift the energy evolution
    (analogue of test_specific_heating_rate.py /
    test_volumetric_heating_rate.py)."""
    base = {}
    for mode in ["none", "specific", "volumetric"]:
        kwargs = {}
        if mode == "specific":
            kwargs["use_specific_heating_rate"] = 1
        if mode == "volumetric":
            kwargs["use_volumetric_heating_rate"] = 1
        cd = make_chem(1, **kwargs)
        fc = make_fc(cd, n=4, T0=1.0e4, density=0.1)
        if mode == "specific":
            fc["specific_heating_rate"][:] = 1.0e-2   # erg/s/g
        if mode == "volumetric":
            fc["volumetric_heating_rate"][:] = 1.0e-26  # erg/s/cm^3
        dt = 1.0e-4
        fc.solve_chemistry(dt)
        base[mode] = fc["energy"].copy()
    assert np.all(base["specific"] > base["none"])
    assert np.all(base["volumetric"] > base["none"])


def test_three_body_option_changes_solution():
    results = {}
    for tb in [0, 4]:
        cd = make_chem(2, three_body_rate=tb)
        fc = make_fc(cd, n=4, T0=1.0e3, density=1.0e8)
        fc.solve_chemistry(1.0e-6)
        results[tb] = fc["H2I"].copy()
    rel = np.abs(results[0] / results[4] - 1.0)
    assert np.all(rel > 1e-9), rel


@pytest.mark.parametrize("tb", [0, 1, 4])
def test_three_body_fused_lookup(tb):
    """Fused-lookup solve works for every three_body_rate branch.

    Regression: the config-pruned stacked chem matrix drops the k13dd
    columns when three_body_rate != 0, but lookup_cool_rates used to
    request them unconditionally for ispecies > 1 (KeyError under
    use_fused_lookup=1)."""
    cd = make_chem(2, three_body_rate=tb, use_fused_lookup=1)
    fc = make_fc(cd, n=4, T0=1.0e3, density=1.0e8)
    fc.solve_chemistry(1.0e-6)
    assert np.all(np.isfinite(fc["H2I"]))
    assert np.all(fc["H2I"] > 0)
