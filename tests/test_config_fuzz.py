"""Random-configuration property fuzz of the solve path.

The reference's initialization sweep covers 7 curated parameter sets
(grackle: src/python/tests/test_initialisation.py:40-183).  This module
generalizes that idea to the SOLVE path: ~50 seeded random draws over the
valid parameter lattice (chemistry tier x dust x UVB x shielding x RT x
heating x H2 variants x rate options), each run for a few steps on a
small cell batch, asserting every output field is finite, species stay
non-negative-bounded (>= the solver's tiny floor semantics, i.e. no NaN
or negative densities), and the subcycle loop converges.  Catches
flag-interaction crashes and NaN regimes that curated tests cannot.
"""

import numpy as np
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.data.synthetic import make_synthetic_data_file
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs

N_CONFIGS = 50
N_CELLS = 8
N_STEPS = 3
DT = 1.0e-4


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "synthetic_cloudy.h5"
    return str(make_synthetic_data_file(path))


def _draw_config(rng):
    """One random VALID parameter combination (mirrors the constraint
    rules of config.resolve_config / initialize_chemistry_data.c)."""
    p = {}
    chem = int(rng.choice([0, 1, 2, 3]))
    p["primordial_chemistry"] = chem
    metal = int(rng.choice([0, 1]))
    p["metal_cooling"] = metal
    # dust requires metal cooling (initialize_chemistry_data.c:71-105)
    dust = int(rng.choice([0, 1])) if metal else 0
    p["dust_chemistry"] = dust
    uvb = int(rng.choice([0, 1]))
    p["UVbackground"] = uvb
    if uvb and chem >= 1:
        p["self_shielding_method"] = int(rng.choice([0, 1, 2, 3]))
    if chem >= 1:
        p["use_radiative_transfer"] = int(rng.choice([0, 1]))
        p["CaseBRecombination"] = int(rng.choice([0, 1]))
    if chem >= 2:
        # option 1 needs a 3-D grid; fuzz the pointwise variants
        p["H2_self_shielding"] = int(rng.choice([0, 2, 3]))
        p["H2_custom_shielding"] = int(rng.choice([0, 1]))
        p["three_body_rate"] = int(rng.choice([0, 1, 2, 3, 4, 5]))
        p["h2_cooling_variant"] = int(rng.choice([0, 1, 2]))
        p["cie_cooling"] = int(rng.choice([0, 1]))
        p["h2_optical_depth_approximation"] = int(rng.choice([0, 1]))
        p["h2_charge_exchange_rate"] = int(rng.choice([1, 2]))
        p["h2_dust_rate"] = int(rng.choice([1, 2]))
        p["h2_h_cooling_rate"] = int(rng.choice([1, 2]))
    p["use_volumetric_heating_rate"] = int(rng.choice([0, 1]))
    p["use_specific_heating_rate"] = int(rng.choice([0, 1]))
    p["cmb_temperature_floor"] = int(rng.choice([0, 1]))
    p["Compton_xray_heating"] = int(rng.choice([0, 1]))
    if rng.rand() < 0.3:
        p["LWbackground_intensity"] = float(10.0 ** rng.uniform(-2, 1))
        p["LWbackground_sawtooth_suppression"] = int(rng.choice([0, 1]))
    if dust:
        p["photoelectric_heating"] = int(rng.choice([0, 1, 2, 3]))
        p["interstellar_radiation_field"] = float(
            10.0 ** rng.uniform(-1, 1))
        p["use_isrf_field"] = int(rng.choice([0, 1]))
        p["use_dust_density_field"] = int(rng.choice([0, 1]))
        p["dust_recombination_cooling"] = int(rng.choice([0, 1]))
    if (chem == 0 and not uvb and not dust
            and not p["use_volumetric_heating_rate"]
            and not p["use_specific_heating_rate"]):
        p["exact_cooling"] = int(rng.choice([0, 1]))
    # exercise both lookup machineries (fused is the TPU production
    # path but CPU CI only sees it when forced)
    p["use_fused_lookup"] = int(rng.choice([0, 1]))
    return p


def _make_state(cd, rng, n=N_CELLS):
    chem = cd.primordial_chemistry
    fc = FluidContainer(cd, n)
    tiny = 1e-20
    fc["density"][:] = 10.0 ** rng.uniform(-1, 4, n)
    if chem > 0:
        x_ion = 10.0 ** rng.uniform(-6, 0, n)
        fc["HI"][:] = (1 - x_ion) * 0.76 * fc["density"]
        fc["HII"][:] = x_ion * 0.76 * fc["density"]
        fc["HeI"][:] = 0.24 * fc["density"]
        fc["HeII"][:] = tiny
        fc["HeIII"][:] = tiny
        fc["de"][:] = fc["HII"]
    if chem > 1:
        fc["HM"][:] = tiny
        fc["H2I"][:] = 10.0 ** rng.uniform(-8, -3, n) * fc["density"]
        fc["H2II"][:] = tiny
    if chem > 2:
        fc["DI"][:] = 2.0 * 3.4e-5 * fc["density"]
        fc["DII"][:] = tiny
        fc["HDI"][:] = tiny
    if cd.metal_cooling:
        fc["metal"][:] = 10.0 ** rng.uniform(-5, -2, n) * fc["density"]
    if cd.use_dust_density_field:
        fc["dust"][:] = 1.0e-2 * fc["metal"]
    if cd.use_radiative_transfer:
        fc["RT_HI_ionization_rate"][:] = 10.0 ** rng.uniform(-14, -10, n)
        fc["RT_heating_rate"][:] = 10.0 ** rng.uniform(-30, -26, n)
        if chem > 0:
            fc["RT_HeI_ionization_rate"][:] = 1e-13
            fc["RT_HeII_ionization_rate"][:] = 1e-14
        if chem > 1:
            fc["RT_H2_dissociation_rate"][:] = 1e-13
    if cd.H2_custom_shielding:
        fc["H2_custom_shielding_factor"][:] = rng.uniform(0.1, 1.0, n)
    if cd.H2_self_shielding == 2:
        fc["H2_self_shielding_length"][:] = 10.0 ** rng.uniform(-4, -2, n)
    if cd.use_volumetric_heating_rate:
        fc["volumetric_heating_rate"][:] = 10.0 ** rng.uniform(-30, -26, n)
    if cd.use_specific_heating_rate:
        fc["specific_heating_rate"][:] = 10.0 ** rng.uniform(-10, -6, n)
    if cd.use_isrf_field:
        fc["isrf_habing"][:] = 10.0 ** rng.uniform(-1, 1, n)
    T = 10.0 ** rng.uniform(2.0, 7.5, n)
    mu = 0.6 if chem else 1.0
    fc["energy"][:] = T / cd.temperature_units / mu / (cd.Gamma - 1.0)
    return fc


@pytest.mark.parametrize("seed", range(N_CONFIGS))
def test_random_config_solve(seed, data_file):
    rng = np.random.RandomState(1000 + seed)
    params = _draw_config(rng)

    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.grackle_data_file = data_file
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in params.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1, params

    fc = _make_state(cd, rng)
    fields = fc._solver_fields()
    for _ in range(N_STEPS):
        new_f, diag = cd.solve_chemistry(fields, DT)
        fields = {k: np.asarray(v) for k, v in new_f.items()}
        for name, arr in fields.items():
            assert np.all(np.isfinite(arr)), (params, name)
        # densities stay positive (the solver floors at tiny, never 0/neg)
        for name in ("density", "energy", "HI", "de", "H2I", "DI"):
            if name in fields:
                assert np.all(np.asarray(fields[name]) > 0), (params, name)
        assert bool(np.all(np.asarray(diag["converged"]))), params

    # the derived-field calculators walk the same config-pruned tables;
    # they must stay finite on the evolved state too
    for name, val in fields.items():
        if name in fc:
            fc[name] = np.array(val, dtype=fc.dtype)
    fc.calculate_cooling_time()
    fc.calculate_temperature()
    fc.calculate_pressure()
    fc.calculate_gamma()
    checks = ["cooling_time", "temperature", "pressure", "gamma"]
    if cd.dust_chemistry:
        fc.calculate_dust_temperature()
        checks.append("dust_temperature")
    for name in checks:
        assert np.all(np.isfinite(fc[name])), (params, name)
    assert np.all(fc["temperature"] > 0), params
