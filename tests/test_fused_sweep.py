"""Fused-vs-gather parity across option branches.

The fused two-hot lookup path is auto-enabled only on accelerators, so
CPU CI never exercises it unless forced.  This sweep forces
use_fused_lookup=1 across every physics-option branch that changes the
stacked-matrix column layout or the in-loop lookup structure, and
checks each against the gather path (regression net for
config-pruning bugs like the three_body_rate k13dd KeyError)."""

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


# name -> (chem tier, needs_data_file, params)
BRANCHES = {
    "chem2": (2, False, {}),
    "h2_variant_gp99": (2, False, {"h2_cooling_variant": 1}),
    "h2_variant_leppshull": (2, False, {"h2_cooling_variant": 2}),
    "cie_cooling": (2, False, {"cie_cooling": 1,
                               "h2_optical_depth_approximation": 1}),
    "uvb_shield1": (3, True, {"UVbackground": 1,
                              "self_shielding_method": 1}),
    "uvb_shield2": (3, True, {"UVbackground": 1,
                              "self_shielding_method": 2}),
    "uvb_shield3": (3, True, {"UVbackground": 1,
                              "self_shielding_method": 3}),
    "h2_self_shield_jeans": (2, False, {"H2_self_shielding": 3}),
    "h2_custom_shield": (2, False, {"H2_custom_shielding": 1}),
    "rt_coupled": (2, False, {"use_radiative_transfer": 1}),
    "pe_heating3": (3, True, {"photoelectric_heating": 3,
                              "interstellar_radiation_field": 1.5}),
    "volumetric_heating": (1, False, {"use_volumetric_heating_rate": 1}),
    "three_body4_dust": (3, True, {"three_body_rate": 4}),
    "h2_self_shield_userlength": (2, False, {"H2_self_shielding": 2}),
    "tabulated_uvb": (0, True, {"UVbackground": 1, "dust_chemistry": 0}),
    # dense-collapse regime: activates the high-density H2-equilibrium
    # dt limiter (solve_rate_cool_g.F:592-643) that quiescent states
    # never reach
    "dense_collapse": (2, False, {"_dense": True}),
}


def _run(fused, chem, data_file, params):
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
    params = dict(params)
    dense = params.pop("_dense", False)
    for k, v in params.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1

    n = 16
    rng = np.random.RandomState(7)
    fc = FluidContainer(cd, n)
    tiny = 1e-20
    if dense:
        fc["density"][:] = 10.0 ** rng.uniform(8, 12, n)
    else:
        fc["density"][:] = 10.0 ** rng.uniform(-1, 3, n)
    if chem > 0:
        fc["HI"][:] = 0.5 * 0.76 * fc["density"]
        fc["HII"][:] = 0.5 * 0.76 * fc["density"]
        fc["HeI"][:] = 0.24 * fc["density"]
        fc["HeII"][:] = tiny
        fc["HeIII"][:] = tiny
        fc["de"][:] = fc["HII"]
    if chem > 1:
        fc["HM"][:] = tiny
        fc["H2I"][:] = 1e-4 * fc["density"]
        fc["H2II"][:] = tiny
    if chem > 2:
        fc["DI"][:] = 2.0 * 3.4e-5 * fc["density"]
        fc["DII"][:] = tiny
        fc["HDI"][:] = tiny
    fc["metal"][:] = (1e-3 * fc["density"]) if cd.metal_cooling else 0.0
    if cd.use_radiative_transfer:
        fc["RT_HI_ionization_rate"][:] = 1e-12
        fc["RT_heating_rate"][:] = 1e-28
        if chem > 1:
            fc["RT_H2_dissociation_rate"][:] = 1e-13
    if cd.H2_custom_shielding:
        fc["H2_custom_shielding_factor"][:] = 0.7
    if cd.H2_self_shielding == 2:
        fc["H2_self_shielding_length"][:] = 1.0e-3
    if cd.use_volumetric_heating_rate:
        fc["volumetric_heating_rate"][:] = 1e-26
    T = 10.0 ** rng.uniform(3.5, 6.0, n)
    fc.calculate_mean_molecular_weight()
    fc["energy"] = T / cd.temperature_units / fc["mu"] / (cd.Gamma - 1.0)
    fc.solve_chemistry(1.0e-4)
    # derived-field calculators walk the same config-pruned lookup
    # machinery; exercise them all in every branch
    fc.calculate_cooling_time()
    fc.calculate_temperature()
    fc.calculate_pressure()
    fc.calculate_gamma()
    keys = ["energy", "cooling_time", "temperature", "pressure", "gamma"]
    if chem > 0:
        keys += ["HI", "de"]
    if chem > 1:
        keys += ["H2I"]
    if cd.dust_chemistry:
        fc.calculate_dust_temperature()
        keys += ["dust_temperature"]
    return {k: fc[k].copy() for k in keys}


@pytest.mark.parametrize("branch", sorted(BRANCHES))
def test_fused_gather_parity(branch, data_file):
    chem, needs_data, params = BRANCHES[branch]
    out = {f: _run(f, chem, data_file if needs_data else None, params)
           for f in [0, 1]}
    for name, ref in out[0].items():
        assert np.all(np.isfinite(out[1][name])), (branch, name)
        # rtol 1e-5 + scale-aware atol: dust configs evaluate h2dust
        # through the rank-16 log-SVD on the fused path (~5e-9 rate
        # difference), which perturbs the per-cell subcycle sequence;
        # near-floor species (H2I ~ 1e-18 of the cell density) shift by
        # ~1e-5 relative (physically zero) and dominant abundances by
        # ~1e-6.  The tight 1e-7 lock on the canonical config lives in
        # test_fused_lookup.py; this sweep is the option-branch net.
        np.testing.assert_allclose(
            out[1][name], ref, rtol=1e-5,
            atol=1e-10 * float(np.abs(ref).max()),
            err_msg=f"{branch}:{name}",
        )
