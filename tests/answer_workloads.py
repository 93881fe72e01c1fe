"""Deterministic answer-test workloads.

Analogue of the reference's stored-answer tests
(grackle: src/python/tests/test_examples.py:43-104, rtol 1e-6): four
workloads matching the BASELINE configs run on the f64 CPU path; their
outputs are stored once (tests/answers/*.npz) and every future change is
compared against them.  Regenerate with:

    python tests/answer_workloads.py regenerate
"""

import os
import sys

import numpy as np

ANSWER_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "answers")


def _data_file():
    from grackle_tpu.data.synthetic import make_synthetic_data_file

    path = os.path.join(ANSWER_DIR, "synthetic_cloudy.h5")
    if not os.path.exists(path):
        os.makedirs(ANSWER_DIR, exist_ok=True)
        make_synthetic_data_file(path)
    return path


def _base_chem(**kwargs):
    from grackle_tpu.api import ChemistryData
    from grackle_tpu.utilities.physical_constants import (
        mass_hydrogen_cgs,
    )

    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.precision = 64
    cd.use_fused_lookup = 0  # reference-exact gather path
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in kwargs.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def _state(cd, n=32, seed=4):
    rng = np.random.RandomState(seed)
    tiny = 1e-20
    f = {"density": 10.0 ** rng.uniform(-1, 2, n)}
    if cd.primordial_chemistry > 0:
        f["HI"] = 0.5 * 0.76 * f["density"]
        f["HII"] = 0.5 * 0.76 * f["density"]
        f["HeI"] = 0.24 * f["density"]
        f["HeII"] = np.full(n, tiny)
        f["HeIII"] = np.full(n, tiny)
        f["de"] = f["HII"].copy()
    if cd.primordial_chemistry > 1:
        f["HM"] = np.full(n, tiny)
        f["H2I"] = 1e-5 * f["density"]
        f["H2II"] = np.full(n, tiny)
    if cd.primordial_chemistry > 2:
        f["DI"] = 2.0 * 3.4e-5 * f["density"]
        f["DII"] = np.full(n, tiny)
        f["HDI"] = np.full(n, tiny)
    if cd.metal_cooling:
        f["metal"] = 1e-3 * f["density"]
    T = 10.0 ** rng.uniform(3.5, 6.5, n)
    # simple mu estimate for the energy assignment (deterministic)
    f["energy"] = T / cd.temperature_units / 0.8 / (cd.Gamma - 1.0)
    return f


def workload_tabulated():
    """Config 1: tabulated mode cooling (BASELINE config #1)."""
    cd = _base_chem(primordial_chemistry=0, metal_cooling=1,
                    UVbackground=1, grackle_data_file=_data_file())
    f = _state(cd)
    f["metal"] = 0.01 * f["density"]
    out = {}
    out["temperature"] = cd.calculate_temperature(f)
    out["cooling_time"] = cd.calculate_cooling_time(f)
    new_f, _ = cd.solve_chemistry(f, 1.0e-3)
    out["energy_after"] = new_f["energy"]
    return out


def workload_6species():
    """Config 2: 6-species atomic network."""
    cd = _base_chem(primordial_chemistry=1)
    f = _state(cd)
    out = {"cooling_time": cd.calculate_cooling_time(f)}
    new_f, _ = cd.solve_chemistry(f, 1.0e-3)
    for k in ["HI", "HII", "de", "energy"]:
        out[k] = new_f[k]
    return out


def workload_9species_shield():
    """Config 3: 9-species + LW background with H2 self-shielding."""
    cd = _base_chem(primordial_chemistry=2,
                    LWbackground_intensity=10.0,
                    H2_self_shielding=3)
    f = _state(cd)
    new_f, _ = cd.solve_chemistry(f, 1.0e-4)
    return {k: new_f[k] for k in ["HI", "H2I", "de", "energy"]}


def workload_12species_dust():
    """Config 4: 12-species + dust + tabulated metal cooling."""
    cd = _base_chem(primordial_chemistry=3, metal_cooling=1,
                    dust_chemistry=1, grackle_data_file=_data_file())
    f = _state(cd)
    out = {}
    out["dust_temperature"] = cd.calculate_dust_temperature(f)
    new_f, _ = cd.solve_chemistry(f, 1.0e-4)
    for k in ["HI", "H2I", "HDI", "de", "energy"]:
        out[k] = new_f[k]
    return out


# -- config 5: the full grid workload (BASELINE config #5, scaled from
#    256^3 to 32^3): 3-D grid with asymmetric ghost zones, user
#    volumetric + specific heating arrays, H2 self-shielding from the
#    full-grid Sobolev stencil, solve + every derived field.

GRID_SHAPE = (32, 32, 32)
GRID_START = (3, 2, 1)
GRID_END = (28, 29, 30)  # inclusive; active region = 26 x 28 x 30


def grid_full_setup(seed=11):
    """(cd, grid fields, active-region slice) for the config-5 workload;
    ghost zones hold seeded garbage that must pass through untouched."""
    cd = _base_chem(
        primordial_chemistry=3, metal_cooling=1, dust_chemistry=1,
        UVbackground=1, H2_self_shielding=1,
        use_volumetric_heating_rate=1, use_specific_heating_rate=1,
        grackle_data_file=_data_file(),
    )
    rng = np.random.RandomState(seed)
    tiny = 1e-20
    shape = GRID_SHAPE
    sl = tuple(slice(s, e + 1) for s, e in zip(GRID_START, GRID_END))

    # every array starts as garbage; the active region is overwritten
    f = {}
    names = ["density", "HI", "HII", "HeI", "HeII", "HeIII", "de",
             "HM", "H2I", "H2II", "DI", "DII", "HDI", "metal",
             "energy", "volumetric_heating_rate",
             "specific_heating_rate"]
    for name in names:
        f[name] = 10.0 ** rng.uniform(-2, 2, shape)

    d = 10.0 ** rng.uniform(-1, 2, shape)
    f["density"][sl] = d[sl]
    f["HI"][sl] = 0.5 * 0.76 * d[sl]
    f["HII"][sl] = 0.5 * 0.76 * d[sl]
    f["HeI"][sl] = 0.24 * d[sl]
    for k in ("HeII", "HeIII", "HM", "H2II", "DII", "HDI"):
        f[k][sl] = tiny
    f["H2I"][sl] = 1e-5 * d[sl]
    f["DI"][sl] = 2.0 * 3.4e-5 * d[sl]
    f["de"][sl] = f["HII"][sl]
    f["metal"][sl] = 1e-3 * d[sl]
    # physical heating magnitudes: volumetric ~ 1e-27 n_H^2 erg/s/cm^3,
    # specific 1e-3 erg/s/g (cool1d_multi_g.F:780-794 channels)
    nH = 0.76 * d[sl]
    f["volumetric_heating_rate"][sl] = 1e-27 * nH ** 2
    f["specific_heating_rate"][sl] = 1e-3
    T = 10.0 ** rng.uniform(3.5, 6.5, shape)
    f["energy"][sl] = (T[sl] / cd.temperature_units / 0.8
                       / (cd.Gamma - 1.0))
    return cd, f, sl


def workload_grid_full():
    """Config 5: 32^3 grid + ghost zones + heating arrays + solve +
    cooling_time/temperature/pressure/gamma/dust_temperature."""
    cd, f, sl = grid_full_setup()
    new_f, diag = cd.solve_chemistry_grid(
        f, 1.0e-4, grid_start=GRID_START, grid_end=GRID_END,
        grid_dx=1.0e-3,
    )
    assert bool(np.all(np.asarray(diag["converged"])))
    active = {k: np.asarray(v)[sl].reshape(-1) for k, v in new_f.items()}
    out = {k: active[k] for k in ["HI", "H2I", "HDI", "de", "energy"]}
    out["cooling_time"] = cd.calculate_cooling_time(active)
    out["temperature"] = cd.calculate_temperature(active)
    out["pressure"] = cd.calculate_pressure(active)
    out["gamma"] = cd.calculate_gamma(active)
    out["dust_temperature"] = cd.calculate_dust_temperature(active)
    return out


def workload_rate_tables():
    """Rate-coefficient regression (analogue of the reference's
    test_initialisation.py:40-183 + stored rate_coefficients.h5,
    rtol 1e-7): initialize parameter sets covering the rate-option
    branches and dump every 1-D rate table."""
    import dataclasses

    out = {}
    option_sets = {
        "default": dict(primordial_chemistry=3),
        "threebody4_caseB": dict(primordial_chemistry=3,
                                 three_body_rate=4,
                                 CaseBRecombination=1),
        "dust_pe": dict(primordial_chemistry=3, metal_cooling=1,
                        dust_chemistry=1, photoelectric_heating=2,
                        grackle_data_file=_data_file()),
        "charge_exchange2": dict(primordial_chemistry=2,
                                 h2_charge_exchange_rate=2,
                                 h2_dust_rate=2,
                                 h2_h_cooling_rate=2),
    }
    for label, opts in option_sets.items():
        cd = _base_chem(**opts)
        tables = cd.context.tables
        for f in dataclasses.fields(type(tables)):
            v = getattr(tables, f.name)
            if v is None or f.name in ("cool_cols", "chem_cols"):
                continue
            arr = np.asarray(v)
            if arr.ndim >= 1:
                out[f"{label}/{f.name}"] = arr
    return out


WORKLOADS = {
    "tabulated": workload_tabulated,
    "6species": workload_6species,
    "9species_shield": workload_9species_shield,
    "12species_dust": workload_12species_dust,
    "grid_full": workload_grid_full,
    "rate_tables": workload_rate_tables,
}


def regenerate():
    os.makedirs(ANSWER_DIR, exist_ok=True)
    for name, fn in WORKLOADS.items():
        out = {k: np.asarray(v) for k, v in fn().items()}
        path = os.path.join(ANSWER_DIR, f"{name}.npz")
        np.savez(path, **out)
        print(f"wrote {path}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        regenerate()
