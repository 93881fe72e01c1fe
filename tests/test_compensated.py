"""compensated_sums = 1: Neumaier-compensated energy/clock accumulation.

The f32 solver's long-horizon energy error is dominated by summation
drift in ``energy += edot/rho * dtit`` over hundreds of subcycles
(measured: median 4.8e-7 vs f64 on a 240-subcycle solve).  With the
compensated mode the same solve lands at ~2.4e-8 median — the residual
is per-step rate/network f32 error, not accumulation.  Chaos-limited
tail cells (near-equilibrium cancellation amplified by the stiff
network) are unaffected by construction; see docs/Performance.md
"Accuracy".
"""

import numpy as np
import pytest

import grackle_tpu.api as api
from grackle_tpu.api import ChemistryData
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


def _make_chem(**kw):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = 3
    cd.precision = 32
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in kw.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def _state(n, seed=11):
    rng = np.random.RandomState(seed)
    tiny = 1e-20
    f = {"density": 10.0 ** rng.uniform(-1, 3, n).astype(np.float32)}
    f["HI"] = 0.5 * 0.76 * f["density"]
    f["HII"] = 0.5 * 0.76 * f["density"]
    f["HeI"] = 0.24 * f["density"]
    for k in ["HeII", "HeIII", "HM", "H2II", "HDI"]:
        f[k] = np.full(n, tiny, np.float32)
    f["de"] = f["HII"].copy()
    f["H2I"] = (1e-5 * f["density"]).astype(np.float32)
    f["DI"] = (2e-5 * f["HI"]).astype(np.float32)
    f["DII"] = (2e-5 * f["HII"]).astype(np.float32)
    f["energy"] = (
        10.0 ** rng.uniform(3.2, 6.5, n) / 1.0e4 / 0.8
    ).astype(np.float32)
    return f


def test_energy_accumulation_error_drops_vs_f64():
    """Median single-call energy error vs the f64 solve must improve by
    >= 5x with compensation (measured ~20x; the assert leaves margin
    for platform scheduling noise)."""
    n = 2048
    f = _state(n)
    e64 = np.asarray(
        _make_chem(precision=64).solve_chemistry(dict(f), 1e-4)[0]
        ["energy"], np.float64)
    e32 = np.asarray(
        _make_chem().solve_chemistry(dict(f), 1e-4)[0]["energy"],
        np.float64)
    ec = np.asarray(
        _make_chem(compensated_sums=1).solve_chemistry(dict(f), 1e-4)[0]
        ["energy"], np.float64)
    r32 = np.median(np.abs(e32 - e64) / np.abs(e64))
    rc = np.median(np.abs(ec - e64) / np.abs(e64))
    assert rc < r32 / 5.0, (rc, r32)
    assert rc < 1e-7


def test_compaction_bit_identical_in_mode(monkeypatch):
    """Per-cell bookkeeping stays exact under compaction with the extra
    compensation columns in the pack."""
    monkeypatch.setattr(api, "_COMPACT_MIN_BUCKET", 64)
    f = _state(512)
    out_c, diag_c = _make_chem(
        compensated_sums=1, solver_compaction=8).solve_chemistry(
        dict(f), 1e-4)
    out_m, diag_m = _make_chem(
        compensated_sums=1, solver_compaction=0).solve_chemistry(
        dict(f), 1e-4)
    assert np.array_equal(np.asarray(diag_c["cell_iterations"]),
                          np.asarray(diag_m["cell_iterations"]))
    for k in out_m:
        assert np.array_equal(np.asarray(out_m[k]),
                              np.asarray(out_c[k])), k


def test_species_and_convergence_unchanged_class():
    """Compensation only touches the two accumulators: species results
    stay in the plain-f32 accuracy class and every cell converges."""
    f = _state(2048)
    out_p, diag_p = _make_chem().solve_chemistry(dict(f), 1e-4)
    out_c, diag_c = _make_chem(compensated_sums=1).solve_chemistry(
        dict(f), 1e-4)
    assert np.all(np.asarray(diag_c["converged"]))
    for k in ["HI", "de", "HeI"]:
        a = np.asarray(out_p[k], np.float64)
        b = np.asarray(out_c[k], np.float64)
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-30)
        assert np.median(rel) < 1e-4, (k, float(np.median(rel)))


def test_composes_with_network_kernel(monkeypatch):
    """The compensation carries ride the generic kernel pytree."""
    f = _state(2048)
    out_d, _ = _make_chem(compensated_sums=1).solve_chemistry(
        dict(f), 1e-4)
    monkeypatch.setenv("GTPU_NETWORK_KERNEL", "interpret")
    out_k, diag_k = _make_chem(compensated_sums=1).solve_chemistry(
        dict(f), 1e-4)
    assert np.all(np.asarray(diag_k["converged"]))
    a = np.asarray(out_d["energy"])
    b = np.asarray(out_k["energy"])
    rel = np.abs(a - b) / np.abs(a)
    assert np.median(rel) < 1e-5


def test_f64_mode_ignores_flag():
    f = _state(512)
    out_a, _ = _make_chem(precision=64).solve_chemistry(dict(f), 1e-5)
    out_b, _ = _make_chem(
        precision=64, compensated_sums=1).solve_chemistry(dict(f), 1e-5)
    # compensation in f64 is harmless and near-exact; bulk must agree
    for k in ["energy", "HI"]:
        a, b = np.asarray(out_a[k]), np.asarray(out_b[k])
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-30)
        assert np.median(rel) < 1e-12, k
