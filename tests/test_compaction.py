"""Converged-cell compaction must be bit-identical to the monolithic
subcycle loop (the per-cell update has no cross-cell coupling, so
gathering survivors into a smaller array between chunks is exact)."""

import numpy as np
import pytest

import grackle_tpu.api as api
from grackle_tpu.api import ChemistryData
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


def _make_chem(**kw):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = 2
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
    f["HeII"] = np.full(n, tiny, np.float32)
    f["HeIII"] = np.full(n, tiny, np.float32)
    f["de"] = f["HII"].copy()
    f["HM"] = np.full(n, tiny, np.float32)
    f["H2I"] = (1e-5 * f["density"]).astype(np.float32)
    f["H2II"] = np.full(n, tiny, np.float32)
    T = 10.0 ** rng.uniform(3.2, 6.5, n).astype(np.float32)
    f["energy"] = (T / 1.0e4 / 0.8).astype(np.float32)
    return f


@pytest.mark.parametrize("chunk", [4, 16])
def test_compaction_bit_identical(monkeypatch, chunk):
    monkeypatch.setattr(api, "_COMPACT_MIN_BUCKET", 64)
    cd = _make_chem(solver_compaction=chunk)
    n = 512  # >= 4 * forced min bucket -> compaction engages
    f = _state(n)
    new_c, diag_c = cd.solve_chemistry(dict(f), 1.0e-4)

    cd0 = _make_chem(solver_compaction=0)
    new_m, diag_m = cd0.solve_chemistry(dict(f), 1.0e-4)

    assert np.all(np.asarray(diag_c["converged"]))
    assert np.array_equal(np.asarray(diag_c["cell_iterations"]),
                          np.asarray(diag_m["cell_iterations"]))
    for k in new_m:
        a = np.asarray(new_c[k])
        b = np.asarray(new_m[k])
        np.testing.assert_array_equal(a, b, err_msg=k)


def test_compaction_off_below_threshold():
    """Small arrays must take the monolithic jitted path."""
    cd = _make_chem()  # default solver_compaction=32
    f = _state(128)
    new_f, diag = cd.solve_chemistry(f, 1.0e-5)
    assert np.all(np.asarray(diag["converged"]))
    assert np.all(np.isfinite(np.asarray(new_f["energy"])))


def test_compaction_respects_max_iterations(monkeypatch):
    monkeypatch.setattr(api, "_COMPACT_MIN_BUCKET", 64)
    cd = _make_chem(solver_compaction=8, max_iterations=5)
    f = _state(512)
    _, diag = cd.solve_chemistry(f, 1.0e-2)
    assert int(diag["n_iterations"]) <= 5
    assert not np.all(np.asarray(diag["converged"]))


def test_compaction_decoupled_warm_tile(monkeypatch):
    """GTPU_WARM_TILE decouples the warm-phase tile width from the
    compaction batch size (their cost trade-offs differ; see
    docs/Performance.md).  Any tile width is bit-identical: tiling is
    exact because all subcycle bookkeeping is per-cell."""
    monkeypatch.setattr(api, "_COMPACT_MIN_BUCKET", 64)
    monkeypatch.setenv("GTPU_COMPACT_BATCH", "128")
    monkeypatch.setenv("GTPU_WARM_TILE", "96")
    # unique warm count -> fresh trace (the env knobs are read at trace
    # time, so a cached (cfg, batch) trace would ignore them)
    cd = _make_chem(solver_compaction=9)
    n = 520  # ceil(520 / 96) = 6 warm tiles; final tile overlaps
    f = _state(n)
    new_c, diag_c = cd.solve_chemistry(dict(f), 1.0e-4)

    cd0 = _make_chem(solver_compaction=0)
    new_m, diag_m = cd0.solve_chemistry(dict(f), 1.0e-4)

    assert np.all(np.asarray(diag_c["converged"]))
    assert np.array_equal(np.asarray(diag_c["cell_iterations"]),
                          np.asarray(diag_m["cell_iterations"]))
    for k in new_m:
        np.testing.assert_array_equal(
            np.asarray(new_c[k]), np.asarray(new_m[k]), err_msg=k
        )


def test_compaction_overlapped_final_tile(monkeypatch):
    """n not a multiple of the batch: the warm phase's final tile is
    clamped to [n - batch, n), re-running overlap cells.  Extra warm
    subcycles on retired lanes are masked no-ops and still-active
    overlap cells just advance earlier, so results (and total per-cell
    subcycle counts) stay bit-identical to the monolithic loop."""
    monkeypatch.setattr(api, "_COMPACT_MIN_BUCKET", 64)
    monkeypatch.setenv("GTPU_COMPACT_BATCH", "96")
    cd = _make_chem(solver_compaction=8)
    n = 520  # ceil(520 / 96) = 6 tiles; last tile overlaps 56 cells
    f = _state(n)
    new_c, diag_c = cd.solve_chemistry(dict(f), 1.0e-4)

    cd0 = _make_chem(solver_compaction=0)
    new_m, diag_m = cd0.solve_chemistry(dict(f), 1.0e-4)

    assert np.all(np.asarray(diag_c["converged"]))
    assert np.array_equal(np.asarray(diag_c["cell_iterations"]),
                          np.asarray(diag_m["cell_iterations"]))
    for k in new_m:
        np.testing.assert_array_equal(
            np.asarray(new_c[k]), np.asarray(new_m[k]), err_msg=k
        )


def test_tuned_defaults_locked(monkeypatch):
    """The measured-on-hardware performance defaults (docs/Performance.md
    env-knob table) must not drift silently: warm=24 subcycles, an
    absolute ~80k compaction batch clamped to n/4, and a warm tile of
    max(batch, 256k)."""
    from grackle_tpu.ops.solver import warm_tile_width

    monkeypatch.delenv("GTPU_COMPACT_BATCH", raising=False)
    monkeypatch.delenv("GTPU_WARM_TILE", raising=False)

    cd = _make_chem()
    assert cd.solver_compaction == 24

    assert api._compact_batch(1 << 20) == 81920
    assert api._compact_batch(1 << 16) == (1 << 16) // 4  # n/4 clamp
    assert warm_tile_width(81920) == 262144
    assert warm_tile_width(500_000) == 500_000  # never narrower

    monkeypatch.setenv("GTPU_WARM_TILE", "4096")
    assert warm_tile_width(81920) == 4096
    monkeypatch.setenv("GTPU_COMPACT_BATCH", "40960")
    assert api._compact_batch(1 << 20) == 40960
