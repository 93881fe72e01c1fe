"""GTPU_SUBCYCLE_UNROLL must be bit-identical to the rolled loop.

The knob executes k subcycle iterations per while-loop trip to amortize
the fixed per-trip launch cost (ops/solver.py run_subcycles).  Every
carry update is lane-masked, so extra iterations on retired lanes are
bitwise no-ops — results cannot depend on k.  These tests call
solve_rate_cool_compacted DIRECTLY (not through the jitted api wrapper)
because the env knob is read at trace time and is not part of the jit
cache key; the direct call re-reads it per invocation.
"""

import numpy as np
import pytest

from grackle_tpu.api import ChemistryData, _photo_rates
from grackle_tpu.ops import solver as _solver
from grackle_tpu.ops.common import make_unit_scalars, solver_dtype
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


def _direct_solve(cd, f, dt, warm=8, batch=128):
    import jax.numpy as jnp

    ctx = cd.context
    cfg = ctx.config
    dtype = solver_dtype(cfg)
    fields = {k: jnp.asarray(v, dtype=dtype) for k, v in f.items()}
    us = make_unit_scalars(cfg, ctx.tables, ctx.units, 0.0)
    pr = _photo_rates(cfg, ctx.tables, ctx.uvb, ctx.units)
    res = _solver.solve_rate_cool_compacted(
        cfg, ctx.tables, ctx.cloudy_primordial, ctx.cloudy_metal,
        pr, us, fields, jnp.asarray(dt, dtype),
        imetal=False, cloudy_data_new=ctx.cloudy_data_new,
        warm=warm, batch=batch,
    )
    return ({k: np.asarray(v) for k, v in res.fields.items()},
            np.asarray(res.cell_iterations))


@pytest.mark.parametrize("unroll", [2, 4])
def test_unroll_bit_identical(monkeypatch, unroll):
    cd = _make_chem()
    f = _state(512)
    monkeypatch.delenv("GTPU_SUBCYCLE_UNROLL", raising=False)
    base_f, base_it = _direct_solve(cd, f, 1.0e-4)
    monkeypatch.setenv("GTPU_SUBCYCLE_UNROLL", str(unroll))
    un_f, un_it = _direct_solve(cd, f, 1.0e-4)
    assert np.array_equal(base_it, un_it)
    for k in base_f:
        np.testing.assert_array_equal(base_f[k], un_f[k], err_msg=k)


def test_unroll_nondivisor_chunk_falls_back(monkeypatch):
    """warm=6 with unroll=4 trips the `chunk % unroll` guard, which
    silently resets the warm phase to rolled execution — results must
    still be bitwise unchanged (the batched phase, whose chunk is
    max_iterations=10000, keeps unroll=4)."""
    cd = _make_chem()
    f = _state(512)
    monkeypatch.delenv("GTPU_SUBCYCLE_UNROLL", raising=False)
    base_f, base_it = _direct_solve(cd, f, 1.0e-4, warm=6)
    monkeypatch.setenv("GTPU_SUBCYCLE_UNROLL", "4")
    un_f, un_it = _direct_solve(cd, f, 1.0e-4, warm=6)
    assert np.array_equal(base_it, un_it)
    for k in base_f:
        np.testing.assert_array_equal(base_f[k], un_f[k], err_msg=k)


def test_unroll_rejects_garbage(monkeypatch):
    cd = _make_chem()
    f = _state(256)
    monkeypatch.setenv("GTPU_SUBCYCLE_UNROLL", "fast")
    with pytest.raises(ValueError, match="GTPU_SUBCYCLE_UNROLL"):
        _direct_solve(cd, f, 1.0e-4)
