"""Alternative lookup/loop strategies must agree with the baseline.

Two families of runtime-selectable strategies exist purely for TPU
performance; both must be interchangeable numerically:

* ``lookup_all`` (two-hot interpolation weights) vs
  ``lookup_all_onehot`` (one-hot bracketing fetch + explicit lerp),
  selected per table set via ``GTPU_ONEHOT_SETS``;
* the dust equilibrium loop strategies ``while``/``fori``/``blocked``
  (``GTPU_DUST_LOOP``), which must be BIT-identical (every update is
  lane-masked, so blocking only changes how many masked no-op steps
  run).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.ops import lookup as lk
from grackle_tpu.ops import dust_temp
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


def _tables():
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = 3
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    assert cd.initialize() == 1
    return cd.context.tables, cd.context.config


@pytest.mark.parametrize("table_set", ["cool", "chem"])
def test_onehot_matches_twohot(table_set):
    tables, cfg = _tables()
    stacked = getattr(tables, f"stacked_{table_set}")
    stacked = jnp.asarray(stacked, jnp.float64)
    rng = np.random.RandomState(11)
    n = 4096
    logtem = jnp.asarray(
        rng.uniform(np.log(1.1), np.log(9.0e8), n)
    )
    ti = lk.table_index(
        logtem, cfg.NumberOfTemperatureBins,
        cfg.TemperatureStart, cfg.TemperatureEnd,
    )
    a = np.asarray(lk.lookup_all(stacked, ti))
    b = np.asarray(lk.lookup_all_onehot(stacked, ti))
    # identical lerp arithmetic up to summation order; f64 here so the
    # only difference is reassociation.  atol covers denormal-range
    # chem-rate entries (~1e-309 in code units, physically zero), where
    # reassociation flips the last rounding step.
    np.testing.assert_allclose(a, b, rtol=5e-14, atol=1e-250)


def test_onehot_last_bin_exact():
    # ti.idx is clamped to n_bins - 2, so the rolled wrap row of the
    # pair matrix must never be selected
    tables, cfg = _tables()
    stacked = jnp.asarray(tables.stacked_cool, jnp.float64)
    n_bins = stacked.shape[0]
    logtem = jnp.full((8,), np.log(cfg.TemperatureEnd))
    ti = lk.table_index(
        logtem, cfg.NumberOfTemperatureBins,
        cfg.TemperatureStart, cfg.TemperatureEnd,
    )
    assert int(jnp.max(ti.idx)) == n_bins - 2
    b = np.asarray(lk.lookup_all_onehot(stacked, ti))
    # tdef at the clamped top differs from 1.0 by the rounding of the
    # reconstructed bin edges, so the lerp carries an O(eps * lo/hi)
    # residual of the lower bracketing row for steeply-falling columns
    expected = np.tile(np.asarray(stacked)[-1], (b.shape[0], 1))
    np.testing.assert_allclose(b, expected, rtol=1e-9, atol=1e-250)


@pytest.mark.parametrize("strategy", ["fori", "blocked"])
@pytest.mark.parametrize("warm", [False, True])
def test_dust_loop_strategies_bit_identical(monkeypatch, strategy, warm):
    rng = np.random.RandomState(3)
    n = 2048
    tgas = 10.0 ** rng.uniform(0.5, 9.0, n)  # includes > T_SUBL
    nh = 10.0 ** rng.uniform(-2, 12, n)
    gasgr = 10.0 ** rng.uniform(-34, -30, n)
    isrf = 10.0 ** rng.uniform(-1, 2, n)
    itmask = jnp.asarray(rng.rand(n) > 0.1)
    init = None
    if warm:
        init = jnp.asarray(np.where(rng.rand(n) > 0.5, tgas * 0.3, 0.0))

    def run(strat):
        monkeypatch.setenv("GTPU_DUST_LOOP", strat)
        # eager call: the env knob is read per trace, and jit caches
        # do not key on it
        return np.asarray(dust_temp.calc_tdust_1d(
            jnp.asarray(tgas), jnp.asarray(nh), jnp.asarray(gasgr),
            4.0e-26, jnp.asarray(isrf), itmask, 2.73, tdust_init=init,
        ))

    base = run("while")
    other = run(strategy)
    assert np.array_equal(base, other)
