"""f64 fast-lookup path: exact f32 split fetch.

In precision=64 mode the fused table lookups must not contract in f64 —
the TPU backend emulates f64 matmuls at ~95x their f32 cost while f64
elementwise emulation costs only ~1.3-2x (measured on v5e;
docs/Performance.md "Double precision on TPU").  lookup.split_fetch
rescales each f64 table column, splits it into an exact f32 (hi, lo)
pair, fetches both halves with one exact f32 one-hot MXU contraction,
and reconstructs in f64.  These tests pin the accuracy contract
(~2^-48 relative) and the dispatch plumbing on every consumer.

Reference basis: the lookups replaced here mirror
solve_rate_cool_g.F:1206-1323 and cool1d_multi_g.F:348-410; the
accuracy bar is the reference's CONFIG_PRECISION=64 build
(Make.config.settings:23), whose table interpolation is exact double
arithmetic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grackle_tpu.ops import interp
from grackle_tpu.ops.lookup import (
    lookup_all, lookup_all_onehot, onehot_fetch, pair_matrix,
    split_fetch, table_index,
)


def _rel(a, b, floor=1e-300):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b) / np.maximum(np.abs(b), floor)


def test_split_fetch_row_accuracy():
    """Fetched rows reproduce the f64 matrix to double-f32 accuracy,
    including signed entries and a ~35-decade column range."""
    rng = np.random.RandomState(7)
    mat = jnp.asarray(
        10.0 ** rng.uniform(-30, 5, (600, 17))
        * rng.choice([-1.0, 1.0], (600, 17))
    )
    idx = jnp.asarray(rng.randint(0, 600, 4096), jnp.int32)
    got = split_fetch(mat, idx)
    assert got.dtype == jnp.float64
    assert _rel(got, mat[idx]).max() < 1e-13


def test_split_fetch_real_rate_tables():
    """The actual f64 chem/cool stacked matrices split losslessly."""
    from grackle_tpu.config import ChemistryConfig
    from grackle_tpu.rates.tables import build_rate_tables
    from grackle_tpu.units import CodeUnits

    cfg = ChemistryConfig(
        use_grackle=1, primordial_chemistry=3, dust_chemistry=1,
        metal_cooling=1, h2_on_dust=1, precision=64,
    )
    units = CodeUnits(
        comoving_coordinates=0, a_units=1.0, a_value=1.0,
        density_units=1.67e-24, length_units=3.086e21,
        time_units=3.156e13,
    )
    tables = build_rate_tables(cfg, units, dtype=jnp.float64)
    rng = np.random.RandomState(3)
    for stacked in (tables.stacked_chem, tables.stacked_cool):
        assert stacked.dtype == jnp.float64
        idx = jnp.asarray(
            rng.randint(0, stacked.shape[0], 2048), jnp.int32
        )
        got = np.asarray(split_fetch(stacked, idx))
        want = np.asarray(stacked[idx])
        # the split's magnitude window: entries within ~70 decades of
        # their column max are exact to double-f32; real tables have
        # un-floored rates down to ~1e-307 that fetch as ~0 (documented
        # in _f32_split -- below the reference's own 1e-40 tiny8 floor)
        colmax = np.abs(np.asarray(stacked)).max(axis=0)
        rel = _rel(got, want, floor=1e-250)
        exact = np.abs(want) >= 1e-60 * colmax[None, :]
        assert rel[exact].max() < 1e-13
        # below the exact band: f32-class relative accuracy degrading
        # to zero (absolute error bounded by the band floor)
        err = np.abs(got - want)
        bound = 6e-8 * np.abs(want) + 1e-60 * colmax[None, :]
        assert (err[~exact] <= bound[~exact]).all()


def test_lookup_all_f64_dispatch_matches_gather_lerp():
    rng = np.random.RandomState(1)
    mat = jnp.asarray(10.0 ** rng.uniform(-25, 3, (600, 23)))
    logT = jnp.asarray(rng.uniform(np.log(1.0), np.log(1e9), 2048))
    ti = table_index(logT, 600, 1.0, 1e9)
    got = lookup_all(mat, ti)
    lo, hi = mat[ti.idx], mat[ti.idx + 1]
    want = lo + (hi - lo) * ti.tdef[:, None]
    assert got.dtype == jnp.float64
    assert _rel(got, want).max() < 1e-12
    # the one-hot strategy routes through the same split fetch
    got2 = lookup_all_onehot(mat, ti)
    assert _rel(got2, want).max() < 1e-12


def test_onehot_fetch_f64_dispatch():
    rng = np.random.RandomState(2)
    stacked = jnp.asarray(10.0 ** rng.uniform(-20, 2, (250, 4)))
    pair = pair_matrix(stacked)
    idx = jnp.asarray(rng.randint(0, 249, 512), jnp.int32)
    got = onehot_fetch(pair, idx)
    assert got.dtype == jnp.float64
    assert _rel(got, pair[idx]).max() < 1e-13


def test_temperature_rows_f64_matches_direct():
    """The f64 branch of the fused Cloudy density-axis contraction
    reproduces the two-hot math (including linear extrapolation past
    the grid edges)."""
    rng = np.random.RandomState(5)
    d1, d_t, n = 29, 41, 1024

    class _C:
        grid_rank = 2
        par1 = jnp.asarray(np.linspace(-6.0, 4.0, d1))

    data = jnp.asarray(rng.uniform(-30.0, -20.0, (d1, d_t)))
    # include out-of-grid abscissae to exercise extrapolation
    log_n_h = jnp.asarray(rng.uniform(-8.0, 6.0, n))
    got = interp.temperature_rows(
        _C, data, log_n_h, 0.0, jnp.int32(0), jnp.asarray(False),
        jnp.float64,
    )
    i1, f1 = interp._uniform_frac(log_n_h, _C.par1, d1)
    want = data[i1] + (data[i1 + 1] - data[i1]) * f1[:, None]
    assert got.dtype == jnp.float64
    # out-of-grid extrapolation (|f1| up to ~6 here) amplifies the
    # ~1e-15 split error through lerp cancellation
    assert _rel(got, want).max() < 1e-10


def test_rows_at_scalar_temperature_f64():
    rng = np.random.RandomState(6)
    rows = jnp.asarray(rng.uniform(-30.0, -20.0, (512, 41)))
    par_t = jnp.asarray(np.linspace(1.0, 9.0, 41))
    got = interp.rows_at_scalar_temperature(rows, par_t, jnp.float64(4.3))
    w = interp.scalar_twohot_vec(jnp.float64(4.3), par_t, 41, jnp.float64)
    want = np.asarray(rows) @ np.asarray(w)
    assert _rel(got, want).max() < 1e-13


@pytest.mark.parametrize("rank", [1, 2])
def test_f64_cloudy_fused_vs_gather_low_rank(rank):
    """_cloudy_cooling_fused_f64 on rank-1 (T) and rank-2 (n_H, T)
    tables matches the exact-gather interpolators, including the CMB
    floor (scalar contraction at rank 1, narrow_vec_lerp at rank 2)
    and the heating term.  Synthetic data files are always rank 3, so
    these branches need direct construction (cool1d_cloudy_g.F:98-258
    rank dispatch)."""
    from grackle_tpu.data.cloudy import CloudyTable
    from grackle_tpu.ops.cloudy_cool import cloudy_cooling

    rng = np.random.RandomState(rank)
    d1, d_t, n = 17, 45, 512
    par_t = np.linspace(1.0, 9.0, d_t)
    par1 = np.linspace(-6.0, 4.0, d1)
    if rank == 1:
        cool = rng.uniform(-26.0, -21.0, d_t)
        heat = rng.uniform(-27.0, -22.0, d_t)
        tab = CloudyTable(grid_rank=1, grid_dimension=(d_t,),
                          par1=jnp.asarray(par_t),
                          cooling=jnp.asarray(cool),
                          heating=jnp.asarray(heat))
    else:
        cool = rng.uniform(-26.0, -21.0, (d1, d_t))
        heat = rng.uniform(-27.0, -22.0, (d1, d_t))
        tab = CloudyTable(grid_rank=2, grid_dimension=(d1, d_t),
                          par1=jnp.asarray(par1),
                          par2=jnp.asarray(par_t),
                          cooling=jnp.asarray(cool),
                          heating=jnp.asarray(heat))

    logtem = jnp.asarray(rng.uniform(np.log(30.0), np.log(1e8), n))
    rhoH = jnp.asarray(10.0 ** rng.uniform(-2, 3, n))
    metallicity = jnp.asarray(10.0 ** rng.uniform(-3, 0, n))
    out = {}
    for fused in (True, False):
        out[fused] = cloudy_cooling(
            tab, logtem, rhoH, metallicity, dom=1.7, zr=0.0,
            comp2=2.73 * 30.0,  # T_CMB high enough to trip the floor
            icmbTfloor=1, iClHeat=1, iZscale=1, use_fused=fused,
        )
        assert out[fused].dtype == jnp.float64
    assert _rel(out[True], out[False]).max() < 1e-11


def test_f64_tabulated_fused_vs_gather():
    """Tabulated mode (primordial_chemistry=0) in f64: the fused path —
    tabulated_temperature's fused_interp_f64 mu fixed point plus
    _cloudy_cooling_fused_f64 for the rank-3 primordial and metal
    tables (including the narrow_vec_lerp CMB-floor slice) — matches
    the exact-gather interpolators."""
    from grackle_tpu.api import ChemistryData
    from grackle_tpu.data.synthetic import make_synthetic_data_file
    from grackle_tpu.fluid_container import FluidContainer
    from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs

    import os
    import tempfile

    data_file = os.path.join(tempfile.gettempdir(),
                             "gtpu_f64_tab_cloudy.h5")
    if not os.path.exists(data_file):
        make_synthetic_data_file(data_file)

    res = {}
    for fused in (1, 0):
        cd = ChemistryData()
        cd.use_grackle = 1
        cd.with_radiative_cooling = 1
        cd.primordial_chemistry = 0
        cd.metal_cooling = 1
        cd.UVbackground = 1
        cd.cmb_temperature_floor = 1
        cd.precision = 64
        cd.use_fused_lookup = fused
        cd.grackle_data_file = data_file
        cd.density_units = mass_hydrogen_cgs
        cd.length_units = 3.0857e21
        cd.time_units = 3.1556952e13
        assert cd.initialize() == 1
        n = 64
        fc = FluidContainer(cd, n)
        rng = np.random.RandomState(13)
        fc["density"][:] = 10.0 ** rng.uniform(-2, 3, n)
        fc["metal"][:] = 0.02 * fc["density"]
        fc["energy"][:] = 10.0 ** rng.uniform(1, 5, n)
        fc.calculate_temperature()
        fc.calculate_cooling_time()
        dt = 0.05 * np.abs(fc["cooling_time"]).min()
        fc.solve_chemistry(dt)
        res[fused] = {
            "temperature": fc["temperature"].copy(),
            "cooling_time": fc["cooling_time"].copy(),
            "energy": fc["energy"].copy(),
        }
    for k in res[1]:
        rel = _rel(res[1][k], res[0][k])
        assert rel.max() < 1e-10, (k, rel.max())


@pytest.mark.parametrize("chem", [1, 3])
def test_f64_solve_fused_vs_gather_short_horizon(chem):
    """Full 6/12-species f64 solve: the fused split-fetch path tracks
    the exact-gather path over a short horizon (before stiff-network
    chaos amplifies the ~1e-14 per-step interpolation difference).

    Dust is off here: the fused path evaluates h2dust through its
    rank-16 log-SVD factorization (reconstruction ~2e-9, a deliberate
    approximation shared with the f32 path; docs/Performance.md), which
    would dominate the comparison and hide split-fetch regressions."""
    import __graft_entry__ as ge

    res = {}
    n_sub = {}
    for fused in (1, 0):
        cd = ge._make_context(
            chem=chem, precision=64, use_fused_lookup=fused,
            dust_chemistry=0, h2_on_dust=0,
        )
        fields = {
            k: jnp.asarray(v)
            for k, v in ge._make_fields(cd, 256).items()
        }
        new_f, diag = cd.solve_chemistry(fields, 1.0e-6)
        res[fused] = new_f
        n_sub[fused] = int(diag["n_iterations"])
    assert n_sub[1] == n_sub[0]
    for k, v in res[1].items():
        rel = _rel(v, res[0][k], floor=1e-250)
        assert rel.max() < 5e-9, (k, rel.max())
