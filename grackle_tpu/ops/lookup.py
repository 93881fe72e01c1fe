"""Log-temperature table lookup.

The reference performs a per-cell linear lookup in log(T) for every rate
table (grackle: src/clib/solve_rate_cool_g.F:1206-1323 and
src/clib/cool1d_multi_g.F:348-410).  Here the index/fraction pair is computed
once per cell and every table evaluation is a batched gather + lerp.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

import os

# Matmul precision for the fused lookup path. HIGHEST (6-pass bf16
# synthesis) reproduces f32 interpolation near-exactly; HIGH (3-pass)
# trades ~1e-6 relative interpolation error for ~2x matmul throughput.
_LOOKUP_PRECISION = getattr(
    jax.lax.Precision,
    os.environ.get("GRACKLE_TPU_LOOKUP_PRECISION", "HIGH"),
)

# Table sets evaluated via the one-hot + explicit-lerp strategy instead
# of two-hot interpolation weights (see lookup_all_onehot).  Measured on
# v5e: a win for the narrow 'cool' set (weight-generation bound), a
# loss for the wide 'chem' set (MXU pass cost scales with K).
_ONEHOT_SETS = frozenset(
    s for s in os.environ.get("GTPU_ONEHOT_SETS", "cool").split(",") if s
)

# One-hot weight matrices are exact in bf16 (entries 0/1), so the
# weight operand needs no multi-pass splitting: (DEFAULT, HIGH) is
# bitwise-identical to (HIGH, HIGH) for one-hot lhs (verified on
# device) and lets the compiler skip the lhs-split passes.
_ONEHOT_PRECISION = (jax.lax.Precision.DEFAULT, _LOOKUP_PRECISION)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "tdef", "t1", "t2", "logtem"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class TableIndex:
    """Per-cell interpolation state: 0-based bin index, fraction within the
    bin, and the bracketing log-temperatures (solve_rate_cool_g.F:1217-1221).
    """

    idx: Any
    tdef: Any
    t1: Any
    t2: Any
    logtem: Any


def table_index(logtem, n_bins: int, t_start: float, t_end: float):
    """Compute clamped index + interpolation fraction for a log-spaced
    temperature table (solve_rate_cool_g.F:1202-1221)."""
    logtem0 = jnp.log(t_start)
    logtem9 = jnp.log(t_end)
    dlogtem = (logtem9 - logtem0) / (n_bins - 1)
    logtem = jnp.clip(logtem, logtem0, logtem9)
    # reference: min(nratec-1, max(1, int(...)+1)) in 1-based indexing
    idx = jnp.clip(
        ((logtem - logtem0) / dlogtem).astype(jnp.int32), 0, n_bins - 2
    )
    t1 = logtem0 + idx * dlogtem
    t2 = logtem0 + (idx + 1) * dlogtem
    tdef = (logtem - t1) / (t2 - t1)
    return TableIndex(idx=idx, tdef=tdef, t1=t1, t2=t2, logtem=logtem)


def lookup(table, ti: TableIndex):
    """Linear interpolation of a 1-D table at the cell indices."""
    lo = table[ti.idx]
    return lo + (table[ti.idx + 1] - lo) * ti.tdef


def lookup_many(tables, ti: TableIndex):
    """Lookup a sequence of same-shaped tables at shared indices.

    Stacks the tables into a (n_tables, n_bins) matrix so the gather is a
    single fused op on TPU instead of n_tables separate gathers.
    """
    stacked = jnp.stack(tables, axis=0)
    lo = stacked[:, ti.idx]
    hi = stacked[:, ti.idx + 1]
    out = lo + (hi - lo) * ti.tdef[None, :]
    return tuple(out[i] for i in range(len(tables)))


# ---------------------------------------------------------------------------
# Fused lookups: gathers inside device loops are pathologically slow on TPU
# (~0.4 ms per gathered table per subcycle at 64k cells, measured); a
# single "two-hot" matmul on the MXU — the linear-interpolation weights
# folded into one-hot rows — evaluates EVERY table at once in ~0.3 ms.
# ---------------------------------------------------------------------------


def twohot_weights(idx, frac, dim: int, dtype):
    """(N, dim) sparse interpolation matrix W with W[n, idx[n]] = 1-frac[n]
    and W[n, idx[n]+1] = frac[n]; W @ table == lerp(table) exactly (the
    other columns contribute exact zeros)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], dim), 1)
    idxc = idx[:, None]
    w = (
        (iota == idxc).astype(dtype) * (1.0 - frac)[:, None]
        + (iota == idxc + 1).astype(dtype) * frac[:, None]
    )
    return w


def _pad_bins(stacked):
    """Pad the contraction (bin) axis to a multiple of 8 sublanes: odd
    contraction sizes push the TPU conv emitter off its fast path
    (measured ~2.4x on the 250-bin dust axis; the 600-bin sets are
    already aligned, and over-padding to 128 measures ~14% slower).
    Zero rows are never selected (indices are clamped to real bins)."""
    n_bins = stacked.shape[0]
    n_pad = -(-n_bins // 8) * 8
    if n_pad != n_bins:
        stacked = jnp.pad(stacked, ((0, n_pad - n_bins), (0, 0)))
    return stacked, n_pad


# ---------------------------------------------------------------------------
# f64 fast path: exact f32 split fetch.
#
# The TPU backend emulates f64 matmuls at ~95x their f32 cost while f64
# ELEMENTWISE emulation costs only ~1.3-2x (measured on v5e; see
# docs/Performance.md "Double precision on TPU"), so in precision=64 mode
# the fused lookups must not contract in f64.  Instead each f64 table
# matrix is rescaled per column by a power of two and split into an exact
# f32 (hi, lo) pair; ONE-hot f32 weights fetch both halves in one exact
# f32 MXU pass ((DEFAULT, HIGHEST): one-hot lhs is exact in bf16 and the
# 3-chunk bf16 rhs split reconstructs f32 bitwise), and the interpolation
# lerp then runs in emulated-f64 elementwise arithmetic.  The fetched
# values carry the full double-word accuracy of the split (~2^-48
# relative); table entries smaller than ~1e-38 of their column's maximum
# fall below the f32 subnormal range of the scaled column and fetch as
# ~0 -- far below physical significance (the f32 production build zeroes
# them entirely).
# ---------------------------------------------------------------------------

_SPLIT_PRECISION = (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["both", "scale"],
    meta_fields=["k"],
)
@dataclasses.dataclass(frozen=True)
class SplitTable:
    """Precomputed double-f32 split of an f64 (n_bins, K) table matrix:
    ``both`` is the sublane-padded f32 ``[hi | lo]`` concatenation
    (n_pad, 2K) and ``scale`` the per-column f64 rescale (K,).

    The split/pad/pair work is loop-invariant table math; precomputing it
    (at table build, or once per solve call for redshift-collapsed Cloudy
    tables) keeps it out of the subcycle while-loop body instead of
    relying on XLA's loop-invariant code motion to hoist the emulated-f64
    reductions (measured: LICM does NOT hoist them -- see
    docs/Performance.md "Double precision on TPU")."""

    both: Any
    scale: Any
    k: int


def make_split(mat) -> SplitTable:
    """Build the :class:`SplitTable` for an f64 (n_bins, K) matrix."""
    hi, lo, scale = _f32_split(mat)
    both, _ = _pad_bins(jnp.concatenate([hi, lo], axis=1))
    return SplitTable(both=both, scale=scale, k=int(mat.shape[1]))


def pair_split(stacked) -> SplitTable:
    """SplitTable of ``pair_matrix(stacked)`` -- the precomputed form
    consumed by the f64 one-hot + lerp lookups."""
    return make_split(pair_matrix(stacked))


def _f32_split(mat):
    """Per-column rescale + double-f32 split of an f64 matrix: returns
    (hi, lo, scale) with (hi + lo) * scale == mat to ~2^-48 relative.

    The scale centers each column's log-magnitude range so that both the
    largest entry's ``hi`` and the smallest entry's ``lo`` stay inside
    f32 normal range (the ``lo`` of an entry ~31 decades below a
    max-anchored scale would flush to a subnormal zero and degrade that
    entry to f32 accuracy).  The center is clamped so the scaled maximum
    stays f32-finite, which bounds the exact window at ~76 decades below
    the column max (f32's full exponent range): columns spanning less
    than that split losslessly; entries further down degrade through
    f32-relative accuracy to zero.  Real rate/cooling tables have
    un-floored entries as small as ~1e-307 (e.g. collisional rates at
    T -> 1 K) whose loss is physically nil -- they sit below the
    reference's own tiny8 = 1e-40 arithmetic floor
    (grackle_fortran_types.def) and 60+ decades below any coexisting
    rate.  The scale need not be an exact power of two: the
    scale/unscale round trip costs one f64 rounding (~1e-16)."""
    aabs = jnp.abs(mat)
    amax = jnp.max(aabs, axis=0)
    safe_max = jnp.where(amax > 0, amax, 1.0)
    amin = jnp.min(
        jnp.where(aabs > 0, aabs, safe_max[None, :]), axis=0
    )
    e_hi = jnp.ceil(jnp.log2(safe_max))
    e_lo = jnp.floor(jnp.log2(jnp.where(amax > 0, amin, 1.0)))
    # center, but keep hi = scaled max finite in f32 (<= 2^127)
    e = jnp.maximum(jnp.round((e_hi + e_lo) / 2.0), e_hi - 127.0)
    scale = jnp.exp2(e)
    scaled = mat / scale
    hi = scaled.astype(jnp.float32)
    lo = (scaled - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo, scale


def split_fetch(mat, idx):
    """Fetch per-cell rows of an f64 (n_bins, K) matrix via one exact f32
    one-hot MXU contraction of its (hi, lo) split; returns f64 (N, K).

    ``mat`` may be a raw f64 matrix (split built inline -- only correct
    outside device loops, where the one-time table math is cheap) or a
    precomputed :class:`SplitTable` (the loop-safe form)."""
    s = mat if isinstance(mat, SplitTable) else make_split(mat)
    n_pad = s.both.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n_pad), 1)
    w = (iota == idx[:, None]).astype(jnp.float32)
    f = jax.lax.dot_general(
        w, s.both,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_SPLIT_PRECISION,
        preferred_element_type=jnp.float32,
    )
    k = s.k
    return (
        f[:, :k].astype(jnp.float64) + f[:, k:].astype(jnp.float64)
    ) * s.scale


def lookup_all(stacked, ti: TableIndex, pre: "SplitTable | None" = None):
    """Interpolate every column of the stacked (n_bins, K) table matrix at
    the cell temperatures in one MXU matmul.  Returns (N, K)."""
    if stacked.dtype == jnp.float64:
        # f64 mode: two-hot weights would force an emulated f64 matmul
        # (~95x the f32 cost); fetch the bracketing rows with an exact
        # f32 split contraction and lerp in f64 instead.
        return lookup_all_onehot(stacked, ti, pre=pre)
    stacked, n_pad = _pad_bins(stacked)
    w = twohot_weights(ti.idx, ti.tdef, n_pad, stacked.dtype)
    return jax.lax.dot_general(
        w, stacked,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_LOOKUP_PRECISION,
        preferred_element_type=stacked.dtype,
    )


def pair_matrix(stacked):
    """(n_bins, 2K) matrix whose row j is [stacked[j], stacked[j+1]].
    Row indices are always clamped to n_bins - 2, so the rolled wrap
    row is never selected."""
    return jnp.concatenate(
        [stacked, jnp.roll(stacked, -1, axis=0)], axis=1
    )


def onehot_fetch(pair, idx, dtype=None, pre: "SplitTable | None" = None):
    """Fetch per-cell rows of ``pair`` with a one-hot MXU contraction
    (safe inside device loops, unlike gathers).  One-hot weights are
    exact in bf16, so _ONEHOT_PRECISION reproduces the f32 rows to the
    rhs-split accuracy.  f64 operands route through :func:`split_fetch`
    (exact f32 contraction of the double-f32 table split; pass ``pre``
    -- the precomputed SplitTable of ``pair`` -- when calling from
    inside a device loop)."""
    if pre is not None:
        return split_fetch(pre, idx)
    if pair.dtype == jnp.float64:
        return split_fetch(pair, idx)
    dtype = dtype or pair.dtype
    pair, n_pad = _pad_bins(pair)
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n_pad), 1)
    w = (iota == idx[:, None]).astype(dtype)
    return jax.lax.dot_general(
        w, pair,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_ONEHOT_PRECISION,
        preferred_element_type=dtype,
    )


def lookup_all_onehot(stacked, ti: TableIndex,
                      pre: "SplitTable | None" = None):
    """lookup_all via a one-hot fetch of the bracketing (lo, hi) rows and
    an exact per-cell f32 lerp.  Halves the weight-generation VPU work
    (one lane compare instead of two) and is more accurate under
    Precision.HIGH (one-hot rows are exact in bf16), at the cost of a 2x
    wider contraction output — a win for narrow table sets, a loss for
    wide ones (the MXU pass cost scales with K).  ``pre`` is the
    precomputed f64 SplitTable of ``pair_matrix(stacked)``."""
    k = stacked.shape[1]
    if pre is not None:
        lohi = split_fetch(pre, ti.idx)
    else:
        lohi = onehot_fetch(pair_matrix(stacked), ti.idx, stacked.dtype)
    return lohi[:, :k] + (lohi[:, k:] - lohi[:, :k]) * ti.tdef[:, None]


class TableLookup:
    """Unified per-iteration table access.

    ``use_fused=True``: one two-hot matmul against the stacked matrix for
    this table set ('cool' or 'chem') serves every name (column-sliced on
    access).  ``use_fused=False``: classic per-table gather + lerp (fast
    on CPU).
    """

    def __init__(self, tables, ti: TableIndex, use_fused: bool,
                 table_set: str = "cool"):
        self._tables = tables
        self._ti = ti
        self._fused = use_fused
        if table_set == "cool":
            names = tables.cool_cols
            stacked = tables.stacked_cool
            pre = getattr(tables, "split_cool_pair", None)
        else:
            names = tables.chem_cols
            stacked = tables.stacked_chem
            pre = getattr(tables, "split_chem_pair", None)
        self._index = {name: i for i, name in enumerate(names)}
        if use_fused:
            if stacked.dtype == jnp.float64:
                # f64: both strategies collapse to the one-hot split
                # fetch; `pre` (built at table init) keeps the table
                # split/pair math out of the loop body
                self._vals = lookup_all_onehot(stacked, ti, pre=pre)
            elif table_set in _ONEHOT_SETS:
                self._vals = lookup_all_onehot(stacked, ti)
            else:
                self._vals = lookup_all(stacked, ti)
        else:
            self._vals = None

    def __getitem__(self, name: str):
        if self._fused:
            return self._vals[:, self._index[name]]
        if name.startswith("k13dd_"):
            col = int(name.split("_")[1])
            tab = self._tables.k13dd[:, col]
            return lookup(tab, self._ti)
        return lookup(getattr(self._tables, name), self._ti)

    def k13dd_matrix(self):
        """(N, 14) density-dependent k13 coefficients."""
        if self._fused:
            i0 = self._index["k13dd_0"]
            return self._vals[:, i0:i0 + 14]
        lo = self._tables.k13dd[self._ti.idx, :]
        hi = self._tables.k13dd[self._ti.idx + 1, :]
        return lo + (hi - lo) * self._ti.tdef[:, None]

    def h2dust_u(self):
        """(N, rank) interpolated log-SVD gas-T factors (fused path
        only; the rank is config-dependent — see rates.tables
        h2dust_rank — and carried by the h2dust_v factor's shape)."""
        rank = self._tables.h2dust_v.shape[1]
        i0 = self._index["h2dust_u0"]
        return self._vals[:, i0:i0 + rank]


def h2dust_lookup_fused(lk: "TableLookup", h2dust_v, d_ti: TableIndex):
    """Factored h2dust evaluation for the fused path:
    10**sum_r u_r(T) v_r(T_dust), where u/v are the rank-16 log-space SVD
    factors of the 2-D table (relative reconstruction error ~2e-9).  Only
    1-D lookups — no per-subcycle (n_T x n_Td) contraction.

    The dust-T factor lookup is a one-hot (N, n_td) contraction fetching
    the bracketing (lo, hi) factor rows, then an exact per-cell f32 lerp
    — cheaper to generate than two-hot interpolation weights (one lane
    compare instead of two) and more accurate (one-hot rows are exact in
    bf16, so Precision.HIGH reproduces the f32 factors to ~1e-7)."""
    u = lk.h2dust_u()  # (N, r), interpolated at the gas-T index
    v_pre = None
    if h2dust_v.dtype == jnp.float64:
        v_pre = getattr(lk._tables, "split_h2dust_v_pair", None)
    v = lookup_all_onehot(h2dust_v, d_ti, pre=v_pre)  # (N, r) dust-T
    return 10.0 ** jnp.sum(u * v, axis=1)


def h2dust_lookup(h2dust_table, ti: TableIndex, d_ti: TableIndex,
                  use_fused: bool):
    """Bilinear (T_gas, T_dust) interpolation of the 2-D h2dust table
    (solve_rate_cool_g.F:1327-1378); exact gather path."""
    t00 = h2dust_table[ti.idx, d_ti.idx]
    t10 = h2dust_table[ti.idx + 1, d_ti.idx]
    t01 = h2dust_table[ti.idx, d_ti.idx + 1]
    t11 = h2dust_table[ti.idx + 1, d_ti.idx + 1]
    dusti1 = t00 + (t10 - t00) * ti.tdef
    dusti2 = t01 + (t11 - t01) * ti.tdef
    return dusti1 + (dusti2 - dusti1) * d_ti.tdef
