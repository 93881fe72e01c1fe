"""Vectorized multilinear table interpolation.

TPU-native rebuild of the reference's uniform-grid interpolators
(grackle: src/clib/interpolators_g.F:4-566).  Where the reference runs one
scalar interpolation per cell inside Fortran loops, these are batched
gathers + fused multiply-adds over the whole cell axis, which XLA maps onto
the VPU.

Conventions match the reference exactly:
* data is flattened C-order with parameter 1 slowest
  (interpolators_g.F:83,150).
* interpolation index is ``min(dim-1, max(1, int((x-x0)/dx)+1))`` in 1-based
  indexing (interpolators_g.F:29-30), i.e. values outside the grid are
  *linearly extrapolated* from the edge cell.
* the redshift axis of 3-D Cloudy tables is non-uniform and interpolated in
  log(1+z) with a 2-D fallback past the final redshift
  (interpolators_g.F:186-269,279-338).
"""

from __future__ import annotations

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


def _uniform_index(x, par, dim):
    """1-based reference index -> 0-based: clip(floor((x-x0)/dx), 0, dim-2).

    (interpolators_g.F:29-30)
    """
    dpar = (par[dim - 1] - par[0]) / (dim - 1)
    idx = jnp.floor((x - par[0]) / dpar).astype(jnp.int32)
    return jnp.clip(idx, 0, dim - 2)


def _lerp(x, x0, x1, f0, f1):
    slope = (f1 - f0) / (x1 - x0)
    return (x - x0) * slope + f0


def interpolate_1d(x, par1, data):
    """(interpolators_g.F:4-40); x batched, data shape (D1,)."""
    d1 = data.shape[0]
    i1 = _uniform_index(x, par1, d1)
    return _lerp(x, par1[i1], par1[i1 + 1], data[i1], data[i1 + 1])


def interpolate_2d(x1, x2, par1, par2, data):
    """(interpolators_g.F:45-101); data shape (D1, D2)."""
    d1, d2 = data.shape
    i1 = _uniform_index(x1, par1, d1)
    i2 = _uniform_index(x2, par2, d2)
    v_lo = _lerp(x2, par2[i2], par2[i2 + 1], data[i1, i2], data[i1, i2 + 1])
    v_hi = _lerp(x2, par2[i2], par2[i2 + 1],
                 data[i1 + 1, i2], data[i1 + 1, i2 + 1])
    return _lerp(x1, par1[i1], par1[i1 + 1], v_lo, v_hi)


def interpolate_3d(x1, x2, x3, par1, par2, par3, data):
    """(interpolators_g.F:106-178); data shape (D1, D2, D3)."""
    d1, d2, d3 = data.shape
    i1 = _uniform_index(x1, par1, d1)
    i2 = _uniform_index(x2, par2, d2)
    i3 = _uniform_index(x3, par3, d3)

    def v3(q, w):
        return _lerp(x3, par3[i3], par3[i3 + 1],
                     data[i1 + q, i2 + w, i3], data[i1 + q, i2 + w, i3 + 1])

    def v2(q):
        return _lerp(x2, par2[i2], par2[i2 + 1], v3(q, 0), v3(q, 1))

    return _lerp(x1, par1[i1], par1[i1 + 1], v2(0), v2(1))


def redshift_index(zr, par2, d2):
    """Bisection index + past-the-end flag for the redshift axis of 3-D
    Cloudy tables (grackle: cool1d_cloudy_g.F:128-153).

    Returns (zi0, end_int): zi0 is the 0-based lower bracket, clipped to
    [0, d2-3]; end_int is True when zr is at/past the second-to-last
    redshift, in which case interpolation collapses to 2-D at the final
    table slice.
    """
    zi0 = jnp.clip(
        jnp.searchsorted(par2, zr, side="right") - 1, 0, d2 - 3
    )
    end_int = zr >= par2[d2 - 2]
    # reference pins zindex = D2 (1-based) in the end_int case; the 2-D
    # fallback then reads slice (zindex-1) = D2-1 (0-based last slice).
    zi0 = jnp.where(end_int, d2 - 1, zi0)
    return zi0, end_int


def interpolate_3dz(x1, zr, x3, par1, par2, par3, data, zi0, end_int):
    """Non-uniform middle (redshift) axis in log(1+z), with 2-D fallback
    past the last redshift (interpolators_g.F:186-269,279-338).

    zi0/end_int come from :func:`redshift_index` (computed once per call,
    shared by all cells).
    """
    d1, d2, d3 = data.shape
    i1 = _uniform_index(x1, par1, d1)
    i3 = _uniform_index(x3, par3, d3)

    # --- full 3-D path (clamped so the end_int case stays in bounds) ---
    zi = jnp.clip(zi0, 0, d2 - 2)

    def v3(q, w):
        return _lerp(x3, par3[i3], par3[i3 + 1],
                     data[i1 + q, zi + w, i3], data[i1 + q, zi + w, i3 + 1])

    zlog = jnp.log((1.0 + par2[zi + 1]) / (1.0 + par2[zi]))
    zfrac = jnp.log((1.0 + zr) / (1.0 + par2[zi]))

    def v2(q):
        slope = (v3(q, 1) - v3(q, 0)) / zlog
        return zfrac * slope + v3(q, 0)

    full = _lerp(x1, par1[i1], par1[i1 + 1], v2(0), v2(1))

    # --- 2-D fallback at the last redshift slice ---
    zlast = jnp.clip(zi0, 0, d2 - 1)

    def f3(q):
        return _lerp(x3, par3[i3], par3[i3 + 1],
                     data[i1 + q, zlast, i3], data[i1 + q, zlast, i3 + 1])

    flat = _lerp(x1, par1[i1], par1[i1 + 1], f3(0), f3(1))

    return jnp.where(end_int, flat, full)


# ---------------------------------------------------------------------------
# Fused (gather-free) Cloudy interpolation for inside device loops: the
# redshift axis collapses to a per-call scalar weight, the density axis
# contracts with per-cell two-hot weights on the MXU, and the temperature
# axis contracts row-wise.  Semantics (including linear extrapolation past
# the grid edges) match the reference interpolators exactly.
# ---------------------------------------------------------------------------


def _uniform_frac(x, par, dim):
    """Clamped bracket index + unclamped linear fraction (extrapolating
    beyond the grid edges like interpolators_g.F:29-37).

    Grid values are reconstructed arithmetically (par[0] + i*dpar) instead
    of gathered: the reference's own index math already assumes uniform
    spacing (interpolators_g.F:29-30), and per-cell gathers from the
    parameter vectors are pathologically slow inside TPU loops."""
    dpar = (par[dim - 1] - par[0]) / (dim - 1)
    i = jnp.clip(
        jnp.floor((x - par[0]) / dpar).astype(jnp.int32), 0, dim - 2
    )
    x0 = par[0] + i.astype(x.dtype) * dpar
    frac = (x - x0) / dpar
    return i, frac


def _twohot(idx, frac, dim, dtype):
    from .lookup import twohot_weights

    return twohot_weights(idx, frac, dim, dtype)


def collapse_redshift(data, par2, zr, zi0, end_int):
    """Collapse the (D1, D2, D3) cube's redshift axis at scalar zr using
    the log(1+z) rule (interpolators_g.F:252-257), honoring the
    past-the-end 2-D fallback.  Returns (D1, D3).

    Implemented as a static einsum with a scalar-built weight vector (no
    dynamic take/slice — those are slow inside TPU loops even for tiny
    operands)."""
    d2 = data.shape[1]
    zi = jnp.clip(zi0, 0, d2 - 2)
    iota = jax.lax.iota(jnp.int32, d2)
    onehot_lo = (iota == zi).astype(data.dtype)
    onehot_hi = (iota == zi + 1).astype(data.dtype)
    p_lo = jnp.sum(onehot_lo * par2)
    p_hi = jnp.sum(onehot_hi * par2)
    wz = jnp.log((1.0 + zr) / (1.0 + p_lo)) / jnp.log(
        (1.0 + p_hi) / (1.0 + p_lo)
    )
    w_full = onehot_lo * (1.0 - wz) + onehot_hi * wz
    w_last = (iota == d2 - 1).astype(data.dtype)
    w = jnp.where(end_int, w_last, w_full)
    return jnp.einsum("abc,b->ac", data, w,
                      precision=jax.lax.Precision.HIGHEST)


def temperature_rows(cloudy, data, log_n_h, zr, zi0, end_int, dtype):
    """Contract every non-temperature axis of a rank 1-3 Cloudy table,
    returning per-cell temperature rows of shape (N, D_T)."""
    rank = cloudy.grid_rank
    if rank == 1:
        return jnp.broadcast_to(
            data[None, :], (log_n_h.shape[0], data.shape[0])
        )
    if rank == 3:
        data = collapse_redshift(data, cloudy.par2, zr, zi0, end_int)
    from .lookup import _pad_bins

    d1 = data.shape[0]
    i1, f1 = _uniform_frac(log_n_h, cloudy.par1, d1)
    if data.dtype == jnp.float64:
        # f64 mode: emulated f64 matmuls cost ~95x their f32 form, so
        # fetch the bracketing density rows with an exact f32 split
        # contraction (lookup.split_fetch) and lerp in f64 -- identical
        # math to the two-hot weights (including linear extrapolation:
        # f1 is unclamped in both forms).
        from .lookup import split_fetch

        k = data.shape[1]
        pair = jnp.concatenate(
            [data, jnp.roll(data, -1, axis=0)], axis=1
        )
        lohi = split_fetch(pair, i1)
        return lohi[:, :k] + (lohi[:, k:] - lohi[:, :k]) * f1[:, None]
    # sublane-align the contraction axis (see lookup._pad_bins;
    # i1 <= d1 - 2, so padded rows are never selected)
    data, d1_pad = _pad_bins(data)
    w1 = _twohot(i1, f1, d1_pad, dtype)
    return jax.lax.dot_general(
        w1, data,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_LOOKUP_PRECISION,
        preferred_element_type=dtype,
    )


def rows_at_temperature(rows, par_t, x_t):
    """Row-wise temperature interpolation of (N, D_T) rows at per-cell
    temperatures x_t."""
    d_t = rows.shape[1]
    i_t, f_t = _uniform_frac(x_t, par_t, d_t)
    w_t = _twohot(i_t, f_t, d_t, rows.dtype)
    return jnp.sum(rows * w_t, axis=1)


def scalar_twohot_vec(x_scalar, par, dim, dtype):
    """(dim,) interpolation vector for one scalar abscissa, built with
    iota comparisons (no dynamic slicing — safe inside device loops)."""
    dpar = (par[dim - 1] - par[0]) / (dim - 1)
    i = jnp.clip(
        jnp.floor((x_scalar - par[0]) / dpar).astype(jnp.int32),
        0, dim - 2,
    )
    x0 = par[0] + i.astype(dtype) * dpar
    frac = (x_scalar - x0) / dpar
    iota = jax.lax.iota(jnp.int32, dim)
    return ((iota == i).astype(dtype) * (1.0 - frac)
            + (iota == i + 1).astype(dtype) * frac)


def fused_interp_f64(parts, par1, x1, par_t, x_t):
    """Loop-safe f64 interpolation of one or more tables sharing the
    same axes, without f64 matmuls or wide (N, D_T) f64 intermediates.

    ``parts`` is a sequence of (D1, D_T) tables (or (D_T,) vectors for
    rank-1 data) in f64; returns a tuple of per-cell (N,) f64 values,
    one per part.  The temperature axis -- typically the wide one
    (~100-400 bins) -- is contracted with an exact f32 split fetch
    (lookup.split_fetch) of the bracketing T rows of the TRANSPOSED
    tables, then both lerps run in elementwise f64; only a narrow
    (N, D1) f64 one-hot reduction remains (D1 ~ a few tens of density
    bins).  The f32 path keeps the temperature_rows/rows_at_temperature
    form instead: its (N, D_T) intermediates are cheap in f32 and the
    density contraction rides the MXU.

    Math identical to temperature_rows + rows_at_temperature (both axes
    lerp with unclamped fractions, i.e. linear extrapolation past grid
    edges, interpolators_g.F:29-37)."""
    from .lookup import split_fetch

    parts = list(parts)
    if parts[0].ndim == 1:
        # rank-1 data: T axis only
        d_t = parts[0].shape[0]
        i_t, f_t = _uniform_frac(x_t, par_t, d_t)
        tt = jnp.stack(parts, axis=1)  # (d_t, P)
        pair = jnp.concatenate([tt, jnp.roll(tt, -1, axis=0)], axis=1)
        v = split_fetch(pair, i_t)  # (N, 2P)
        p = len(parts)
        vt = v[:, :p] + (v[:, p:] - v[:, :p]) * f_t[:, None]
        return tuple(vt[:, j] for j in range(p))

    d1, d_t = parts[0].shape
    i1, f1 = _uniform_frac(x1, par1, d1)
    i_t, f_t = _uniform_frac(x_t, par_t, d_t)
    tt = jnp.concatenate([p.T for p in parts], axis=1)  # (d_t, d1*P)
    w = tt.shape[1]
    pair = jnp.concatenate([tt, jnp.roll(tt, -1, axis=0)], axis=1)
    v = split_fetch(pair, i_t)  # (N, 2*d1*P)
    vt = v[:, :w] + (v[:, w:] - v[:, :w]) * f_t[:, None]  # (N, d1*P)
    return _narrow_density_lerp(vt, i1, f1, d1, len(parts))


def _narrow_density_lerp(vt, i1, f1, d1, n_parts):
    """Per-part narrow (N, D1) one-hot density lerp of the fetched,
    T-interpolated rows (the shared tail of fused_interp_f64[_pre])."""
    n = i1.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, d1), 1)
    w_lo = (iota == i1[:, None]).astype(vt.dtype)
    w_hi = (iota == i1[:, None] + 1).astype(vt.dtype)
    out = []
    for j in range(n_parts):
        block = vt[:, j * d1:(j + 1) * d1]
        lo = jnp.sum(block * w_lo, axis=1)
        hi = jnp.sum(block * w_hi, axis=1)
        out.append(lo + (hi - lo) * f1)
    return tuple(out)


def fused_interp_f64_pre(prep, x1, x_t):
    """:func:`fused_interp_f64` consuming a precomputed table split
    (ops/cloudy_cool.py CloudyPrepF64) instead of building the
    transposed/paired/split matrices inline.  Math identical; the prep
    form is what runs inside the subcycle while-loop, where the inline
    table construction would re-execute per iteration (XLA's LICM does
    not hoist the emulated-f64 table reductions)."""
    from .lookup import split_fetch

    i_t, f_t = _uniform_frac(x_t, prep.par_t, prep.d_t)
    v = split_fetch(prep.split, i_t)
    if prep.rank1:
        p = prep.n_parts
        vt = v[:, :p] + (v[:, p:] - v[:, :p]) * f_t[:, None]
        return tuple(vt[:, j] for j in range(p))
    w = prep.d1 * prep.n_parts
    vt = v[:, :w] + (v[:, w:] - v[:, :w]) * f_t[:, None]
    i1, f1 = _uniform_frac(x1, prep.par1, prep.d1)
    return _narrow_density_lerp(vt, i1, f1, prep.d1, prep.n_parts)


def narrow_vec_lerp(vec, par1, x1):
    """Per-cell lerp of a (D1,) vector along a uniform axis via a narrow
    one-hot reduction (loop-safe: no gathers).  Used by the f64 Cloudy
    path for the scalar-T CMB-floor slice, where only the density lerp
    remains per-cell.  Extrapolates past grid edges like
    interpolators_g.F:29-37 (unclamped fraction)."""
    d1 = vec.shape[0]
    i1, f1 = _uniform_frac(x1, par1, d1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (x1.shape[0], d1), 1)
    lo = jnp.sum(jnp.where(iota == i1[:, None], vec[None, :], 0.0),
                 axis=1)
    hi = jnp.sum(jnp.where(iota == i1[:, None] + 1, vec[None, :], 0.0),
                 axis=1)
    return lo + (hi - lo) * f1


def rows_at_scalar_temperature(rows, par_t, x_scalar):
    """Row interpolation at one scalar temperature (e.g. T_CMB): a matvec
    with a two-element interpolation vector."""
    d_t = rows.shape[1]
    w = scalar_twohot_vec(x_scalar, par_t, d_t, rows.dtype)
    if rows.dtype == jnp.float64:
        # keep the f64 contraction off the (emulated) MXU: a broadcast
        # multiply + reduce runs on the cheap elementwise-f64 path
        return jnp.sum(rows * w[None, :], axis=1)
    return rows @ w


def interpolate_4d(x1, x2, x3, x4, par1, par2, par3, par4, data):
    """(interpolators_g.F:343-431); axis 4 indexed by bisection
    (INDEX_4_BISECTION, interpolators_g.F:478-496). Used by old-style
    Cloudy tables."""
    d1, d2, d3, d4 = data.shape
    i1 = _uniform_index(x1, par1, d1)
    i2 = _uniform_index(x2, par2, d2)
    i3 = _uniform_index(x3, par3, d3)
    i4 = jnp.clip(jnp.searchsorted(par4, x4, side="right") - 1, 0, d4 - 2)

    def v4(q, w, e):
        return _lerp(x4, par4[i4], par4[i4 + 1],
                     data[i1 + q, i2 + w, i3 + e, i4],
                     data[i1 + q, i2 + w, i3 + e, i4 + 1])

    def v3(q, w):
        return _lerp(x3, par3[i3], par3[i3 + 1], v4(q, w, 0), v4(q, w, 1))

    def v2(q):
        return _lerp(x2, par2[i2], par2[i2 + 1], v3(q, 0), v3(q, 1))

    return _lerp(x1, par1[i1], par1[i1 + 1], v2(0), v2(1))


def interpolate_5d(x1, x2, x3, x4, x5, par1, par2, par3, par4, par5, data):
    """(interpolators_g.F:436-566); axis 4 by bisection as in the
    reference."""
    d1, d2, d3, d4, d5 = data.shape
    i1 = _uniform_index(x1, par1, d1)
    i2 = _uniform_index(x2, par2, d2)
    i3 = _uniform_index(x3, par3, d3)
    i4 = jnp.clip(jnp.searchsorted(par4, x4, side="right") - 1, 0, d4 - 2)
    i5 = _uniform_index(x5, par5, d5)

    def v5(q, w, e, r):
        return _lerp(x5, par5[i5], par5[i5 + 1],
                     data[i1 + q, i2 + w, i3 + e, i4 + r, i5],
                     data[i1 + q, i2 + w, i3 + e, i4 + r, i5 + 1])

    def v4(q, w, e):
        return _lerp(x4, par4[i4], par4[i4 + 1],
                     v5(q, w, e, 0), v5(q, w, e, 1))

    def v3(q, w):
        return _lerp(x3, par3[i3], par3[i3 + 1], v4(q, w, 0), v4(q, w, 1))

    def v2(q):
        return _lerp(x2, par2[i2], par2[i2 + 1], v3(q, 0), v3(q, 1))

    return _lerp(x1, par1[i1], par1[i1 + 1], v2(0), v2(1))
