"""Cloudy table cooling/heating contribution.

TPU-native rebuild of the Cloudy interpolation kernels
(grackle: src/clib/cool1d_cloudy_g.F:4-261 for new-style rank 1-3 tables and
src/clib/cool1d_cloudy_old_tables_g.F for legacy 4/5-D tables).  The per-cell
scalar interpolation calls become batched gathers over the whole cell axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from . import interp


@dataclasses.dataclass(frozen=True)
class CloudyPrepF64:
    """Loop-invariant f64 Cloudy interpolation state, computed ONCE per
    solve call (ops/solver.py run_subcycles) instead of per subcycle:
    the redshift-collapsed, transposed, paired table as a precomputed
    double-f32 split (ops/lookup.py SplitTable), plus the CMB-floor
    density vector.  Plain container (never crosses a jit boundary --
    created and consumed within one trace)."""

    split: Any       # lookup.SplitTable of pair([cool|heat].T blocks)
    par1: Any        # density-axis parameter vector (None for rank 1)
    par_t: Any       # temperature-axis parameter vector
    d1: int          # density-axis length (0 for rank 1)
    d_t: int         # temperature-axis length
    n_parts: int     # 1 (cooling only / mmw) or 2 (+heating)
    rank1: bool
    want_heat: bool
    end_int: Any     # traced bool scalar (rank 3) or None
    cmb_vec: Any     # (D1,) vec / scalar (rank 1) / None


def prepare_cloudy_f64(cloudy, zr, comp2, icmbTfloor: int, iClHeat: int,
                       table: str = "cooling") -> CloudyPrepF64:
    """Build the per-call f64 prep for one Cloudy table group.

    ``table`` selects "cooling" (+heating when iClHeat and present) or
    "mmw" (the tabulated-mode mean-molecular-weight table).  All math
    matches the inline _cloudy_cooling_fused_f64 construction bit for
    bit -- this only hoists it out of the subcycle loop."""
    rank = cloudy.grid_rank
    zi0 = end_int = None
    if rank == 3:
        d2 = cloudy.grid_dimension[1]
        zi0, end_int = interp.redshift_index(zr, cloudy.par2, d2)

    if table == "mmw":
        parts = [cloudy.mmw]
        want_heat = False
        icmbTfloor = 0
    else:
        want_heat = iClHeat == 1 and cloudy.heating is not None
        parts = [cloudy.cooling] + (
            [cloudy.heating] if want_heat else []
        )
    if rank == 3:
        parts = [
            interp.collapse_redshift(p, cloudy.par2, zr, zi0, end_int)
            for p in parts
        ]

    from .lookup import make_split

    par_t = [cloudy.par1, cloudy.par2, cloudy.par3][rank - 1]
    rank1 = parts[0].ndim == 1
    if rank1:
        tt = jnp.stack(parts, axis=1)  # (d_t, P)
        d1 = 0
        d_t = parts[0].shape[0]
    else:
        tt = jnp.concatenate([p.T for p in parts], axis=1)
        d1, d_t = parts[0].shape
    pair = jnp.concatenate([tt, jnp.roll(tt, -1, axis=0)], axis=1)
    split = make_split(pair)

    cmb_vec = None
    if icmbTfloor == 1:
        log10_tCMB = jnp.log10(comp2)
        w_cmb = interp.scalar_twohot_vec(
            log10_tCMB, par_t, d_t, jnp.float64
        )
        cool_t = parts[0]
        if rank1:
            cmb_vec = jnp.sum(cool_t * w_cmb)
        else:
            cmb_vec = jnp.sum(cool_t * w_cmb[None, :], axis=1)  # (D1,)

    return CloudyPrepF64(
        split=split, par1=cloudy.par1 if not rank1 else None,
        par_t=par_t, d1=d1, d_t=d_t, n_parts=len(parts), rank1=rank1,
        want_heat=want_heat, end_int=end_int, cmb_vec=cmb_vec,
    )


def cloudy_cooling(
    cloudy,
    logtem,
    rhoH,
    metallicity,
    dom,
    zr,
    comp2,
    icmbTfloor: int,
    iClHeat: int,
    iZscale: int,
    use_fused: bool = False,
    prep: "CloudyPrepF64 | None" = None,
):
    """Return the Cloudy-table edot contribution (code units).

    Mirrors cool1d_cloudy_g.F:98-258: cooling is -10**logLambda, the CMB
    floor is applied as Lambda(T) - Lambda(T_CMB) when
    log10(T) - log10(T_CMB) < 2, heating is added when enabled (and, for
    rank-3 tables, suppressed past the final redshift), the result is
    optionally scaled by metallicity and multiplied by rhoH^2.
    """
    inv_log10 = 1.0 / jnp.log(10.0)
    log10_tCMB = jnp.log10(comp2)
    log10tem = logtem * inv_log10
    log_n_h = jnp.log10(rhoH * dom)

    rank = cloudy.grid_rank
    zi0 = end_int = None
    if rank == 3:
        d2 = cloudy.grid_dimension[1]
        zi0, end_int = interp.redshift_index(zr, cloudy.par2, d2)

    if use_fused:
        # gather-free path: contract density/redshift axes once, then
        # row-wise two-hot temperature interpolation (see ops/interp.py).
        # Cooling and heating concatenate along the temperature axis so
        # the density/redshift contraction runs as ONE conv for both.
        par_t = [cloudy.par1, cloudy.par2, cloudy.par3][rank - 1]
        dtype = logtem.dtype
        if dtype == jnp.float64:
            if prep is not None:
                return _cloudy_cooling_fused_f64_pre(
                    prep, log10tem, log_n_h, log10_tCMB,
                    rhoH, metallicity, icmbTfloor, iZscale,
                )
            return _cloudy_cooling_fused_f64(
                cloudy, rank, par_t, log10tem, log_n_h, log10_tCMB,
                rhoH, metallicity, zr, zi0, end_int,
                icmbTfloor, iClHeat, iZscale,
            )
        d_t = cloudy.cooling.shape[-1]
        want_heat = iClHeat == 1 and cloudy.heating is not None
        data = cloudy.cooling
        if want_heat:
            data = jnp.concatenate([data, cloudy.heating], axis=-1)
        rows = interp.temperature_rows(
            cloudy, data, log_n_h, zr, zi0, end_int, dtype
        )
        cool_rows = rows[:, :d_t]
        log_cool = interp.rows_at_temperature(cool_rows, par_t, log10tem)
        edot_met = -(10.0**log_cool)

        if icmbTfloor == 1:
            log_cool_cmb = interp.rows_at_scalar_temperature(
                cool_rows, par_t, log10_tCMB
            )
            edot_met = jnp.where(
                (log10tem - log10_tCMB) < 2.0,
                edot_met + 10.0**log_cool_cmb,
                edot_met,
            )

        if want_heat:
            heat = 10.0 ** interp.rows_at_temperature(
                rows[:, d_t:], par_t, log10tem
            )
            if rank == 3:
                heat = jnp.where(end_int, 0.0, heat)
            edot_met = edot_met + heat

        if iZscale == 1:
            edot_met = edot_met * metallicity
        return edot_met * rhoH * rhoH

    def table_interp(data, x_temp):
        if rank == 1:
            return interp.interpolate_1d(x_temp, cloudy.par1, data)
        elif rank == 2:
            return interp.interpolate_2d(
                log_n_h, x_temp, cloudy.par1, cloudy.par2, data
            )
        elif rank == 3:
            return interp.interpolate_3dz(
                log_n_h, zr, x_temp,
                cloudy.par1, cloudy.par2, cloudy.par3,
                data, zi0, end_int,
            )
        raise ValueError("Maximum cooling data grid rank is 3!")

    log_cool = table_interp(cloudy.cooling, log10tem)
    edot_met = -(10.0**log_cool)

    if icmbTfloor == 1:
        log_cool_cmb = table_interp(
            cloudy.cooling, jnp.broadcast_to(log10_tCMB, log10tem.shape)
        )
        edot_met = jnp.where(
            (log10tem - log10_tCMB) < 2.0,
            edot_met + 10.0**log_cool_cmb,
            edot_met,
        )

    if iClHeat == 1 and cloudy.heating is not None:
        log_heat = table_interp(cloudy.heating, log10tem)
        heat = 10.0**log_heat
        if rank == 3:
            # get_heat is switched off past the final table redshift
            # (cool1d_cloudy_g.F:136-137)
            heat = jnp.where(end_int, 0.0, heat)
        edot_met = edot_met + heat

    if iZscale == 1:
        edot_met = edot_met * metallicity

    return edot_met * rhoH * rhoH


def _cloudy_cooling_fused_f64(
    cloudy, rank, par_t, log10tem, log_n_h, log10_tCMB,
    rhoH, metallicity, zr, zi0, end_int,
    icmbTfloor: int, iClHeat: int, iZscale: int,
):
    """f64 fused path: avoid emulated-f64 matmuls AND wide (N, D_T) f64
    intermediates (the TPU backend emulates f64 matmuls at ~95x their
    f32 cost and elementwise f64 at ~1.3-2x; docs/Performance.md
    "Double precision on TPU").  The loop-invariant redshift collapse
    runs as a tiny f64 einsum, then interp.fused_interp_f64 fetches the
    bracketing TEMPERATURE rows of the transposed tables with an exact
    f32 split contraction and finishes with narrow (N, D1) f64 lerps.
    The CMB-floor term collapses the T axis at the scalar T_CMB first
    (a (D1,) vector), leaving only a narrow per-cell density lerp.

    Math identical to the f32 fused path (cool1d_cloudy_g.F:98-258
    semantics, including linear extrapolation past grid edges)."""
    want_heat = iClHeat == 1 and cloudy.heating is not None
    cool_t = cloudy.cooling
    heat_t = cloudy.heating if want_heat else None
    if rank == 3:
        cool_t = interp.collapse_redshift(
            cool_t, cloudy.par2, zr, zi0, end_int
        )
        if want_heat:
            heat_t = interp.collapse_redshift(
                heat_t, cloudy.par2, zr, zi0, end_int
            )
    parts = [cool_t] + ([heat_t] if want_heat else [])
    vals = interp.fused_interp_f64(
        parts, cloudy.par1 if rank > 1 else None, log_n_h,
        par_t, log10tem,
    )
    edot_met = -(10.0 ** vals[0])

    if icmbTfloor == 1:
        d_t = cool_t.shape[-1]
        w_cmb = interp.scalar_twohot_vec(
            log10_tCMB, par_t, d_t, jnp.float64
        )
        if rank == 1:
            cmb = jnp.sum(cool_t * w_cmb)
        else:
            vec = jnp.sum(cool_t * w_cmb[None, :], axis=1)  # (D1,)
            cmb = interp.narrow_vec_lerp(vec, cloudy.par1, log_n_h)
        edot_met = jnp.where(
            (log10tem - log10_tCMB) < 2.0,
            edot_met + 10.0 ** cmb,
            edot_met,
        )

    if want_heat:
        heat = 10.0 ** vals[1]
        if rank == 3:
            heat = jnp.where(end_int, 0.0, heat)
        edot_met = edot_met + heat

    if iZscale == 1:
        edot_met = edot_met * metallicity
    return edot_met * rhoH * rhoH


def _cloudy_cooling_fused_f64_pre(
    prep: CloudyPrepF64, log10tem, log_n_h, log10_tCMB,
    rhoH, metallicity, icmbTfloor: int, iZscale: int,
):
    """_cloudy_cooling_fused_f64 consuming the per-call prep
    (prepare_cloudy_f64) -- bit-identical math, with every
    loop-invariant table computation hoisted out of the subcycle
    while-loop body."""
    vals = interp.fused_interp_f64_pre(prep, log_n_h, log10tem)
    edot_met = -(10.0 ** vals[0])

    if icmbTfloor == 1:
        if prep.rank1:
            cmb = prep.cmb_vec
        else:
            cmb = interp.narrow_vec_lerp(prep.cmb_vec, prep.par1,
                                         log_n_h)
        edot_met = jnp.where(
            (log10tem - log10_tCMB) < 2.0,
            edot_met + 10.0 ** cmb,
            edot_met,
        )

    if prep.want_heat:
        heat = 10.0 ** vals[1]
        if prep.end_int is not None:
            heat = jnp.where(prep.end_int, 0.0, heat)
        edot_met = edot_met + heat

    if iZscale == 1:
        edot_met = edot_met * metallicity
    return edot_met * rhoH * rhoH


def cloudy_cooling_old_tables(
    cloudy,
    de,
    d,
    logtem,
    rhoH,
    metallicity,
    dom,
    zr,
    comp2,
    icmbTfloor: int,
    iClHeat: int,
    cl_ele_fra: float,
):
    """Legacy Cloudy tables with metallicity/electron-fraction axes
    (grackle: src/clib/cool1d_cloudy_old_tables_g.F:102-330).

    Axis order by rank: 1 (T); 2 (n_H, T); 3 (n_H, logZ, T);
    4 (n_H, logZ, log_e_frac, T); 5 (n_H, logZ, log_e_frac, z, T).
    The final contribution is ``edot_met * rhoH * d`` (cl_e_frac-scaled for
    rank > 3), unlike the new-style ``rhoH**2`` scaling.
    """
    inv_log10 = 1.0 / jnp.log(10.0)
    log10_tCMB = jnp.log10(comp2)
    log10tem = logtem * inv_log10
    log_n_h = jnp.log10(rhoH * dom)
    log_Z = jnp.log10(metallicity)

    rank = cloudy.grid_rank
    fh = rhoH / d
    # electron fraction relative to total nuclei
    # (cool1d_cloudy_old_tables_g.F:154-166)
    e_frac = 2.0 * de / (d * (1.0 + fh))
    log_e_frac = jnp.minimum(jnp.log10(e_frac), 0.0)
    cl_e_frac = e_frac * (
        1.0 + (2.0 * cl_ele_fra * metallicity * fh) / (1.0 + fh)
    )
    zr_arr = jnp.broadcast_to(jnp.asarray(zr, log10tem.dtype),
                              log10tem.shape)

    def table_interp(data, x_temp):
        if rank == 1:
            return interp.interpolate_1d(x_temp, cloudy.par1, data)
        elif rank == 2:
            return interp.interpolate_2d(
                log_n_h, x_temp, cloudy.par1, cloudy.par2, data
            )
        elif rank == 3:
            return interp.interpolate_3d(
                log_n_h, log_Z, x_temp,
                cloudy.par1, cloudy.par2, cloudy.par3, data,
            )
        elif rank == 4:
            return interp.interpolate_4d(
                log_n_h, log_Z, log_e_frac, x_temp,
                cloudy.par1, cloudy.par2, cloudy.par3, cloudy.par4, data,
            )
        elif rank == 5:
            return interp.interpolate_5d(
                log_n_h, log_Z, log_e_frac, zr_arr, x_temp,
                cloudy.par1, cloudy.par2, cloudy.par3, cloudy.par4,
                cloudy.par5, data,
            )
        raise ValueError("old-style Cloudy tables must be rank 1-5")

    log_cool = table_interp(cloudy.cooling, log10tem)
    edot_met = -(10.0**log_cool)

    if icmbTfloor == 1:
        log_cool_cmb = table_interp(
            cloudy.cooling, jnp.broadcast_to(log10_tCMB, log10tem.shape)
        )
        edot_met = jnp.where(
            (log10tem - log10_tCMB) < 2.0,
            edot_met + 10.0**log_cool_cmb,
            edot_met,
        )

    if iClHeat == 1 and cloudy.heating is not None:
        edot_met = edot_met + 10.0 ** table_interp(cloudy.heating, log10tem)

    if rank > 3:
        edot_met = edot_met * cl_e_frac

    return edot_met * rhoH * d
