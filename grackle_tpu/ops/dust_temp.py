"""Equilibrium dust temperature solve.

TPU-native rebuild of the reference's per-cell Newton-with-numeric-derivative
iteration plus bisection fallback (grackle: src/clib/calc_tdust_1d_g.F:6-471).
Control-flow divergence becomes masked dataflow: all cells advance together
under boolean lane masks inside bounded ``lax.while_loop``s.

All quantities here are CGS (the reference keeps the dust solve in CGS;
see rate_functions.c:1328-1336).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import sigma_sb, tiny

T_SUBL = 1.5e3  # grain sublimation temperature (calc_tdust_1d_g.F:58)
RADF = 4.0 * sigma_sb
KGR1 = 4.0e-4
KGR200 = 16.0
TOL = 1.0e-5
BI_TOL = 1.0e-3
MINPERT = 1.0e-10
ITMAX = 50
BI_ITMAX = 30
PERT_I = 1.0e-3


def calc_kappa_gr(tdust):
    """Grain Planck mean opacity, Dopcke et al. 2011 normalized to
    Omukai 2000 (calc_tdust_1d_g.F:370-386)."""
    return jnp.where(
        tdust < 200.0,
        KGR1 * tdust**2,
        jnp.where(
            tdust < T_SUBL,
            KGR200,
            jnp.maximum(tiny, KGR200 * (tdust / 1.5e3) ** -12),
        ),
    )


def calc_gr_balance(tdust, tgas, kgr, trad4, gasgr, gamma_isrf, nh):
    """Grain heating - cooling balance (calc_tdust_1d_g.F:459-468)."""
    return (
        gamma_isrf
        + RADF * kgr * (trad4 - tdust**4)
        + gasgr * nh * (tgas - tdust)
    )


def calc_tdust_1d(tgas, nh, gasgr, gamma_isrf_coef, isrf, itmask, trad,
                  tdust_init=None):
    """Solve for the equilibrium dust temperature of every cell.

    Args:
      tgas: gas temperature [K], shape [N].
      nh: hydrogen number density [cm^-3].
      gasgr: gas/grain heat transfer rate (CGS, already scaled by fgr).
      gamma_isrf_coef: scalar ISRF heating coefficient (gamma_isrf rate).
      isrf: per-cell ISRF in Habing units.
      itmask: active-cell mask.
      trad: CMB temperature (scalar, traced).
      tdust_init: optional warm start (e.g. the previous subcycle's
        solution).  Newton converges to the same equilibrium root
        (tol 1e-5) from any bracketed start, so this only cuts the
        iteration count — typically to 1-2 once the subcycle's 10%%
        limiter keeps tgas changes small.

    Returns dust temperature, shape [N] (calc_tdust_1d_g.F:6-306).
    """
    trad = jnp.maximum(1.0, trad)
    trad4 = trad**4
    gamma_isrf = isrf * gamma_isrf_coef

    # Initial guess (calc_tdust_1d_g.F:105-130)
    tdust0 = jnp.maximum(trad, (gamma_isrf / RADF / KGR1) ** 0.17)
    if tdust_init is not None:
        # reject out-of-bracket warm starts (first call passes zeros)
        ok = (tdust_init > trad) & (tdust_init < T_SUBL)
        tdust0 = jnp.where(ok, tdust_init, tdust0)
    pert0 = jnp.full_like(tgas, PERT_I)

    sub_mask = tgas > T_SUBL  # straight to bisection
    done_cold = trad >= tgas  # radiative equilibrium with CMB

    nm_mask = itmask & ~done_cold & ~sub_mask
    tdust = jnp.where(done_cold, trad, tdust0)

    def newton_cond(carry):
        tdust, pert, nm_mask, bi_mask, it = carry
        return (it < ITMAX) & jnp.any(nm_mask)

    def newton_body(carry):
        tdust, pert, nm_mask, bi_mask, it = carry
        tdplus = jnp.maximum(1.0e-3, (1.0 + pert) * tdust)
        kgr = calc_kappa_gr(tdust)
        kgrplus = calc_kappa_gr(tdplus)
        sol = calc_gr_balance(tdust, tgas, kgr, trad4, gasgr,
                              gamma_isrf, nh)
        solplus = calc_gr_balance(tdplus, tgas, kgrplus, trad4, gasgr,
                                  gamma_isrf, nh)
        slope = (solplus - sol) / (pert * tdust)
        tdustold = tdust
        tdustnew = tdust - sol / slope
        pertnew = jnp.maximum(
            jnp.minimum(pert, 0.5 * jnp.abs(tdustnew - tdustold)
                        / tdustnew),
            MINPERT,
        )
        negative = tdustnew < trad
        converged = jnp.abs(sol / solplus) < TOL
        # update only active-Newton lanes
        tdust = jnp.where(nm_mask, tdustnew, tdust)
        pert = jnp.where(nm_mask, pertnew, pert)
        bi_mask = bi_mask & ~(nm_mask & converged & ~negative)
        nm_mask = nm_mask & ~negative & ~converged
        return tdust, pert, nm_mask, bi_mask, it + 1

    bi_mask = itmask & ~done_cold
    import os as _os
    if _os.environ.get("GTPU_DUST_FORI"):
        unroll = int(_os.environ.get("GTPU_DUST_UNROLL", "4"))
        carry = (tdust, pert0, nm_mask, bi_mask, jnp.int32(0))
        carry = jax.lax.fori_loop(
            0, ITMAX, lambda i, c: newton_body(c), carry,
            unroll=unroll)
        tdust, _, _, bi_mask, _ = carry
    else:
        tdust, _, _, bi_mask, _ = jax.lax.while_loop(
            newton_cond, newton_body,
            (tdust, pert0, nm_mask, bi_mask, jnp.int32(0)),
        )

    # Bisection fallback (calc_tdust_1d_g.F:209-261): cells that never
    # converged with Newton, found a sub-CMB solution, or have
    # tgas > T_subl.
    t_low = jnp.where(bi_mask, trad * jnp.ones_like(tgas), tdust)
    t_high = tgas

    def bi_cond(carry):
        t_low, t_high, bi_mask, it = carry
        return (it < BI_ITMAX) & jnp.any(bi_mask)

    def bi_body(carry):
        t_low, t_high, bi_mask, it = carry
        t_mid = 0.5 * (t_low + t_high)
        t_mid = jnp.where(it == 0, jnp.minimum(t_mid, T_SUBL), t_mid)
        kgr = calc_kappa_gr(t_mid)
        sol = calc_gr_balance(t_mid, tgas, kgr, trad4, gasgr,
                              gamma_isrf, nh)
        go_up = sol > 0.0
        t_low_new = jnp.where(bi_mask & go_up, t_mid, t_low)
        t_high_new = jnp.where(bi_mask & ~go_up, t_mid, t_high)
        conv = jnp.abs(t_high_new - t_low_new) / t_low_new <= BI_TOL
        bi_mask = bi_mask & ~conv
        return t_low_new, t_high_new, bi_mask, it + 1

    if _os.environ.get("GTPU_DUST_FORI"):
        unroll = int(_os.environ.get("GTPU_DUST_UNROLL", "4"))
        t_low, _, _, _ = jax.lax.fori_loop(
            0, BI_ITMAX, lambda i, c: bi_body(c),
            (t_low, t_high, bi_mask, jnp.int32(0)), unroll=unroll)
    else:
        t_low, _, _, _ = jax.lax.while_loop(
            bi_cond, bi_body, (t_low, t_high, bi_mask, jnp.int32(0))
        )

    return jnp.where(itmask, t_low, tdust)
