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
                  tdust_init=None, _pallas_int_masks=False):
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

    # Inside a Pallas kernel, bool arrays in a while_loop carry crash the
    # Mosaic compiler (see docs/Performance.md, Pallas post-mortem); the
    # masks are carried as int32 there and decoded at use sites.
    if _pallas_int_masks:
        enc = lambda m: m.astype(jnp.int32)  # noqa: E731
        dec = lambda m: m > 0  # noqa: E731
    else:
        enc = dec = lambda m: m  # noqa: E731

    def newton_cond(carry):
        tdust, pert, nm_mask, bi_mask, it = carry
        return (it < ITMAX) & jnp.any(dec(nm_mask))

    def newton_body(carry):
        tdust, pert, nm_mask, bi_mask, it = carry
        # scalar iteration-cap guard: lets a multi-step loop body overrun
        # the block boundary with exact semantics (steps at it >= ITMAX
        # are no-ops, identical to the reference's hard cap)
        nm_mask = dec(nm_mask) & (it < ITMAX)
        bi_mask = dec(bi_mask)
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
        return tdust, pert, enc(nm_mask), enc(bi_mask), it + 1

    bi_mask = itmask & ~done_cold
    # Loop strategy on TPU: an early-exit while_loop whose BODY is
    # `unroll` masked Newton steps.  Each while trip costs a fixed
    # ~8 us launch, so the 1-step-body while pays ~33 launches on cold
    # states; a fixed-trip fori_loop(ITMAX, unroll=8) pays a constant
    # ~7 blocks even though the warm-started solve (tdust_init from the
    # previous subcycle) converges in 1-2 steps.  The blocked while
    # exits after ONE block in the warm steady state and still bounds
    # the cold case at ceil(50/8) blocks.  Results are BIT-IDENTICAL
    # across all strategies: every update is masked, post-convergence
    # steps are no-ops, and the scalar `it < ITMAX` guard inside the
    # body keeps the iteration cap exact when a block overruns it.
    # On CPU the plain early-exit while wins.  GTPU_DUST_LOOP overrides:
    # one of blocked|fori|while.
    import os as _os
    _loop_env = _os.environ.get("GTPU_DUST_LOOP")
    if _loop_env is None:
        _fori_env = _os.environ.get("GTPU_DUST_FORI")  # legacy knob
        if _fori_env is not None:
            _loop_env = "fori" if _fori_env not in ("", "0") else "while"
    if _loop_env is None:
        _loop_env = (
            "blocked" if jax.default_backend() == "tpu" else "while"
        )
    if _loop_env not in ("blocked", "fori", "while"):
        raise ValueError(
            f"GTPU_DUST_LOOP must be one of blocked|fori|while, "
            f"got {_loop_env!r}"
        )
    # 4 re-measured best on v5e after the split-pack/sorted-scatter
    # changes (1.40M vs 1.35M flagship at 8; warm-started solves retire
    # in 1-2 Newton steps, so shorter blocks waste fewer masked lanes)
    unroll = int(_os.environ.get("GTPU_DUST_UNROLL", "4"))

    # A short fori "lead" block before the while (GTPU_DUST_LEAD) was a
    # ~2% win when the rest of the subcycle was slower; after the
    # lookup-padding and cloudy-merge rounds the lead's separately
    # launched substeps cost more than the early exit saves (measured
    # lead=0: ~1.24M vs lead=2: ~1.21M cells/s), so it defaults off.
    _lead_default = int(_os.environ.get("GTPU_DUST_LEAD", "0"))

    def _blocked(cond, body, carry, lead: int = _lead_default):
        # The lead runs as a fori_loop so the step compiles to the same
        # fused body as the while blocks -- inlining it lets XLA
        # fuse/contract the arithmetic differently and drift by an ulp.
        if lead:
            carry = jax.lax.fori_loop(0, lead, lambda i, c: body(c), carry)

        def blk_body(c):
            for _ in range(unroll):
                c = body(c)
            return c
        return jax.lax.while_loop(cond, blk_body, carry)

    carry0 = (tdust, pert0, enc(nm_mask), enc(bi_mask), jnp.int32(0))
    if _loop_env == "fori":
        carry = jax.lax.fori_loop(
            0, ITMAX, lambda i, c: newton_body(c), carry0, unroll=unroll)
    elif _loop_env == "blocked":
        carry = _blocked(newton_cond, newton_body, carry0)
    else:
        carry = jax.lax.while_loop(newton_cond, newton_body, carry0)
    tdust, _, _, bi_mask, _ = carry
    bi_mask = dec(bi_mask)

    # Bisection fallback (calc_tdust_1d_g.F:209-261): cells that never
    # converged with Newton, found a sub-CMB solution, or have
    # tgas > T_subl.
    t_low = jnp.where(bi_mask, trad * jnp.ones_like(tgas), tdust)
    t_high = tgas
    if tdust_init is not None:
        # Warm-started bracket: the equilibrium moves little between
        # subcycles (the 10% dt limiter bounds tgas changes), so a +-5%
        # window around the previous solution usually still brackets the
        # root -- verified by the balance signs (heating>0 below the
        # root, <0 above); cells where it does not keep the full
        # [trad, tgas] bracket.  Cuts ~28 halvings to ~7 per subcycle.
        lo_c = jnp.maximum(trad, 0.95 * tdust_init)
        hi_c = jnp.minimum(t_high, 1.05 * tdust_init)
        s_lo = calc_gr_balance(lo_c, tgas, calc_kappa_gr(lo_c), trad4,
                               gasgr, gamma_isrf, nh)
        s_hi = calc_gr_balance(hi_c, tgas, calc_kappa_gr(hi_c), trad4,
                               gasgr, gamma_isrf, nh)
        good = ((tdust_init > trad) & (hi_c > lo_c)
                & (s_lo > 0.0) & (s_hi < 0.0))
        t_low = jnp.where(bi_mask & good, lo_c, t_low)
        t_high = jnp.where(bi_mask & good, hi_c, t_high)

    def bi_cond(carry):
        t_low, t_high, bi_mask, it = carry
        return (it < BI_ITMAX) & jnp.any(dec(bi_mask))

    def bi_body(carry):
        t_low, t_high, bi_mask, it = carry
        bi_mask = dec(bi_mask) & (it < BI_ITMAX)
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
        return t_low_new, t_high_new, enc(bi_mask), it + 1

    bi_carry0 = (t_low, t_high, enc(bi_mask), jnp.int32(0))
    if _loop_env == "fori":
        t_low, _, _, _ = jax.lax.fori_loop(
            0, BI_ITMAX, lambda i, c: bi_body(c), bi_carry0,
            unroll=unroll)
    elif _loop_env == "blocked":
        t_low, _, _, _ = _blocked(bi_cond, bi_body, bi_carry0)
    else:
        t_low, _, _, _ = jax.lax.while_loop(bi_cond, bi_body, bi_carry0)

    return jnp.where(itmask, t_low, tdust)
