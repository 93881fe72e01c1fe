"""Temperature / mean-molecular-weight from Cloudy MMW tables.

TPU-native rebuild of the tabulated-mode fixed-point iteration
(grackle: src/clib/calc_temp1d_cloudy_g.F:4-245): T and mu are coupled
through the table mu(n_H, z, T), solved by damped fixed-point iteration with
per-cell convergence masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import interp

MU_METAL = 16.0
TI_MAX = 20


def tabulated_temperature(
    cloudy, d, metal, e, rhoH, dom, zr, temstart, gamma, utem,
    imetal: bool, use_fused: bool = False, mmw_prep=None,
):
    """Iterate T <-> mu(T) against the Cloudy MMW table.

    Returns (tgas, mmw).  cloudy is a CloudyTable with mmw data;
    rank 1 (T), 2 (n_H, T), or 3 (n_H, z, T).
    """
    inv_log10 = 1.0 / jnp.log(10.0)
    log_n_h = jnp.log10(rhoH * dom)

    rank = cloudy.grid_rank
    zi0 = end_int = None
    if rank == 3:
        d2 = cloudy.grid_dimension[1]
        zi0, end_int = interp.redshift_index(zr, cloudy.par2, d2)

    if use_fused:
        # contract the non-T axes once (loop-invariant); the fixed-point
        # iteration then only does row-wise T interpolation
        par_t = [cloudy.par1, cloudy.par2, cloudy.par3][rank - 1]
        if e.dtype == jnp.float64:
            # f64: skip the wide (N, D_T) f64 rows entirely — fetch the
            # bracketing T rows of the (collapsed) table with an exact
            # f32 split contraction and lerp narrowly in f64 each
            # iteration.  The table collapse/pair/split is built ONCE
            # here (or passed in as mmw_prep when this runs inside the
            # subcycle loop — XLA's LICM does not hoist the emulated-f64
            # table reductions out of while bodies).
            if mmw_prep is None:
                from . import cloudy_cool as _cc

                mmw_prep = _cc.prepare_cloudy_f64(
                    cloudy, zr, 1.0, icmbTfloor=0, iClHeat=0,
                    table="mmw",
                )

            def mu_interp(log10tem):
                return interp.fused_interp_f64_pre(
                    mmw_prep, log_n_h, log10tem
                )[0]

            return _fixed_point(mu_interp, cloudy, d, metal, e,
                                temstart, gamma, utem, imetal)
        mu_rows = interp.temperature_rows(
            cloudy, cloudy.mmw, log_n_h, zr, zi0, end_int, e.dtype
        )

        def mu_interp(log10tem):
            return interp.rows_at_temperature(mu_rows, par_t, log10tem)

        return _fixed_point(mu_interp, cloudy, d, metal, e, temstart,
                            gamma, utem, imetal)

    def mu_interp(log10tem):
        if rank == 1:
            return interp.interpolate_1d(log10tem, cloudy.par1, cloudy.mmw)
        elif rank == 2:
            return interp.interpolate_2d(
                log_n_h, log10tem, cloudy.par1, cloudy.par2, cloudy.mmw
            )
        elif rank == 3:
            return interp.interpolate_3dz(
                log_n_h, zr, log10tem,
                cloudy.par1, cloudy.par2, cloudy.par3,
                cloudy.mmw, zi0, end_int,
            )
        raise ValueError("Maximum mmw data grid rank is 3!")

    return _fixed_point(mu_interp, cloudy, d, metal, e, temstart, gamma,
                        utem, imetal)


def _fixed_point(mu_interp, cloudy, d, metal, e, temstart, gamma, utem,
                 imetal):
    inv_log10 = 1.0 / jnp.log(10.0)
    munew0 = jnp.ones_like(e)
    tgas0 = jnp.zeros_like(e)
    done0 = jnp.zeros(e.shape, dtype=bool)

    def body(carry):
        i, munew, tgas, done = carry
        muold = munew
        tgas_i = jnp.maximum((gamma - 1.0) * e * munew * utem, temstart)
        log10tem = jnp.log(tgas_i) * inv_log10
        mu_i = mu_interp(log10tem)
        mu_damped = 0.5 * (mu_i + muold)
        tgas_i = tgas_i * mu_damped / muold
        conv = jnp.abs((mu_damped / muold) - 1.0) <= 1.0e-2
        munew = jnp.where(done, munew, mu_damped)
        tgas = jnp.where(done, tgas, tgas_i)
        done = done | conv
        return i + 1, munew, tgas, done

    # Early-exit while_loop: converged lanes are frozen by the `done`
    # mask, so exiting once every lane has converged is bit-identical to
    # the reference's fixed TI_MAX sweep (calc_temp1d_cloudy_g.F:128-210)
    # — but skips the dead iterations, which matters because each one
    # re-reads the (N, D_T) temperature rows from HBM.
    def cond(carry):
        i, _, _, done = carry
        return (i < TI_MAX) & ~jnp.all(done)

    _, munew, tgas, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), munew0, tgas0, done0)
    )

    # Metal correction applied at convergence
    # (calc_temp1d_cloudy_g.F:214-224); unconverged cells keep the raw mu,
    # matching the reference's fall-through.
    if imetal:
        muold = munew
        mu_corr = d / ((d - metal) / munew + metal / MU_METAL)
        munew = jnp.where(done, mu_corr, munew)
        tgas = jnp.where(done, tgas * mu_corr / muold, tgas)

    return tgas, munew
