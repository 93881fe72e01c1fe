"""Exact-integration radiative cooling for tabulated mode.

An opt-in alternative (``exact_cooling = 1``) to the subcycled energy
integration for ``primordial_chemistry = 0``: instead of stepping
``de/dt = edot(e)/d`` with the 10%-change limiter (up to hundreds of
subcycles), the temporal evolution function of Townsend (2009, ApJS 181,
391) is evaluated on the Cloudy temperature grid and the step is solved
in closed form.  The piecewise power-law representation of the cooling
curve between table nodes makes the integral of ``d * de / (-edot(e))``
analytic per segment, so the whole update is one vectorized pass:
per-cell node tables, prefix sums, a segment locate, and an analytic
inversion.  No while_loop, no subcycling — and because the computation
is single-shot (not inside a device loop), plain gathers are cheap.

Scope (validated at initialize): tabulated mode without external heating
(UVbackground, RT, user heating arrays, photoelectric heating, dust all
off).  Compton exchange with the CMB is included in the cooling curve.
Cells with net heating at their current state (T below the equilibrium
point) are held unchanged for the step — the scheme targets
cooling-dominated tabulated runs.

Accuracy: exact for a cooling curve that is piecewise power-law between
table nodes — the same resolution class as the table itself — where the
subcycled integrator accumulates first-order step error on top of that.

This capability has no analogue in the reference (grackle integrates
tabulated cooling with the same subcycled stepper as the chemistry
networks; src/clib/solve_rate_cool_g.F:443-817).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import dtype_tiny8
from . import interp
from .tabulated_temp import MU_METAL


def _node_tables(cfg, cloudy_prim, cloudy_met, pr, us, f, imetal):
    """Per-cell node arrays over the primordial table's temperature grid:
    internal energy e_k and net edot_k (code units) at each node.

    Mirrors the tabulated-mode branch of cool1d_multi
    (grackle: src/clib/cool1d_multi_g.F:917-1041) evaluated at every
    table temperature at once instead of at one iterated temperature.
    """
    d = f["density"]
    dtype = d.dtype
    fh = cfg.HydrogenFractionByMass
    gamma = cfg.Gamma
    metal = f["metal"] if imetal else jnp.zeros_like(d)
    rhoH = fh * (d - metal) if imetal else fh * d
    metallicity = (
        metal / d / cfg.SolarMetalFractionByMass
        if imetal else jnp.zeros_like(d)
    )
    dom = us.dom
    log_n_h = jnp.log10(rhoH * dom)

    rank = cloudy_prim.grid_rank
    par_t = [cloudy_prim.par1, cloudy_prim.par2,
             cloudy_prim.par3][rank - 1]
    zi0 = end_int = None
    if rank == 3:
        d2 = cloudy_prim.grid_dimension[1]
        zi0, end_int = interp.redshift_index(
            us.zr, cloudy_prim.par2, d2)

    log10T = jnp.asarray(par_t, dtype)          # (K,) node log10 temps
    T_k = 10.0 ** log10T                        # (K,)

    # mean molecular weight at every node: (N, K)
    mu_rows = interp.temperature_rows(
        cloudy_prim, cloudy_prim.mmw, log_n_h, us.zr, zi0, end_int,
        dtype,
    )
    if imetal:
        mu_rows = d[:, None] / (
            (d - metal)[:, None] / mu_rows
            + metal[:, None] / MU_METAL
        )

    # energy nodes e_k = T_k / ((gamma-1) mu_k utem): (N, K)
    e_nodes = T_k[None, :] / (
        (gamma - 1.0) * mu_rows * us.utem
    )
    # guard monotonicity against table noise (mu transitions keep e
    # increasing physically; cummax makes it robust)
    e_nodes = jnp.maximum.accumulate(e_nodes, axis=1)

    # --- net edot at every node (code units) ---
    # primordial Cloudy cooling (cool1d_multi_g.F:917-929; no CMB floor,
    # no heating in the restricted exact mode)
    prim_rows = interp.temperature_rows(
        cloudy_prim, cloudy_prim.cooling, log_n_h, us.zr, zi0, end_int,
        dtype,
    )
    edot_rows = -(10.0 ** prim_rows) * (rhoH * rhoH)[:, None]

    # electron number density from mu (cool1d_multi_g.F:932-945)
    myde_rows = 1.0 - mu_rows * (3.0 * fh + 1.0) / 4.0
    if imetal:
        myde_rows = myde_rows - mu_rows * (
            metal / (d * MU_METAL)
        )[:, None]
    myde_rows = jnp.maximum(d[:, None] * myde_rows / mu_rows, 0.0)

    # Cloudy metal cooling with the CMB floor (cool1d_multi_g.F:1069-1097)
    if imetal and cfg.metal_cooling == 1:
        m_rank = cloudy_met.grid_rank
        m_par_t = [cloudy_met.par1, cloudy_met.par2,
                   cloudy_met.par3][m_rank - 1]
        m_zi0 = m_end = None
        if m_rank == 3:
            m_zi0, m_end = interp.redshift_index(
                us.zr, cloudy_met.par2, cloudy_met.grid_dimension[1])
        met_rows = interp.temperature_rows(
            cloudy_met, cloudy_met.cooling, log_n_h, us.zr, m_zi0, m_end,
            dtype,
        )
        # the metal table's T grid can differ from the primordial one:
        # re-sample its rows at the primordial nodes with one matmul
        # against a stack of scalar interpolation vectors
        import jax

        d_t_met = met_rows.shape[1]
        if dtype == jnp.float64:
            # f64 matmuls are software-emulated on TPU (~95x the f32
            # cost); this is a one-shot path where gathers are legal,
            # so resample by take + lerp (identical math: the two-hot
            # rows below hold exactly (1-f, f) at (i, i+1))
            i_m, f_m = interp._uniform_frac(log10T, m_par_t, d_t_met)
            lo = jnp.take(met_rows, i_m, axis=1)
            hi = jnp.take(met_rows, i_m + 1, axis=1)
            met_at_nodes = lo + (hi - lo) * f_m[None, :]  # (N, K)
        else:
            R = jax.vmap(
                lambda t: interp.scalar_twohot_vec(t, m_par_t, d_t_met,
                                                   dtype)
            )(log10T)  # (K, K_met)
            met_at_nodes = met_rows @ R.T  # (N, K)
        edot_met = -(10.0 ** met_at_nodes)
        if cfg.cmb_temperature_floor == 1:
            log10_tCMB = jnp.log10(us.comp2)
            met_cmb = interp.rows_at_scalar_temperature(
                met_rows, m_par_t, log10_tCMB
            )  # (N,)
            edot_met = jnp.where(
                (log10T[None, :] - log10_tCMB) < 2.0,
                edot_met + 10.0 ** met_cmb[:, None],
                edot_met,
            )
        edot_rows = edot_rows + (
            edot_met * (metallicity * rhoH * rhoH)[:, None]
        )

    # Compton with the CMB (+ X-ray Compton, zero with UVB off)
    # (cool1d_multi_g.F:1027-1041)
    dom_inv = 1.0 / dom
    edot_rows = edot_rows - (
        us.comp1 * (T_k[None, :] - us.comp2) * myde_rows * dom_inv
    )
    edot_rows = edot_rows - (
        pr.comp_xray * (T_k[None, :] - pr.temp_xray)
        * myde_rows * dom_inv
    )
    return e_nodes, edot_rows


def exact_cool_step(cfg, cloudy_prim, cloudy_met, pr, us, f, dt,
                    imetal: bool):
    """Advance the internal energy by dt with the exact-integration
    scheme.  Returns the new energy array."""
    d = f["density"]
    e0 = f["energy"]
    dtype = d.dtype
    tiny8 = dtype_tiny8(dtype)

    e_nodes, edot_rows = _node_tables(
        cfg, cloudy_prim, cloudy_met, pr, us, f, imetal
    )
    c = jnp.maximum(-edot_rows, 0.0)            # cooling rate, >= 0
    cooling = c > tiny8                          # node actively cooling
    n_k = e_nodes.shape[1]

    # --- segment power laws (Townsend 2009 eq. 24-26 analogue in e) ---
    e_lo, e_hi = e_nodes[:, :-1], e_nodes[:, 1:]
    c_lo, c_hi = c[:, :-1], c[:, 1:]
    seg_ok = cooling[:, :-1] & cooling[:, 1:] & (e_hi > e_lo)
    safe_clo = jnp.where(seg_ok, c_lo, 1.0)
    safe_chi = jnp.where(seg_ok, c_hi, 1.0)
    ratio_e = e_hi / jnp.maximum(e_lo, tiny8)
    alpha = jnp.log(safe_chi / safe_clo) / jnp.log(
        jnp.maximum(ratio_e, 1.0 + 1e-7)
    )
    one_m_a = 1.0 - alpha
    near1 = jnp.abs(one_m_a) < 1.0e-4
    # full-segment crossing time d * int_{e_lo}^{e_hi} de / c(e)
    tau_pow = (
        d[:, None] * e_lo / (safe_clo * jnp.where(near1, 1.0, one_m_a))
        * (ratio_e ** jnp.where(near1, 0.0, one_m_a) - 1.0)
    )
    tau_log = d[:, None] * e_lo / safe_clo * jnp.log(ratio_e)
    tau = jnp.where(near1, tau_log, tau_pow)
    tau = jnp.where(seg_ok, tau, 0.0)            # blocked segments: 0

    # prefix time-to-bottom along cooling-only segments: Y[k] = time to
    # cool from node k down to node 0 through cooling segments
    Y = jnp.concatenate(
        [jnp.zeros((d.shape[0], 1), dtype),
         jnp.cumsum(tau, axis=1)], axis=1
    )  # (N, K)

    # per-cell reachable floor: the highest blocked segment at or below
    # the starting segment caps the descent at its top node
    s0 = jnp.clip(
        jnp.sum(e_nodes <= e0[:, None], axis=1) - 1, 0, n_k - 2
    )  # starting segment index
    seg_idx = jnp.arange(n_k - 1)
    blocked_below = (~seg_ok) & (seg_idx[None, :] <= s0[:, None])
    # floor node = (highest blocked segment index)+1, or 0 if none
    floor_node = jnp.max(
        jnp.where(blocked_below, seg_idx[None, :] + 1, 0), axis=1
    )

    take = jnp.take_along_axis
    e_s0 = take(e_nodes, s0[:, None], 1)[:, 0]
    c_s0 = take(c, s0[:, None], 1)[:, 0]
    a_s0 = take(alpha, s0[:, None], 1)[:, 0]
    ok_s0 = take(seg_ok, s0[:, None], 1)[:, 0]
    Y_s0 = take(Y, s0[:, None], 1)[:, 0]
    Y_floor = take(Y, floor_node[:, None], 1)[:, 0]

    # partial time from node s0 up to e0 (same closed forms); for e0
    # beyond the top node this extrapolates the edge power law, matching
    # the clamped-index extrapolation of the table interpolators
    x0 = jnp.maximum(e0 / jnp.maximum(e_s0, tiny8), 1.0)
    om = 1.0 - a_s0
    nr1 = jnp.abs(om) < 1.0e-4
    part_pow = (
        d * e_s0 / (jnp.where(ok_s0, c_s0, 1.0)
                    * jnp.where(nr1, 1.0, om))
        * (x0 ** jnp.where(nr1, 0.0, om) - 1.0)
    )
    part_log = d * e_s0 / jnp.where(ok_s0, c_s0, 1.0) * jnp.log(x0)
    Y_e0 = Y_s0 + jnp.where(ok_s0, jnp.where(nr1, part_log, part_pow),
                            0.0)

    # --- the step: Y(e_new) = Y(e0) - dt, clamped at the floor ---
    Y_new = jnp.clip(Y_e0 - dt, Y_floor, Y_e0)

    # locate the segment containing Y_new and invert the closed form
    s_new = jnp.clip(
        jnp.sum(Y <= Y_new[:, None], axis=1) - 1, 0, n_k - 2
    )
    e_s = take(e_nodes, s_new[:, None], 1)[:, 0]
    c_s = take(c, s_new[:, None], 1)[:, 0]
    a_s = take(alpha, s_new[:, None], 1)[:, 0]
    ok_s = take(seg_ok, s_new[:, None], 1)[:, 0]
    Y_s = take(Y, s_new[:, None], 1)[:, 0]
    dY = jnp.maximum(Y_new - Y_s, 0.0)
    om_s = 1.0 - a_s
    nr1_s = jnp.abs(om_s) < 1.0e-4
    c_safe = jnp.where(ok_s, c_s, 1.0)
    base = 1.0 + dY * c_safe * jnp.where(nr1_s, 1.0, om_s) / (
        d * jnp.maximum(e_s, tiny8)
    )
    e_pow = e_s * jnp.maximum(base, tiny8) ** (
        1.0 / jnp.where(nr1_s, 1.0, om_s)
    )
    e_log = e_s * jnp.exp(dY * c_safe / (d * jnp.maximum(e_s, tiny8)))
    e_new = jnp.where(nr1_s, e_log, e_pow)
    e_new = jnp.where(ok_s, e_new, e_s)

    # net-heating cells (T at/below the equilibrium point) are held;
    # cells already below the table bottom are held as well
    hold = ~ok_s0 & (Y_e0 <= Y_s0)
    start_heating = jnp.sum(
        jnp.where(e_nodes <= e0[:, None], 1, 0), axis=1
    ) == 0
    e_new = jnp.where(hold | start_heating, e0, e_new)
    # never exceed the starting energy (pure cooling step)
    return jnp.minimum(e_new, e0)
