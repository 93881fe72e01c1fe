"""Subcycled chemistry + cooling solver.

TPU-native rebuild of the reference's main kernel driver
(grackle: src/clib/solve_rate_cool_g.F:6-892).  The reference parallelizes
over grid rows with OpenMP and subcycles each row until every cell reaches
dt; here the whole (flat) cell array advances together inside one
``lax.while_loop`` whose lane mask retires cells individually -- per-cell
convergence rather than the reference's row-granular exit.

All physics flags come from the JIT-static ChemistryConfig, so each
configuration compiles to straight-line vector code containing only the
enabled processes.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp

from ..constants import tiny
from . import chemistry_step as cs
from .common import dtype_huge8, dtype_tiny8, dtype_tolerance
from .cooling import cool1d_multi
from .network import network_field_keys, network_update
from .network_kernel import kernel_requested, network_update_pallas

_SPECIES_1 = ["de", "HI", "HII", "HeI", "HeII", "HeIII"]
_SPECIES_2 = ["HM", "H2I", "H2II"]
_SPECIES_3 = ["DI", "DII", "HDI"]


def species_names(cfg):
    names = []
    if cfg.primordial_chemistry > 0:
        names += _SPECIES_1
    if cfg.primordial_chemistry > 1:
        names += _SPECIES_2
    if cfg.primordial_chemistry > 2:
        names += _SPECIES_3
    return names


def scale_fields(cfg, f, factor, imetal: bool):
    """Comoving <-> proper density scaling
    (solve_rate_cool_g.F:898-989)."""
    out = dict(f)
    out["density"] = f["density"] * factor
    for name in species_names(cfg):
        out[name] = f[name] * factor
    if imetal:
        out["metal"] = f["metal"] * factor
    if cfg.use_dust_density_field == 1:
        out["dust"] = f["dust"] * factor
    return out


def ceiling_species(cfg, f, imetal: bool):
    """Floor species at tiny (solve_rate_cool_g.F:994-1070)."""
    out = dict(f)
    if cfg.primordial_chemistry > 0:
        for name in ["de", "HI", "HII", "HeI", "HeII"]:
            out[name] = jnp.maximum(f[name], tiny)
        out["HeIII"] = jnp.maximum(f["HeIII"], 1.0e-5 * tiny)
    if cfg.primordial_chemistry > 1:
        for name in _SPECIES_2:
            out[name] = jnp.maximum(f[name], tiny)
    if cfg.primordial_chemistry > 2:
        for name in _SPECIES_3:
            out[name] = jnp.maximum(f[name], tiny)
    if imetal:
        out["metal"] = jnp.maximum(f["metal"], tiny)
    return out


def _h2_apply_mask(cool, f, us, itmask):
    """Cells where the high-density H2 equilibrium limiter fires
    (solve_rate_cool_g.F:592-595): rho*dom > 1e8 with net heating.

    itmask in the predicate: a retired-but-dense cell must not defeat
    the any-cell-dense skip (dtit on retired lanes is never consumed,
    so this is bit-identical)."""
    return (f["density"] * us.dom > 1.0e8) & (cool.edot > 0.0) & itmask


def _h2_limit_value(cfg, tables, rs, cool, f, us):
    """The raw per-cell H2-equilibrium dt limit
    (solve_rate_cool_g.F:596-643): at rho > 1e8 mh with heating, the dt
    at which the k13/k22 equilibrium H abundance changes by ~10%.
    Only meaningful on lanes where :func:`_h2_apply_mask` holds."""
    fh = cfg.HydrogenFractionByMass
    d = f["density"]
    tgas = cool.tgas
    dlogtem = (
        jnp.log(cfg.TemperatureEnd) - jnp.log(cfg.TemperatureStart)
    ) / (cfg.NumberOfTemperatureBins - 1)
    ti = rs.ti
    k13a, k22a = tables.k13, tables.k22
    fused = cfg.use_fused_lookup == 1
    if fused:
        # Both evaluation points eqt1/eqt2 are clipped into the SAME
        # temperature bin [ti.t1, ti.t2] that brackets tgas, so a
        # single one-hot (N, n_bins) @ (n_bins, 4) contraction
        # fetching the bracketing (lo, hi) values of k13/k22 serves
        # both points; the lerp then runs exactly per cell.  (The
        # previous form paid TWO dense two-hot HIGHEST matmuls here
        # -- ~30% of the whole subcycle on v5e.)  One-hot weights
        # are exact in bf16, so Precision.HIGH reproduces the f32
        # table values to ~1e-7.
        from .lookup import onehot_fetch, pair_matrix

        pre = None
        if k13a.dtype == jnp.float64:
            # precomputed at table build (rates/tables.py): keeps the
            # pair/split table math out of the loop body in f64 mode
            pre = getattr(tables, "split_h2limit_pair", None)
        if pre is not None:
            vals = onehot_fetch(None, ti.idx, pre=pre)
        else:
            pair = pair_matrix(jnp.stack([k13a, k22a], axis=1))
            vals = onehot_fetch(pair, ti.idx)
        lo13, lo22, hi13, hi22 = (
            vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3]
        )
    else:
        lo13, hi13 = k13a[ti.idx], k13a[ti.idx + 1]
        lo22, hi22 = k22a[ti.idx], k22a[ti.idx + 1]

    def heq_at(eqt):
        eqtdef = (eqt - ti.t1) / (ti.t2 - ti.t1)
        k13_i = lo13 + (hi13 - lo13) * eqtdef
        k22_i = lo22 + (hi22 - lo22) * eqtdef
        return (-1.0 / (4.0 * k22_i)) * (
            k13_i - jnp.sqrt(8.0 * k13_i * k22_i * fh * d + k13_i**2)
        )

    eqt2 = jnp.minimum(jnp.log(tgas) + 0.1 * dlogtem, ti.t2)
    eqt1 = jnp.maximum(jnp.log(tgas) - 0.1 * dlogtem, ti.t1)
    heq2 = heq_at(eqt2)
    heq1 = heq_at(eqt1)
    dheq = (
        jnp.abs(heq2 - heq1) / (jnp.exp(eqt2) - jnp.exp(eqt1))
    ) * (tgas / cool.p2d) * cool.edot
    k13, k22 = rs.k["k13"], rs.k["k22"]
    heq = (-1.0 / (4.0 * k22)) * (
        k13 - jnp.sqrt(8.0 * k13 * k22 * fh * d + k13**2)
    )
    return cfg.subcycle_accuracy * heq / dheq


def _h2_equilibrium_dt(cfg, tables, rs, cool, f, us, dtit, itmask):
    """High-density H2 equilibrium timestep limiter, in-place form
    (solve_rate_cool_g.F:592-643): apply ``min(dtit, limit)`` on firing
    lanes.  Used by the inline (default) subcycle path.

    The limiter only fires where ``rho*dom > 1e8`` with net heating,
    which is NO cell at all in most workloads, so the whole computation
    sits behind a ``lax.cond`` on "any cell dense" whose FALSE branch is
    the identity on dtit -- quiescent states skip it entirely and add
    zero full-width ops (bit-identical results either way: the
    limiter's dtit minimum is only taken on masked lanes)."""
    apply = _h2_apply_mask(cool, f, us, itmask)

    def limited(dtit):
        limit = _h2_limit_value(cfg, tables, rs, cool, f, us)
        return jnp.where(apply, jnp.minimum(dtit, limit), dtit)

    return jax.lax.cond(
        jnp.any(apply), limited, lambda dtit: dtit, dtit
    )


def _h2_equilibrium_limit(cfg, tables, rs, cool, f, us, itmask):
    """High-density H2 equilibrium timestep limit, value form: the
    per-cell dt LIMIT (+huge where inactive) rather than the applied
    minimum, so the min can run inside the fused network region
    (ops/network.py) -- bit-identical to :func:`_h2_equilibrium_dt`
    because dtit is already <= 0.5*dt when the min is taken.  Used only
    by the network-region path (Pallas kernel / compensated mode)."""
    d = f["density"]
    huge8 = dtype_huge8(d.dtype)
    apply = _h2_apply_mask(cool, f, us, itmask)

    def limited(_):
        limit = _h2_limit_value(cfg, tables, rs, cool, f, us)
        return jnp.where(apply, limit, huge8)

    return jax.lax.cond(
        jnp.any(apply), limited,
        lambda _: jnp.full_like(d, huge8), 0,
    )


@dataclasses.dataclass(frozen=True)
class SolveResult:
    fields: Any
    n_iterations: Any  # scalar int: subcycles taken
    converged: Any  # [N] bool: cells that reached dt within max_iterations
    cell_iterations: Any  # [N] int32: subcycles each cell was active for


def prepare_fields(cfg, f, us, imetal: bool, comoving: bool):
    """Pre-loop field conditioning: comoving scaling + species ceiling
    (solve_rate_cool_g.F:347-355, 994-1070).  Returns the conditioned
    fields and the initial iteration mask."""
    f = dict(f)
    if comoving:
        f = scale_fields(cfg, f, us.aye**-3, imetal)
    f = ceiling_species(cfg, f, imetal)

    itmask0 = jnp.ones(f["density"].shape, dtype=bool)
    # coupled radiative-transfer intermediate stepping masks
    # (solve_rate_cool_g.F:418-439)
    if (cfg.use_radiative_transfer == 1
            and cfg.radiative_transfer_coupled_rate_solver == 1):
        has_rad = f["RT_HI_ionization_rate"] > 0
        if cfg.radiative_transfer_intermediate_step == 1:
            itmask0 = has_rad
        else:
            itmask0 = ~has_rad
    return f, itmask0


def split_state(cfg, f):
    """Partition the field dict into the loop-mutable state (energy +
    chemical species) and read-only constants (density, metal, dust,
    velocities, RT/heating rate arrays, shielding fields).  Only the
    state needs to live in the subcycle carry and be scattered back by
    the compaction machinery; constants are gathered per batch but
    never written."""
    state_keys = set(species_names(cfg)) | {"energy"}
    f_state = {k: v for k, v in f.items() if k in state_keys}
    f_const = {k: v for k, v in f.items() if k not in state_keys}
    return f_state, f_const


def init_carry(f_state, itmask0, cfg=None):
    """Build the subcycle loop carry.  All loop-MUTABLE per-cell state
    lives here so the loop can be run in chunks and compacted between
    chunks (the converged-cell compaction optimization; see
    api.solve_chemistry).  Read-only fields stay outside (split_state).

    With ``cfg.compensated_sums == 1`` the carry additionally holds the
    Neumaier compensation terms for the energy and subcycle-clock sums
    (``energy_lo`` / ``ttot_lo``; see ops/network.py)."""
    ref = f_state["energy"]
    d_shape = ref.shape
    zeros = jnp.zeros(d_shape, dtype=ref.dtype)
    comp = {}
    if cfg is not None and cfg.compensated_sums == 1:
        comp = dict(energy_lo=zeros, ttot_lo=zeros)
    return dict(
        **comp,
        fields=dict(f_state),
        ttot=zeros,
        tgasold=zeros,
        tdust=zeros,  # warm start for the dust equilibrium solve
        dedot_prev=zeros,
        HIdot_prev=zeros,
        itmask=itmask0,
        cell_it=jnp.zeros(d_shape, dtype=jnp.int32),
        # set when a cell is retired by the max_iterations cap rather
        # than by reaching dt (solve_rate_cool_g.F:823-843)
        capped=jnp.zeros(d_shape, dtype=bool),
        # last subcycle dt taken; (dt - ttot) / dtit_prev predicts the
        # residual subcycle count, used to sort cells into batches of
        # similar remaining work (converged-cell compaction)
        dtit_prev=zeros,
    )


def run_subcycles(
    cfg,
    tables,
    cloudy_prim,
    cloudy_met,
    pr,
    us,
    carry0,
    dt,
    imetal: bool,
    cloudy_data_new: bool = True,
    chunk: int | None = None,
    const_f=None,
    l_h2shield_field=None,
):
    """Run up to ``chunk`` subcycle iterations (default: to the
    max_iterations cap), retiring converged cells via the lane mask.
    The per-cell update is purely elementwise and iteration bookkeeping
    (first-iteration init, >50-iteration damping, the max_iterations
    cap) uses the per-cell subcycle counter, so any subset of cells
    advances identically to the full array -- which is what makes
    converged-cell compaction exact.  (The reference is likewise
    row-granular: each OpenMP row subcycles on its own counter,
    solve_rate_cool_g.F:369-403.)

    ``const_f`` holds the read-only field arrays (split_state); they are
    closed over rather than carried, so the while_loop carry contains
    only genuinely mutable state.

    Mirrors the subcycle loop of solve_rate_cool_g.F:443-813.
    """
    ispecies = cfg.primordial_chemistry
    if const_f is None or "density" not in const_f:
        raise ValueError(
            "run_subcycles requires const_f (the read-only field dict "
            "from split_state); density is always routed there"
        )
    d_shape = const_f["density"].shape
    dtype = const_f["density"].dtype
    tiny8 = dtype_tiny8(dtype)
    huge8 = dtype_huge8(dtype)
    tolerance = dtype_tolerance(dtype)

    if chunk is None:
        chunk = cfg.max_iterations

    # The elementwise network region (rate sums -> dt limiter -> energy
    # update -> BE Gauss-Seidel sweep -> clock bookkeeping) has two
    # implementations: the INLINE XLA chain below (the default -- XLA's
    # own fusion of it measured fastest, see docs/Performance.md
    # network-kernel post-mortem) and the extracted ops/network.py
    # region, used when it must run as one fused Pallas launch
    # (GTPU_NETWORK_KERNEL) or carry the Neumaier compensation pairs
    # (compensated_sums=1).
    n_cells = 1
    for s in d_shape:
        n_cells *= int(s)
    use_kernel = kernel_requested(n_cells, dtype)
    use_network_region = cfg.compensated_sums == 1 or use_kernel

    # f64 fused mode: build the per-call Cloudy interpolation preps
    # (redshift collapse, transposed pair matrices, double-f32 splits,
    # CMB-floor vectors) ONCE, outside the while-loop body.  Computed
    # inside the loop they would re-execute per subcycle: XLA's
    # loop-invariant code motion does not hoist the emulated-f64 table
    # reductions (measured on v5e; docs/Performance.md "Double
    # precision on TPU").  Bit-identical by construction — this only
    # moves where identical ops run.
    cloudy_prep = None
    if dtype == jnp.float64 and cfg.use_fused_lookup == 1:
        from . import cloudy_cool as _cc

        prep_prim = prep_met = prep_mmw = None
        if (ispecies == 0 and cloudy_prim is not None
                and cloudy_prim.grid_rank > 0):
            prep_prim = _cc.prepare_cloudy_f64(
                cloudy_prim, us.zr, us.comp2,
                icmbTfloor=0, iClHeat=cfg.UVbackground,
            )
            prep_mmw = _cc.prepare_cloudy_f64(
                cloudy_prim, us.zr, us.comp2,
                icmbTfloor=0, iClHeat=0, table="mmw",
            )
        if (imetal and cfg.metal_cooling == 1 and cloudy_data_new
                and cloudy_met is not None and cloudy_met.grid_rank > 0):
            prep_met = _cc.prepare_cloudy_f64(
                cloudy_met, us.zr, us.comp2,
                icmbTfloor=cfg.cmb_temperature_floor,
                iClHeat=cfg.UVbackground,
            )
        cloudy_prep = dict(prim=prep_prim, met=prep_met, mmw=prep_mmw)

    # GTPU_SUBCYCLE_UNROLL > 1 executes that many subcycle iterations
    # per while_loop trip, amortizing the fixed per-trip launch cost
    # (~140 us of sequential fusion issue; docs/Performance.md) over
    # more work.  Bit-identical by construction: every carry update is
    # lane-masked, so an extra fully-masked iteration after all lanes
    # retire is a bitwise no-op, and the `chunk % unroll == 0` guard
    # keeps chunked runs (warm phase) at exactly `chunk` iterations.
    unroll_env = os.environ.get("GTPU_SUBCYCLE_UNROLL")
    try:
        unroll = int(unroll_env) if unroll_env else 1
    except ValueError as exc:
        raise ValueError(
            f"GTPU_SUBCYCLE_UNROLL must be an integer, got {unroll_env!r}"
        ) from exc
    if unroll < 1 or chunk % unroll != 0:
        unroll = 1

    def cond(state):
        step, carry = state
        return (step < chunk) & jnp.any(carry["itmask"])

    def _network_region_carry(carry, f, cool, rs, itmask):
        """Dispatch one subcycle's network region to ops/network.py
        (plain or as a single Pallas launch)."""
        h2_limit = None
        if ispecies > 1:
            h2_limit = _h2_equilibrium_limit(
                cfg, tables, rs, cool, f, us, itmask
            )
        f_net = {k: f[k] for k in network_field_keys(cfg)}
        cool_v = dict(
            edot=cool.edot, tgas=cool.tgas, p2d=cool.p2d,
            rhoH=cool.rhoH, tgasold=cool.tgasold, tdust=cool.tdust,
        )
        carry_v = {k: v for k, v in carry.items() if k != "fields"}
        if use_kernel:
            return network_update_pallas(
                cfg, us, dt, f_net, rs, cool_v, carry_v, h2_limit
            )
        return network_update(
            cfg, us, dt, f_net, rs, cool_v, carry_v, h2_limit
        )

    def one_iter(state):
        step, carry = state
        f = dict(const_f)
        f.update(carry["fields"])
        itmask = carry["itmask"]
        ttot = carry["ttot"]
        it = carry["cell_it"]
        first_iter = it == 0

        cool = cool1d_multi(
            cfg, tables, cloudy_prim, cloudy_met, pr, us, f,
            carry["tgasold"], first_iter, imetal, cloudy_data_new,
            tdust_prev=carry["tdust"], cloudy_prep=cloudy_prep,
        )
        edot = cool.edot
        dtit = jnp.full(d_shape, huge8, dtype=edot.dtype)

        rs = None
        if ispecies > 0:
            rs = cs.lookup_cool_rates(
                cfg, tables, pr, us, f, cool.tgas, cool.mmw, cool.tdust,
                cool.dust2gas, l_h2shield_field, imetal,
            )

        if use_network_region:
            return step + 1, _network_region_carry(
                carry, f, cool, rs, itmask
            )

        if ispecies > 0:
            dedot, HIdot, edot = cs.rate_timestep(
                cfg, rs, f, us, edot, cool.rhoH
            )

            # dt limiter (solve_rate_cool_g.F:554-692)
            de, HI = f["de"], f["HI"]
            dedot = jnp.where(
                jnp.abs(dedot) < tiny8, jnp.minimum(tiny, de), dedot
            )
            HIdot = jnp.where(
                jnp.abs(HIdot) < tiny8, jnp.minimum(tiny, HI), HIdot
            )
            # balanced-rate zeroing (solve_rate_cool_g.F:566-572)
            balanced = (
                jnp.minimum(
                    jnp.abs(rs.k["k1"] * de * HI),
                    jnp.abs(rs.k["k2"] * f["HII"] * de),
                ) / jnp.maximum(jnp.abs(dedot), jnp.abs(HIdot))
            ) > 1.0e6
            dedot = jnp.where(balanced, tiny8, dedot)
            HIdot = jnp.where(balanced, tiny8, HIdot)
            # high-iteration damping (solve_rate_cool_g.F:580-583)
            use_prev = it > 50
            dedot = jnp.where(
                use_prev,
                jnp.minimum(jnp.abs(dedot), jnp.abs(carry["dedot_prev"])),
                dedot,
            )
            HIdot = jnp.where(
                use_prev,
                jnp.minimum(jnp.abs(HIdot), jnp.abs(carry["HIdot_prev"])),
                HIdot,
            )
            acc = cfg.subcycle_accuracy
            dtit = jnp.minimum(
                jnp.minimum(
                    jnp.abs(acc * de / dedot),
                    jnp.abs(acc * HI / HIdot),
                ),
                jnp.minimum(dt - ttot, 0.5 * dt),
            )
            if ispecies > 1:
                dtit = _h2_equilibrium_dt(
                    cfg, tables, rs, cool, f, us, dtit, itmask
                )
            # NOTE: the reference's iter>10 anti-ringing clamp
            # (solve_rate_cool_g.F:644-646) compares against a dtit that
            # was just reset to huge at the top of the subcycle, making it
            # a no-op; reproduced by omission.

        # energy timestep (solve_rate_cool_g.F:698-750)
        energy = jnp.maximum(cool.p2d / (cfg.Gamma - 1.0), tiny8)
        edot = jnp.where(
            (cool.tgas <= 1.01 * cfg.TemperatureStart) & (edot < 0.0),
            tiny8,
            edot,
        )
        edot = jnp.where(jnp.abs(edot) < tiny8, tiny8, edot)
        dtit = jnp.minimum(
            jnp.abs(cfg.subcycle_accuracy * energy / edot),
            jnp.minimum(dt - ttot, dtit),
        )

        # energy update (solve_rate_cool_g.F:754-773)
        new_fields = dict(f)
        if cfg.with_radiative_cooling == 1:
            new_fields["energy"] = jnp.where(
                itmask,
                f["energy"] + edot / f["density"] * dtit,
                f["energy"],
            )

        # species update (solve_rate_cool_g.F:780-796)
        dedot_prev = carry["dedot_prev"]
        HIdot_prev = carry["HIdot_prev"]
        if ispecies > 0:
            stepped, dedot_prev_new, HIdot_prev_new = cs.step_rate(
                cfg, rs, new_fields, us, dtit, cool.rhoH
            )
            for name in species_names(cfg):
                new_fields[name] = jnp.where(
                    itmask, stepped[name], new_fields[name]
                )
            dedot_prev = jnp.where(itmask, dedot_prev_new, dedot_prev)
            HIdot_prev = jnp.where(itmask, HIdot_prev_new, HIdot_prev)

        # advance cell clocks and retire finished cells
        # (solve_rate_cool_g.F:803-813)
        ttot_new = jnp.minimum(ttot + jnp.where(itmask, dtit, dt), dt)
        cell_it_new = carry["cell_it"] + itmask.astype(jnp.int32)
        unfinished = jnp.abs(dt - ttot_new) >= tolerance * dt
        hit_cap = cell_it_new >= cfg.max_iterations
        itmask_new = itmask & unfinished & ~hit_cap
        capped_new = carry["capped"] | (itmask & unfinished & hit_cap)

        tgasold_new = jnp.where(itmask, cool.tgasold, carry["tgasold"])
        tdust_new = jnp.where(itmask, cool.tdust, carry["tdust"])

        new_carry = dict(
            # keep only the mutable state keys in the carry; const_f
            # entries merged into new_fields pass through unchanged
            fields={k: new_fields[k] for k in carry["fields"]},
            ttot=ttot_new,
            tgasold=tgasold_new,
            tdust=tdust_new,
            dedot_prev=dedot_prev,
            HIdot_prev=HIdot_prev,
            itmask=itmask_new,
            cell_it=cell_it_new,
            capped=capped_new,
            dtit_prev=jnp.where(itmask, dtit, carry["dtit_prev"]),
        )
        return step + 1, new_carry

    def body(state):
        for _ in range(unroll):
            state = one_iter(state)
        return state

    _, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry0))
    return carry


def finalize_fields(cfg, f, us, imetal: bool, comoving: bool):
    """Post-loop rescale + conservation renormalization
    (solve_rate_cool_g.F:870-888)."""
    # proper -> comoving (solve_rate_cool_g.F:870-878)
    if comoving:
        f = scale_fields(cfg, f, us.aye**3, imetal)
    # conservation renormalization (solve_rate_cool_g.F:884-888)
    if cfg.primordial_chemistry > 0:
        f = cs.make_consistent(cfg, f, imetal)
    return f


def solve_rate_cool(
    cfg,
    tables,
    cloudy_prim,
    cloudy_met,
    pr,
    us,
    f,
    dt,
    imetal: bool,
    cloudy_data_new: bool = True,
    l_h2shield_field=None,
    comoving: bool = False,
) -> SolveResult:
    """Advance the chemistry network and gas energy by dt.

    Mirrors solve_rate_cool_g.F:321-892: comoving scaling, species ceiling,
    masked subcycle loop (cooling-rate eval -> rate lookup -> dt limiter ->
    energy update -> BE Gauss-Seidel species step), rescaling, and final
    conservation renormalization.
    """
    f, itmask0 = prepare_fields(cfg, f, us, imetal, comoving)
    f_state, f_const = split_state(cfg, f)
    carry = init_carry(f_state, itmask0, cfg)
    carry = run_subcycles(
        cfg, tables, cloudy_prim, cloudy_met, pr, us, carry, dt,
        imetal=imetal, cloudy_data_new=cloudy_data_new,
        const_f=f_const, l_h2shield_field=l_h2shield_field,
    )
    out = dict(f_const)
    out.update(carry["fields"])
    if cfg.compensated_sums == 1:
        # fold the carried compensation into the returned energy
        out["energy"] = out["energy"] + carry["energy_lo"]
    fields = finalize_fields(cfg, out, us, imetal, comoving)
    return SolveResult(
        fields=fields,
        n_iterations=jnp.max(carry["cell_it"]),
        converged=~carry["capped"],
        cell_iterations=carry["cell_it"],
    )


def warm_tile_width(batch):
    """Warm-phase tile width (GTPU_WARM_TILE overrides; <=0 = default).

    Default re-measured 2026-08-18 on v5e: 256k tiles amortize the
    fixed ~140us/iteration launch cost over 3x more lanes than the
    batch width while staying under the width where XLA stops fusing
    the two-hot weight builds into the conv operands (sweep: 80k 1.39M
    / 131k 1.40M / 262k 1.42M (x2) / 393k 1.27M / 1M 1.30M cells/s
    flagship).  The max(batch, 256k) floor applies only to this
    default; an explicit GTPU_WARM_TILE override is used verbatim,
    including tiles narrower than the batch (results stay bit-exact
    either way — tiling never changes per-cell arithmetic)."""
    tile_env = os.environ.get("GTPU_WARM_TILE")
    try:
        tile = int(tile_env) if tile_env else 0
    except ValueError as exc:
        raise ValueError(
            f"GTPU_WARM_TILE must be an integer, got {tile_env!r}"
        ) from exc
    if tile <= 0:
        tile = max(batch, 262_144)
    return tile


def solve_rate_cool_compacted(
    cfg,
    tables,
    cloudy_prim,
    cloudy_met,
    pr,
    us,
    f,
    dt,
    imetal: bool,
    cloudy_data_new: bool = True,
    l_h2shield_field=None,
    comoving: bool = False,
    warm: int = 16,
    batch: int = 16384,
) -> SolveResult:
    """solve_rate_cool with converged-cell compaction, all inside one jit.

    The per-cell subcycle count is strongly heavy-tailed (median ~20x
    smaller than the max on log-uniform states), so the monolithic
    while_loop makes every lane ride along until the slowest cell
    converges.  Here the loop runs in two stages:

    1. ``warm`` subcycles on the full array (retires the easy bulk and
       establishes each survivor's subcycle step ``dtit``),
    2. an outer while_loop, each trip gathering the ``batch``
       still-unconverged cells with the LARGEST predicted residual work
       (``(dt - ttot) / dtit``, selected with ``lax.top_k``) and running
       them to convergence before scattering them back.

    Sorting by predicted residual makes each batch's slowest member
    close to its typical member, so little lane work is wasted;
    mispredicted cells simply stay unconverged and are picked up by a
    later trip.  Because all iteration bookkeeping is per-cell, results
    are BIT-IDENTICAL to the monolithic loop regardless of the batch
    composition.  Zero host synchronization (the reference's analogue
    is OpenMP dynamic row scheduling, solve_rate_cool_g.F:369-403).
    """
    f, itmask0 = prepare_fields(cfg, f, us, imetal, comoving)
    f_state, f_const = split_state(cfg, f)
    carry = init_carry(f_state, itmask0, cfg)
    dtype = f["density"].dtype

    # Pack the carry into one (N, C) matrix so each outer trip is ONE
    # row gather and ONE row scatter (per-array gathers inside a
    # while_loop cost ~0.4 ms each on TPU; a single fat one is ~25x
    # cheaper than 25 thin ones).  Round-trip is exact: everything is
    # already the solver dtype, and cell_it (< max_iterations <= 1e4)
    # is exactly representable in f32.
    #
    # The pack is SPLIT: mutable state in M (gathered and scattered
    # every trip), read-only fields in K (gathered only -- density,
    # metal, dust, velocities, RT/heating arrays and the shielding
    # length are never written by the loop, so scattering them back
    # would be pure HBM traffic).
    state_keys = sorted(carry["fields"].keys())
    const_keys = sorted(f_const.keys())
    aux_keys = ["ttot", "tgasold", "tdust", "dedot_prev", "HIdot_prev",
                "dtit_prev"]
    if cfg.compensated_sums == 1:
        aux_keys += ["energy_lo", "ttot_lo"]
    has_l_h2 = l_h2shield_field is not None
    ttot_col = len(state_keys) + aux_keys.index("ttot")
    dtit_col = len(state_keys) + aux_keys.index("dtit_prev")
    mask_col = len(state_keys) + len(aux_keys) + 1  # after cell_it

    def pack(c):
        cols = [c["fields"][k] for k in state_keys]
        cols += [c[a] for a in aux_keys]
        cols.append(c["cell_it"].astype(dtype))
        cols.append(c["itmask"].astype(dtype))
        cols.append(c["capped"].astype(dtype))
        return jnp.stack(cols, axis=1)

    def unpack(m):
        i = len(state_keys)
        c = dict(
            fields={k: m[:, j] for j, k in enumerate(state_keys)},
            **{a: m[:, i + j] for j, a in enumerate(aux_keys)},
        )
        i += len(aux_keys)
        c["cell_it"] = m[:, i].astype(jnp.int32)
        c["itmask"] = m[:, i + 1] > 0
        c["capped"] = m[:, i + 2] > 0
        return c

    const_cols = [f_const[k] for k in const_keys]
    if has_l_h2:
        const_cols.append(l_h2shield_field)
    K = jnp.stack(const_cols, axis=1)

    def run(c, n_steps, km):
        consts = {k: km[:, j] for j, k in enumerate(const_keys)}
        l_h2 = km[:, len(const_keys)] if has_l_h2 else None
        return run_subcycles(
            cfg, tables, cloudy_prim, cloudy_met, pr, us, c, dt,
            imetal=imetal, cloudy_data_new=cloudy_data_new,
            chunk=n_steps, const_f=consts, l_h2shield_field=l_h2,
        )

    # --- warm phase, tiled ---------------------------------------------
    # Full-width (e.g. 1M-cell) subcycle iterations measure ~1.5x the
    # per-cell cost of narrow-tile ones (XLA stops fusing the two-hot
    # weight builds into the conv operands at large widths), so the
    # warm phase runs over contiguous fixed-width tiles instead of
    # the whole array.  The tile width defaults to the batch size but
    # has a different trade-off (per-cell iteration cost only — no
    # straggler lane waste, no gather/scatter amortization), so
    # GTPU_WARM_TILE decouples it.  Tiling is exact for the same reason
    # compaction is: all bookkeeping is per-cell.  The final tile is
    # clamped to [n - tile, n): its overlap re-runs cells already
    # processed, and extra subcycles on retired lanes are masked no-ops,
    # while still-active overlap cells just advance earlier -- the
    # per-cell subcycle sequence is unchanged either way.
    tile = warm_tile_width(batch)
    n = f["density"].shape[0]
    M = pack(carry)
    if warm > 0:
        if n <= tile:
            M = pack(run(unpack(M), warm, K))
        else:
            n_tiles = -(-n // tile)

            def warm_tile(i, M):
                start = jnp.minimum(i * tile, n - tile)
                sub = jax.lax.dynamic_slice_in_dim(M, start, tile, 0)
                subk = jax.lax.dynamic_slice_in_dim(K, start, tile, 0)
                sub = pack(run(unpack(sub), warm, subk))
                return jax.lax.dynamic_update_slice_in_dim(
                    M, sub, start, 0
                )

            M = jax.lax.fori_loop(0, n_tiles, warm_tile, M)

    # Each outer trip runs its batch for at most `chunk` subcycles
    # before returning survivors to the pool for re-sorting: a
    # mispredicted straggler then rejoins a batch of peers instead of
    # holding `batch - 1` near-idle lanes to its own convergence.
    # chunk = max_iterations (the default) disables re-chunking.
    chunk_env = os.environ.get("GTPU_COMPACT_CHUNK")
    try:
        chunk = int(chunk_env) if chunk_env else 0
    except ValueError as exc:
        raise ValueError(
            f"GTPU_COMPACT_CHUNK must be an integer, got {chunk_env!r}"
        ) from exc
    if chunk <= 0:  # 0 = off, matching the other GTPU_* knobs
        chunk = cfg.max_iterations

    def outer_cond(M):
        return jnp.any(M[:, mask_col] > 0)

    def outer_body(M):
        # Select the `batch` unconverged cells with the most predicted
        # residual subcycles.  Selection composition never affects
        # per-cell results, only lane utilization; converged padding
        # rows land on masked lanes and are no-ops.  (top_k lowers to
        # an efficient TPU sort, while jnp.nonzero's cumsum blows the
        # scoped-VMEM stack inside a while_loop.)
        residual = (dt - M[:, ttot_col]) / jnp.maximum(
            M[:, dtit_col], jnp.asarray(tiny, dtype)
        )
        key = jnp.where(M[:, mask_col] > 0, residual, -1.0)
        _, idx = jax.lax.top_k(key, batch)
        # top_k orders indices by key, which makes the row scatter's DMA
        # pattern random: measured 6.2 ms per trip on v5e at (1M, 26).
        # Batch composition never affects per-cell results, so sort the
        # index set ascending and tell XLA the rows are unique and
        # ordered -- the scatter then lowers to an in-order pass.
        idx = jnp.sort(idx)
        sub = run(
            unpack(M.at[idx].get(unique_indices=True,
                                 indices_are_sorted=True)),
            chunk,
            K.at[idx].get(unique_indices=True, indices_are_sorted=True),
        )
        return M.at[idx].set(pack(sub), unique_indices=True,
                             indices_are_sorted=True)

    M = jax.lax.while_loop(outer_cond, outer_body, M)
    carry = unpack(M)
    out = dict(f_const)
    out.update(carry["fields"])
    if cfg.compensated_sums == 1:
        # fold the carried compensation into the returned energy
        out["energy"] = out["energy"] + carry["energy_lo"]
    fields = finalize_fields(cfg, out, us, imetal, comoving)
    return SolveResult(
        fields=fields,
        n_iterations=jnp.max(carry["cell_it"]),
        converged=~carry["capped"],
        cell_iterations=carry["cell_it"],
    )
