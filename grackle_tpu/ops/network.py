"""The subcycle body's elementwise network region.

This is the code between the table lookups and the loop bookkeeping of
one subcycle iteration (grackle: src/clib/solve_rate_cool_g.F:554-813):
the dedot/HIdot rate sums, the chemistry timestep limiter, the energy
timestep + energy update, the BE Gauss-Seidel species sweep, and the
per-cell clock/retirement updates.  It is PURELY elementwise — no
lookups, no reductions, no transcendentals — which is what lets the
same source run in two ways:

* inside the XLA while_loop body (used when compensated_sums=1 needs
  the Neumaier carry pairs), or
* inside a single Pallas VPU kernel (ops/network_kernel.py, opt-in via
  GTPU_NETWORK_KERNEL=1), collapsing the ~20 separate XLA fusion
  launches this region otherwise compiles to.

The DEFAULT solve path does NOT come through here: ops/solver.py keeps
an inline copy of this region in its loop body, because extracting it
measured ~7% slower on the flagship (the extraction perturbed XLA's
fusion choices; docs/Performance.md "network-kernel post-mortem").
``tests/test_network_kernel.py`` pins the inline copy and this module
to identical solves, so the duplication cannot drift.

Everything here must stay shape-agnostic (operate on arrays of ANY
shape, not just [N]) and free of ops Mosaic cannot lower (bool loop
carries, gathers, data-dependent control flow).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..constants import tiny
from . import chemistry_step as cs
from .common import dtype_huge8, dtype_tiny8, dtype_tolerance

def _two_sum(hi, lo, x):
    """(hi + lo) + x as a renormalized f32 pair (Neumaier two-sum).

    The branch picks the error term formulation valid for the larger
    operand; the trailing renormalization keeps hi the correctly-rounded
    total so consumers that read only the hi word see the best f32
    value.  Idempotent on a renormalized pair with x = 0 (masked lanes
    stay bit-frozen).  Relies on IEEE adds, which neither XLA nor Mosaic
    reassociates."""
    s = hi + x
    err = jnp.where(
        jnp.abs(hi) >= jnp.abs(x), (hi - s) + x, (x - s) + hi
    )
    lo = lo + err
    hi2 = s + lo
    lo2 = lo - (hi2 - s)
    return hi2, lo2


#: f-dict keys the network region reads (the kernel ships only these).
def network_field_keys(cfg):
    from .solver import species_names

    keys = ["density", "energy"] + species_names(cfg)
    if cfg.use_radiative_transfer == 1:
        keys.append("RT_HI_ionization_rate")
        if cfg.radiative_transfer_hydrogen_only == 0:
            keys += ["RT_HeI_ionization_rate", "RT_HeII_ionization_rate"]
    return keys


def network_update(
    cfg,
    us,
    dt,
    f,
    rs,
    cool_v,
    carry_v,
    h2_limit,
) -> Any:
    """One subcycle's elementwise update (solve_rate_cool_g.F:554-813).

    Parameters
    ----------
    us : object with ``dom`` and ``chunit`` scalar attributes (the only
        UnitScalars fields this region consumes).
    dt : full-step timestep (scalar).
    f : field dict restricted to :func:`network_field_keys`.
    rs : RateState from lookup_cool_rates (None when
        primordial_chemistry == 0); only ``k``/``shields``/``h2dust``
        are read.
    cool_v : dict with ``edot``, ``tgas``, ``p2d``, ``rhoH``,
        ``tgasold``, ``tdust`` from cool1d_multi.
    carry_v : dict with ``ttot``, ``tgasold``, ``tdust``,
        ``dedot_prev``, ``HIdot_prev``, ``itmask`` (bool),
        ``cell_it`` (int32), ``capped`` (bool), ``dtit_prev``.
    h2_limit : high-density H2-equilibrium dt limit array
        (+huge where inactive; None when primordial_chemistry <= 1).

    Returns the new carry dict (same keys as ``carry_v`` plus
    ``fields`` holding the updated species + energy).
    """
    from .solver import species_names

    ispecies = cfg.primordial_chemistry
    dtype = f["density"].dtype
    tiny8 = dtype_tiny8(dtype)
    huge8 = dtype_huge8(dtype)
    tolerance = dtype_tolerance(dtype)

    compensated = cfg.compensated_sums == 1
    itmask = carry_v["itmask"]
    ttot = carry_v["ttot"]
    it = carry_v["cell_it"]
    edot = cool_v["edot"]
    dtit = jnp.full_like(edot, huge8)
    # Compensated mode: the true accumulated clock is ttot + ttot_lo;
    # every `dt - ttot` residual uses the compensated value so the
    # subcycle partition sums to dt without f32 drift.
    if compensated:
        t_resid = (dt - ttot) - carry_v["ttot_lo"]
    else:
        t_resid = dt - ttot

    if ispecies > 0:
        dedot, HIdot, edot = cs.rate_timestep(
            cfg, rs, f, us, edot, cool_v["rhoH"]
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
            jnp.minimum(jnp.abs(dedot), jnp.abs(carry_v["dedot_prev"])),
            dedot,
        )
        HIdot = jnp.where(
            use_prev,
            jnp.minimum(jnp.abs(HIdot), jnp.abs(carry_v["HIdot_prev"])),
            HIdot,
        )
        acc = cfg.subcycle_accuracy
        dtit = jnp.minimum(
            jnp.minimum(
                jnp.abs(acc * de / dedot),
                jnp.abs(acc * HI / HIdot),
            ),
            jnp.minimum(t_resid, 0.5 * dt),
        )
        if ispecies > 1:
            # high-density H2-equilibrium limit, evaluated outside this
            # region (it needs a table fetch); +huge where inactive, so
            # the min reproduces the former where(apply, min, dtit)
            # bit-exactly (dtit <= 0.5*dt < huge here).
            dtit = jnp.minimum(dtit, h2_limit)
        # NOTE: the reference's iter>10 anti-ringing clamp
        # (solve_rate_cool_g.F:644-646) compares against a dtit that
        # was just reset to huge at the top of the subcycle, making it
        # a no-op; reproduced by omission.

    # energy timestep (solve_rate_cool_g.F:698-750)
    energy = jnp.maximum(cool_v["p2d"] / (cfg.Gamma - 1.0), tiny8)
    edot = jnp.where(
        (cool_v["tgas"] <= 1.01 * cfg.TemperatureStart) & (edot < 0.0),
        tiny8,
        edot,
    )
    edot = jnp.where(jnp.abs(edot) < tiny8, tiny8, edot)
    dtit = jnp.minimum(
        jnp.abs(cfg.subcycle_accuracy * energy / edot),
        jnp.minimum(t_resid, dtit),
    )

    # energy update (solve_rate_cool_g.F:754-773); in compensated mode
    # the increment goes through a Neumaier two-sum against the carried
    # low part, eliminating f32 summation drift over the subcycle
    # sequence (the stored hi word is what the rest of the iteration
    # reads -- identical access pattern either way).
    new_fields = dict(f)
    energy_lo = carry_v.get("energy_lo") if compensated else None
    if cfg.with_radiative_cooling == 1:
        if compensated:
            incr = jnp.where(itmask, edot / f["density"] * dtit, 0.0)
            e_hi, e_lo = _two_sum(f["energy"], energy_lo, incr)
            new_fields["energy"] = e_hi
            energy_lo = e_lo
        else:
            new_fields["energy"] = jnp.where(
                itmask,
                f["energy"] + edot / f["density"] * dtit,
                f["energy"],
            )

    # species update (solve_rate_cool_g.F:780-796)
    dedot_prev = carry_v["dedot_prev"]
    HIdot_prev = carry_v["HIdot_prev"]
    if ispecies > 0:
        stepped, dedot_prev_new, HIdot_prev_new = cs.step_rate(
            cfg, rs, new_fields, us, dtit, cool_v["rhoH"]
        )
        for name in species_names(cfg):
            new_fields[name] = jnp.where(
                itmask, stepped[name], new_fields[name]
            )
        dedot_prev = jnp.where(itmask, dedot_prev_new, dedot_prev)
        HIdot_prev = jnp.where(itmask, HIdot_prev_new, HIdot_prev)

    # advance cell clocks and retire finished cells
    # (solve_rate_cool_g.F:803-813)
    if compensated:
        step_t = jnp.where(itmask, dtit, dt)
        t_hi, t_lo = _two_sum(ttot, carry_v["ttot_lo"], step_t)
        # the min(..., dt) clamp: once the compensated clock reaches dt
        # the pair snaps to (dt, 0) exactly, like the uncompensated min
        done = (t_hi + t_lo) >= dt
        ttot_new = jnp.where(done, dt, t_hi)
        ttot_lo_new = jnp.where(done, 0.0, t_lo)
        unfinished = jnp.abs((dt - ttot_new) - ttot_lo_new) \
            >= tolerance * dt
    else:
        ttot_new = jnp.minimum(ttot + jnp.where(itmask, dtit, dt), dt)
        unfinished = jnp.abs(dt - ttot_new) >= tolerance * dt
    cell_it_new = carry_v["cell_it"] + itmask.astype(jnp.int32)
    hit_cap = cell_it_new >= cfg.max_iterations
    itmask_new = itmask & unfinished & ~hit_cap
    capped_new = carry_v["capped"] | (itmask & unfinished & hit_cap)

    tgasold_new = jnp.where(itmask, cool_v["tgasold"], carry_v["tgasold"])
    tdust_new = jnp.where(itmask, cool_v["tdust"], carry_v["tdust"])

    state_keys = ["energy"] + species_names(cfg)
    comp_out = {}
    if compensated:
        comp_out = dict(energy_lo=energy_lo, ttot_lo=ttot_lo_new)
    return dict(
        **comp_out,
        fields={k: new_fields[k] for k in state_keys},
        ttot=ttot_new,
        tgasold=tgasold_new,
        tdust=tdust_new,
        dedot_prev=dedot_prev,
        HIdot_prev=HIdot_prev,
        itmask=itmask_new,
        cell_it=cell_it_new,
        capped=capped_new,
        dtit_prev=jnp.where(itmask, dtit, carry_v["dtit_prev"]),
    )
