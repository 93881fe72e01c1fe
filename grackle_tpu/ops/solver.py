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
from typing import Any

import jax
import jax.numpy as jnp

from ..constants import tiny
from . import chemistry_step as cs
from .common import dtype_huge8, dtype_tiny8, dtype_tolerance
from .cooling import cool1d_multi

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


def _h2_equilibrium_dt(cfg, tables, rs, cool, f, us, dtit):
    """High-density H2 equilibrium timestep limiter
    (solve_rate_cool_g.F:592-643): at rho > 1e8 mh with heating, limit dt
    so the k13/k22 equilibrium H abundance changes by <= 10%."""
    fh = cfg.HydrogenFractionByMass
    d = f["density"]
    dlogtem = (
        jnp.log(cfg.TemperatureEnd) - jnp.log(cfg.TemperatureStart)
    ) / (cfg.NumberOfTemperatureBins - 1)
    ti = rs.ti
    k13a, k22a = tables.k13, tables.k22
    fused = cfg.use_fused_lookup == 1
    if fused:
        from .lookup import twohot_weights

        pair = jnp.stack([k13a, k22a], axis=1)  # (n_bins, 2)

    def heq_at(eqt):
        eqtdef = (eqt - ti.t1) / (ti.t2 - ti.t1)
        if fused:
            w = twohot_weights(ti.idx, eqtdef, pair.shape[0], pair.dtype)
            vals = jax.lax.dot_general(
                w, pair, dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=pair.dtype,
            )
            k13_i, k22_i = vals[:, 0], vals[:, 1]
        else:
            k22_i = k22a[ti.idx] \
                + (k22a[ti.idx + 1] - k22a[ti.idx]) * eqtdef
            k13_i = k13a[ti.idx] \
                + (k13a[ti.idx + 1] - k13a[ti.idx]) * eqtdef
        return (-1.0 / (4.0 * k22_i)) * (
            k13_i - jnp.sqrt(8.0 * k13_i * k22_i * fh * d + k13_i**2)
        )

    tgas = cool.tgas
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
    limit = 0.1 * heq / dheq
    apply = (d * us.dom > 1.0e8) & (cool.edot > 0.0)
    return jnp.where(apply, jnp.minimum(dtit, limit), dtit)


@dataclasses.dataclass(frozen=True)
class SolveResult:
    fields: Any
    n_iterations: Any  # scalar int: subcycles taken
    converged: Any  # [N] bool: cells that reached dt within max_iterations


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
    ispecies = cfg.primordial_chemistry
    d_shape = f["density"].shape
    dtype = f["density"].dtype
    tiny8 = dtype_tiny8(dtype)
    huge8 = dtype_huge8(dtype)
    tolerance = dtype_tolerance(dtype)

    f = dict(f)

    # comoving -> proper (solve_rate_cool_g.F:347-355)
    if comoving:
        f = scale_fields(cfg, f, us.aye**-3, imetal)

    f = ceiling_species(cfg, f, imetal)

    itmask0 = jnp.ones(d_shape, dtype=bool)
    # coupled radiative-transfer intermediate stepping masks
    # (solve_rate_cool_g.F:418-439)
    if (cfg.use_radiative_transfer == 1
            and cfg.radiative_transfer_coupled_rate_solver == 1):
        has_rad = f["RT_HI_ionization_rate"] > 0
        if cfg.radiative_transfer_intermediate_step == 1:
            itmask0 = has_rad
        else:
            itmask0 = ~has_rad

    zeros = jnp.zeros(d_shape, dtype=f["density"].dtype)

    carry0 = dict(
        fields=f,
        ttot=zeros,
        tgasold=zeros,
        tdust=zeros,  # warm start for the dust equilibrium solve
        dedot_prev=zeros,
        HIdot_prev=zeros,
        itmask=itmask0,
        it=jnp.int32(0),
    )

    def cond(carry):
        return (carry["it"] < cfg.max_iterations) & jnp.any(
            carry["itmask"]
        )

    def body(carry):
        f = carry["fields"]
        itmask = carry["itmask"]
        ttot = carry["ttot"]
        it = carry["it"]
        first_iter = it == 0

        cool = cool1d_multi(
            cfg, tables, cloudy_prim, cloudy_met, pr, us, f,
            carry["tgasold"], first_iter, imetal, cloudy_data_new,
            tdust_prev=carry["tdust"],
        )
        edot = cool.edot
        dtit = jnp.full(d_shape, huge8, dtype=edot.dtype)

        if ispecies > 0:
            rs = cs.lookup_cool_rates(
                cfg, tables, pr, us, f, cool.tgas, cool.mmw, cool.tdust,
                cool.dust2gas, l_h2shield_field, imetal,
            )
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
            dtit = jnp.minimum(
                jnp.minimum(
                    jnp.abs(0.1 * de / dedot),
                    jnp.abs(0.1 * HI / HIdot),
                ),
                jnp.minimum(dt - ttot, 0.5 * dt),
            )
            if ispecies > 1:
                dtit = _h2_equilibrium_dt(
                    cfg, tables, rs, cool, f, us, dtit
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
            jnp.abs(0.1 * energy / edot), jnp.minimum(dt - ttot, dtit)
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
        itmask_new = itmask & (jnp.abs(dt - ttot_new) >= tolerance * dt)

        tgasold_new = jnp.where(itmask, cool.tgasold, carry["tgasold"])
        tdust_new = jnp.where(itmask, cool.tdust, carry["tdust"])

        return dict(
            fields=new_fields,
            ttot=ttot_new,
            tgasold=tgasold_new,
            tdust=tdust_new,
            dedot_prev=dedot_prev,
            HIdot_prev=HIdot_prev,
            itmask=itmask_new,
            it=it + 1,
        )

    carry = jax.lax.while_loop(cond, body, carry0)
    f = carry["fields"]

    # proper -> comoving (solve_rate_cool_g.F:870-878)
    if comoving:
        f = scale_fields(cfg, f, us.aye**3, imetal)

    # conservation renormalization (solve_rate_cool_g.F:884-888)
    if ispecies > 0:
        f = cs.make_consistent(cfg, f, imetal)

    return SolveResult(
        fields=f,
        n_iterations=carry["it"],
        converged=~carry["itmask"],
    )
