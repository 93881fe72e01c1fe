"""Pure-functional entry points: embed grackle_tpu in YOUR jit.

The reference is a C library a hydro code calls once per timestep
(grackle: src/clib/solve_chemistry.c:91-370); each call is a host-side
boundary.  A JAX host code should not pay that boundary: chemistry can
compile INTO the caller's own ``jit``/``lax.scan``/``shard_map`` step so
XLA fuses it with the hydro update and no host round-trip happens at
all.  These factories return closures that are pure functions of
(fields, dt): no host work, no Python side effects, safe to trace.

    import grackle_tpu.functional as gfn
    solve = gfn.make_solve_fn(chem)          # chem: initialized ChemistryData
    temperature = gfn.make_temperature_fn(chem)

    @jax.jit                                  # or pjit / shard_map / scan
    def hydro_step(state, dt):
        fields, diag = solve(state.fields, dt)
        ...

What is frozen at build time (host-side, like the reference's per-call C
work, update_UVbackground_rates.c:25-289): the parameter set, the rate
tables, the unit system, and the redshift-dependent UV-background photo
rates.  For cosmological runs rebuild the closure when ``a_value``
changes (cheap: pure host float arithmetic + table interpolation); for
constant-a runs nothing ever needs rebuilding.  This mirrors the
documented host-f64 contract of the stateful API (api.py:363-370) — unit
arithmetic stays in true host doubles, clear of the TPU's range-limited
f64 emulation.

Differences from the stateful API (``ChemistryData.solve_chemistry``):

- ``exit_after_iterations_exceeded`` cannot raise from inside a trace;
  inspect ``diag["converged"]`` instead.
- Field arrays must already be flat ``[N]`` (ravel grids yourself; ghost
  -zone slicing is a host-side concern).
- H2_self_shielding option 1 (the 3-D density stencil) takes the
  precomputed per-cell length via the ``l_h2shield`` argument —
  compute it with ``grackle_tpu.api.sobolev_shield_length`` on the full
  grid, or inside your own jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from .api import (
    GrackleContext,
    _compact_batch,
    _photo_rates,
    solve_path,
)
from .ops import derived as _derived
from .ops import solver as _solver
from .ops.common import make_unit_scalars, solver_dtype

__all__ = [
    "make_solve_fn",
    "make_cooling_time_fn",
    "make_temperature_fn",
    "make_pressure_fn",
    "make_gamma_fn",
    "make_dust_temperature_fn",
]


def _resolve_ctx(chem) -> GrackleContext:
    if isinstance(chem, GrackleContext):
        return chem
    ctx = getattr(chem, "context", None)
    if ctx is None:
        raise ValueError(
            "make_*_fn expects an initialized ChemistryData (call "
            ".initialize() first) or a GrackleContext"
        )
    return ctx


def _prep(f, dtype):
    clean = {k: jnp.asarray(v, dtype) for k, v in f.items()
             if v is not None}
    return clean, "metal" in clean


def make_solve_fn(chem, grid_dx: float = 0.0):
    """Build ``solve(fields, dt, l_h2shield=None) -> (fields, diag)``.

    Pure and trace-safe; path selection (exact-integration cooling /
    converged-cell compaction / monolithic subcycling) matches the
    stateful API (api.solve_chemistry:371-390), so results are identical
    to ``ChemistryData.solve_chemistry`` for the same context.
    """
    ctx = _resolve_ctx(chem)
    cfg = ctx.config
    us = make_unit_scalars(cfg, ctx.tables, ctx.units, grid_dx)
    pr = _photo_rates(cfg, ctx.tables, ctx.uvb, ctx.units)
    comoving = bool(ctx.units.comoving_coordinates)
    dtype = solver_dtype(cfg)

    def solve(fields, dt, l_h2shield=None):
        f, imetal = _prep(fields, dtype)
        dt = jnp.asarray(dt, dtype)
        if cfg.H2_self_shielding == 1 and l_h2shield is None:
            # same misuse the stateful path rejects (api.py:341-351);
            # raising here (at trace time) beats a TypeError deep in
            # lookup_cool_rates
            raise ValueError(
                "H2_self_shielding option 1 requires the precomputed "
                "per-cell shielding length: solve(fields, dt, "
                "l_h2shield=...) — see api.sobolev_shield_length"
            )
        l_h2 = (None if l_h2shield is None
                else jnp.asarray(l_h2shield, dtype).reshape(-1))
        n = f["density"].shape[0]
        path = solve_path(cfg, n)
        if path == "exact":
            from .ops import exact_cool as _exact

            fe = dict(f)
            if comoving:
                fe = _solver.scale_fields(cfg, fe, us.aye**-3, imetal)
            out = dict(f)
            out["energy"] = _exact.exact_cool_step(
                cfg, ctx.cloudy_primordial, ctx.cloudy_metal, pr, us,
                fe, dt, imetal,
            )
            diag = {
                "n_iterations": jnp.int32(1),
                "converged": jnp.ones((n,), dtype=bool),
                "cell_iterations": jnp.ones((n,), dtype=jnp.int32),
            }
            return out, diag
        if path == "compact":
            result = _solver.solve_rate_cool_compacted(
                cfg, ctx.tables, ctx.cloudy_primordial, ctx.cloudy_metal,
                pr, us, f, dt, imetal=imetal,
                cloudy_data_new=ctx.cloudy_data_new,
                l_h2shield_field=l_h2, comoving=comoving,
                warm=int(cfg.solver_compaction), batch=_compact_batch(n),
            )
        else:
            result = _solver.solve_rate_cool(
                cfg, ctx.tables, ctx.cloudy_primordial, ctx.cloudy_metal,
                pr, us, f, dt, imetal=imetal,
                cloudy_data_new=ctx.cloudy_data_new,
                l_h2shield_field=l_h2, comoving=comoving,
            )
        diag = {
            "n_iterations": result.n_iterations,
            "converged": result.converged,
            "cell_iterations": result.cell_iterations,
        }
        return result.fields, diag

    return solve


def make_cooling_time_fn(chem):
    """Build ``cooling_time(fields) -> [N]`` (calculate_cooling_time.c)."""
    ctx = _resolve_ctx(chem)
    cfg = ctx.config
    us = make_unit_scalars(cfg, ctx.tables, ctx.units)
    pr = _photo_rates(cfg, ctx.tables, ctx.uvb, ctx.units)
    comoving = bool(ctx.units.comoving_coordinates)
    dtype = solver_dtype(cfg)

    def cooling_time(fields):
        f, imetal = _prep(fields, dtype)
        return _derived.calculate_cooling_time(
            cfg, ctx.tables, ctx.cloudy_primordial, ctx.cloudy_metal,
            pr, us, f, imetal=imetal,
            cloudy_data_new=ctx.cloudy_data_new, comoving=comoving,
        )

    return cooling_time


def make_temperature_fn(chem):
    """Build ``temperature(fields) -> [N]`` (calculate_temperature.c)."""
    ctx = _resolve_ctx(chem)
    cfg = ctx.config
    us = make_unit_scalars(cfg, ctx.tables, ctx.units)
    dtype = solver_dtype(cfg)

    def temperature(fields):
        f, imetal = _prep(fields, dtype)
        return _derived.calculate_temperature(
            cfg, ctx.cloudy_primordial, us, f, imetal
        )

    return temperature


def make_pressure_fn(chem):
    """Build ``pressure(fields) -> [N]`` (calculate_pressure.c)."""
    ctx = _resolve_ctx(chem)
    cfg = ctx.config
    us = make_unit_scalars(cfg, ctx.tables, ctx.units)
    dtype = solver_dtype(cfg)

    def pressure(fields):
        f, imetal = _prep(fields, dtype)
        return _derived.calculate_pressure(cfg, us, f, imetal)

    return pressure


def make_gamma_fn(chem):
    """Build ``gamma(fields) -> [N]`` (calculate_gamma.c)."""
    ctx = _resolve_ctx(chem)
    cfg = ctx.config
    us = make_unit_scalars(cfg, ctx.tables, ctx.units)
    dtype = solver_dtype(cfg)

    def gamma(fields):
        f, imetal = _prep(fields, dtype)
        return _derived.calculate_gamma(
            cfg, ctx.cloudy_primordial, us, f, imetal
        )

    return gamma


def make_dust_temperature_fn(chem):
    """Build ``dust_temperature(fields) -> [N]``
    (calculate_dust_temperature.c)."""
    ctx = _resolve_ctx(chem)
    cfg = ctx.config
    us = make_unit_scalars(cfg, ctx.tables, ctx.units)
    dtype = solver_dtype(cfg)

    def dust_temperature(fields):
        f, imetal = _prep(fields, dtype)
        return _derived.calculate_dust_temperature(
            cfg, ctx.tables, ctx.cloudy_primordial, us, f, ctx.units,
            imetal
        )

    return dust_temperature
