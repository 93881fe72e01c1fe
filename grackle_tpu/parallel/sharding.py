"""Multi-chip cell sharding.

The reference has no distributed backend: host MPI ranks each call the
re-entrant ``local_*`` API on their own subgrid, and OpenMP threads split
grid rows (grackle: src/clib/initialize_chemistry_data.c:107-120,
solve_rate_cool_g.F:369-403).  The TPU-native equivalent shards the flat
cell axis across a ``jax.sharding.Mesh`` and runs the solver under
``shard_map``: cells are fully independent (embarrassingly parallel), rate
tables are replicated in every chip's HBM, and — crucially — each device
runs its own subcycle ``while_loop``, so a shard whose cells converge early
retires with zero cross-chip synchronization.  This is strictly stronger
than the reference's row-granular early exit.

The only spatially-coupled computation (H2 self-shielding option 1's
6-point density stencil, solve_rate_cool_g.F:1420-1434) is precomputed on
the unsharded grid before the solve, so the solve itself needs no halo
exchange.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import solver as _solver
from ..ops.common import make_unit_scalars

CELL_AXIS = "cells"


def make_cell_mesh(devices=None, axis_name: str = CELL_AXIS) -> Mesh:
    """1-D device mesh over the flat cell axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def pad_to_multiple(fields, multiple: int):
    """Pad every field to a multiple of the device count so the cell axis
    shards evenly; returns (padded_fields, original_n).

    Padding cells are benign copies of cell 0, so the solver's masked
    while_loop treats them like real cells and they are sliced away on
    return.
    """
    n = None
    out = {}
    for key, val in fields.items():
        n = val.shape[0]
        pad = (-n) % multiple
        if pad:
            out[key] = jnp.concatenate(
                [val, jnp.broadcast_to(val[:1], (pad,) + val.shape[1:])]
            )
        else:
            out[key] = val
    return out, n


def shard_fields(fields, mesh: Mesh, axis_name: str = CELL_AXIS):
    """Place field arrays with a NamedSharding over the cell axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return {k: jax.device_put(v, sharding) for k, v in fields.items()}


def solve_chemistry_sharded(
    ctx, fields, dt, mesh: Mesh, axis_name: str = CELL_AXIS,
    grid_dx: float = 0.0, l_h2shield_field=None,
):
    """Sharded solve_chemistry: per-shard independent subcycling.

    fields: dict of flat [N] arrays; N is padded to the mesh size
    automatically.  Returns (new_fields, diagnostics) with the original N.
    """
    cfg = ctx.config
    tables = ctx.tables
    imetal = "metal" in fields

    from ..ops.common import solver_dtype

    dtype = solver_dtype(cfg)
    f = {k: jnp.asarray(v, dtype=dtype)
         for k, v in fields.items() if v is not None}
    n_dev = mesh.shape[axis_name]
    f, n_orig = pad_to_multiple(f, n_dev)
    if l_h2shield_field is not None:
        pad = (-n_orig) % n_dev
        if pad:
            l_h2shield_field = jnp.concatenate(
                [l_h2shield_field,
                 jnp.broadcast_to(l_h2shield_field[:1], (pad,))]
            )
    f = shard_fields(f, mesh, axis_name)

    from ..api import _photo_rates

    spec = P(axis_name)
    rep = P()

    field_specs = {k: spec for k in f}

    @partial(jax.jit, static_argnames=())
    def run(f, dt, l_h2):
        us = make_unit_scalars(cfg, tables, ctx.units, grid_dx)
        pr = _photo_rates(cfg, tables, ctx.uvb, ctx.units)

        def local_solve(f_local, l_h2_local):
            # converged-cell compaction composes with shard_map: the
            # whole batched loop is ordinary traced code, so each shard
            # compacts its own survivors independently with zero
            # cross-chip communication (see api.solve_chemistry and
            # ops/solver.py:solve_rate_cool_compacted)
            n_local = f_local["density"].shape[0]
            from ..api import _compact_batch, solve_path

            path = solve_path(cfg, n_local)
            if path == "exact":
                # exact-integration tabulated cooling is pointwise, so
                # it shards trivially (ops/exact_cool.py)
                from ..ops import exact_cool as _exact

                fe = dict(f_local)
                if bool(ctx.units.comoving_coordinates):
                    fe = _solver.scale_fields(
                        cfg, fe, us.aye**-3, imetal
                    )
                out = dict(f_local)
                out["energy"] = _exact.exact_cool_step(
                    cfg, ctx.cloudy_primordial, ctx.cloudy_metal, pr,
                    us, fe, dt, imetal,
                )
                return (out, jnp.ones((1,), dtype=jnp.int32),
                        jnp.ones((n_local,), dtype=bool))
            if path == "compact":
                result = _solver.solve_rate_cool_compacted(
                    cfg, tables, ctx.cloudy_primordial, ctx.cloudy_metal,
                    pr, us, f_local, dt,
                    imetal=imetal, cloudy_data_new=ctx.cloudy_data_new,
                    l_h2shield_field=l_h2_local,
                    comoving=bool(ctx.units.comoving_coordinates),
                    warm=int(cfg.solver_compaction),
                    batch=_compact_batch(n_local),
                )
            else:
                result = _solver.solve_rate_cool(
                    cfg, tables, ctx.cloudy_primordial, ctx.cloudy_metal,
                    pr, us, f_local, dt,
                    imetal=imetal, cloudy_data_new=ctx.cloudy_data_new,
                    l_h2shield_field=l_h2_local,
                    comoving=bool(ctx.units.comoving_coordinates),
                )
            # per-shard iteration count, shaped [1] so it gathers to
            # [n_devices]
            return (result.fields, result.n_iterations[None],
                    result.converged)

        l_spec = spec if l_h2 is not None else None
        in_specs = (field_specs, l_spec)
        out_specs = (field_specs, spec, spec)
        return jax.shard_map(
            local_solve, mesh=mesh, in_specs=in_specs,
            out_specs=out_specs, check_vma=False,
        )(f, l_h2)

    new_f, n_iter, converged = run(
        f, jnp.asarray(dt, dtype), l_h2shield_field)
    new_f = {k: v[:n_orig] for k, v in new_f.items()}
    diagnostics = {
        # per-shard subcycle counts, shape [n_devices]
        "n_iterations": n_iter,
        "converged": converged[:n_orig],
    }
    return new_f, diagnostics
