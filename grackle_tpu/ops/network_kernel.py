"""Single-launch Pallas kernel for the subcycle network region.

Motivation (docs/Performance.md, "Remaining headroom"): each subcycle
iteration of the XLA while_loop issues ~36 fusion launches with a fixed
~140 us total dispatch cost — ~40% of a batched iteration at the tuned
80k width.  About 20 of those launches are the purely elementwise
network region (rate sums -> dt limiter -> energy update -> BE
Gauss-Seidel sweep -> clock bookkeeping, solve_rate_cool_g.F:554-813).
This module runs that region as ONE ``pl.pallas_call``.

Design rules (and why):

* The kernel body calls the SAME :func:`..ops.network.network_update`
  source that the plain XLA path uses — the physics exists once; the
  kernel is only a launcher.  Mosaic lowers the identical jnp ops, so
  the two paths agree to float-op scheduling (each op is IEEE f32; only
  fusion/reassociation differences apply, and network_update contains
  no reductions to reassociate).
* All per-cell operands ride as separate ``(TR, 128)`` VMEM refs — no
  packing, because a pack/unpack would add a full HBM round-trip of
  the operand set per iteration, which is exactly the traffic the
  kernel exists to avoid.  Traced scalars (dt, unit factors, the
  unshielded k27 rate) ride in one SMEM vector.
* Mosaic traps (measured in the round-2 mega-kernel post-mortem):
  global ``jax_enable_x64`` breaks Mosaic even for all-f32 kernels
  (the call is traced under ``jax.enable_x64(False)``); bool arrays
  are converted to int32 at the kernel boundary; the scoped-VMEM
  ceiling is raised explicitly because the default 16 MB limit fails
  opaquely.

Enable/disable via ``GTPU_NETWORK_KERNEL``:

* unset / ``0`` (default): off.  On v5e the kernel measured ~3.5%
  SLOWER than letting XLA fuse the inline network region (1.368M vs
  1.417M cells/s flagship) — the ~20 collapsed launches save less than
  the kernel loses to Mosaic's scheduling of the 40-operand VMEM
  stream; see docs/Performance.md, "network-kernel post-mortem".  It
  is kept as an opt-in experiment and as the duplication guard for
  ops/network.py (the compensated_sums path).
* ``1`` / ``on``: force on (f32 solves whose cell count is a multiple
  of 1024 only — rows must split into whole 8-sublane tiles).
  ``interpret``: force on in Pallas interpreter mode (used by the CPU
  equivalence tests).

``GTPU_NETWORK_TILE`` sets the per-launch row tile (sublane rows of
128 lanes; default 64 rows = 8192 cells per grid step).
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chemistry_step import RateState
from .network import network_update

_LANES = 128
_SUBLANES = 8


def _mode() -> str:
    return os.environ.get("GTPU_NETWORK_KERNEL", "0")


def kernel_requested(n: int, dtype) -> bool:
    """Decide (at trace time) whether the Pallas path runs.  Default is
    OFF (the inline XLA path measured faster; module docstring)."""
    mode = _mode()
    if mode not in ("1", "on", "interpret"):
        return False
    if dtype != jnp.float32:
        return False
    return n % (_SUBLANES * _LANES) == 0


def _row_tile(rows: int) -> int:
    """Largest whole-divisor row tile <= the configured maximum."""
    env = os.environ.get("GTPU_NETWORK_TILE")
    try:
        cap = int(env) if env else 64
    except ValueError as exc:
        raise ValueError(
            f"GTPU_NETWORK_TILE must be an integer, got {env!r}"
        ) from exc
    tr = max(_SUBLANES, min(cap, rows))
    while rows % tr:
        tr -= _SUBLANES
    return tr


def _tree_inputs(us, dt, f, rs, cool_v, carry_v, h2_limit):
    """The kernel's input pytree.  None subtrees (no rates in tabulated
    mode, no h2dust without dust, no h2 limit below tier 2) simply
    vanish from the flattened leaf list."""
    rs_t = None
    if rs is not None:
        rs_t = dict(k=dict(rs.k), shields=dict(rs.shields),
                    h2dust=rs.h2dust)
    carry_i = dict(
        carry_v,
        itmask=carry_v["itmask"].astype(jnp.int32),
        capped=carry_v["capped"].astype(jnp.int32),
    )
    return dict(
        f=dict(f), rs=rs_t, cool=dict(cool_v), carry=carry_i,
        h2=h2_limit, dt=dt, dom=us.dom, chunit=us.chunit,
    )


def _apply(cfg, tree):
    """Reconstruct network_update's arguments from the input pytree and
    run it; masks cross the kernel boundary as int32."""
    carry = dict(tree["carry"])
    carry["itmask"] = carry["itmask"] > 0
    carry["capped"] = carry["capped"] > 0
    rs = None
    if tree["rs"] is not None:
        rs = RateState(k=tree["rs"]["k"], k13dd=None,
                       h2dust=tree["rs"]["h2dust"],
                       shields=tree["rs"]["shields"], ti=None)
    us = SimpleNamespace(dom=tree["dom"], chunit=tree["chunit"])
    out = network_update(
        cfg, us, tree["dt"], tree["f"], rs, tree["cool"], carry,
        tree["h2"],
    )
    out["itmask"] = out["itmask"].astype(jnp.int32)
    out["capped"] = out["capped"].astype(jnp.int32)
    return out


def network_update_pallas(
    cfg, us, dt, f, rs, cool_v, carry_v, h2_limit,
    interpret: bool | None = None,
):
    """network_update as one Pallas launch.  Returns the same carry
    pytree (masks back as bool)."""
    if interpret is None:
        interpret = _mode() == "interpret" or (
            jax.default_backend() != "tpu"
        )
    dtype = f["density"].dtype
    n = f["density"].shape[0]
    rows = n // _LANES
    tr = _row_tile(rows)
    grid = (rows // tr,)

    inputs = _tree_inputs(us, dt, f, rs, cool_v, carry_v, h2_limit)
    leaves, treedef = jax.tree_util.tree_flatten(inputs)
    scal_ix = [i for i, x in enumerate(leaves) if jnp.ndim(x) == 0]
    arr_ix = [i for i, x in enumerate(leaves) if jnp.ndim(x) == 1]
    if len(scal_ix) + len(arr_ix) != len(leaves):
        raise ValueError("network kernel inputs must be scalars or [N]")
    scal = jnp.stack([jnp.asarray(leaves[i], dtype) for i in scal_ix]) \
        if scal_ix else jnp.zeros((1,), dtype)
    arrs = [leaves[i].reshape(rows, _LANES) for i in arr_ix]

    # output structure from the direct function on abstract [N] leaves
    out_tree = jax.eval_shape(lambda t: _apply(cfg, t), inputs)
    out_leaves, out_treedef = jax.tree_util.tree_flatten(out_tree)
    out_shapes = [
        jax.ShapeDtypeStruct((rows, _LANES), leaf.dtype)
        for leaf in out_leaves
    ]

    def kernel(scal_ref, *refs):
        in_refs = refs[: len(arrs)]
        out_refs = refs[len(arrs):]
        vals = [None] * len(leaves)
        for j, i in enumerate(scal_ix):
            vals[i] = scal_ref[j]
        for j, i in enumerate(arr_ix):
            vals[i] = in_refs[j][...]
        out = _apply(cfg, jax.tree_util.tree_unflatten(treedef, vals))
        for ref, val in zip(out_refs,
                            jax.tree_util.tree_leaves(out)):
            ref[...] = val

    block = pl.BlockSpec((tr, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((scal.shape[0],), lambda i: (0,),
                        memory_space=pltpu.SMEM)
    vmem_env = os.environ.get("GTPU_NETWORK_VMEM")
    vmem_bytes = int(vmem_env) if vmem_env else 100 * 1024 * 1024
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem] + [block] * len(arrs),
        out_specs=tuple([block] * len(out_shapes)),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_bytes,
        ),
        interpret=interpret,
    )
    # Mosaic compilation fails opaquely under the library's global
    # jax_enable_x64 (round-2 mega-kernel post-mortem, trap 1) even
    # though every operand here is f32/int32; trace the call with x64
    # off -- python-float constants are weak-typed either way, so the
    # emitted ops are identical.
    with jax.enable_x64(False):
        res = call(scal, *arrs)
    res = [r.reshape(n) for r in res]
    out = jax.tree_util.tree_unflatten(out_treedef, res)
    out["itmask"] = out["itmask"] > 0
    out["capped"] = out["capped"] > 0
    return out


