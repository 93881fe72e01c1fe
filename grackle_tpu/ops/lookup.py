"""Log-temperature table lookup.

The reference performs a per-cell linear lookup in log(T) for every rate
table (grackle: src/clib/solve_rate_cool_g.F:1206-1323 and
src/clib/cool1d_multi_g.F:348-410).  Here the index/fraction pair is computed
once per cell and every table evaluation is a batched gather + lerp.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "tdef", "t1", "t2", "logtem"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class TableIndex:
    """Per-cell interpolation state: 0-based bin index, fraction within the
    bin, and the bracketing log-temperatures (solve_rate_cool_g.F:1217-1221).
    """

    idx: Any
    tdef: Any
    t1: Any
    t2: Any
    logtem: Any


def table_index(logtem, n_bins: int, t_start: float, t_end: float):
    """Compute clamped index + interpolation fraction for a log-spaced
    temperature table (solve_rate_cool_g.F:1202-1221)."""
    logtem0 = jnp.log(t_start)
    logtem9 = jnp.log(t_end)
    dlogtem = (logtem9 - logtem0) / (n_bins - 1)
    logtem = jnp.clip(logtem, logtem0, logtem9)
    # reference: min(nratec-1, max(1, int(...)+1)) in 1-based indexing
    idx = jnp.clip(
        ((logtem - logtem0) / dlogtem).astype(jnp.int32), 0, n_bins - 2
    )
    t1 = logtem0 + idx * dlogtem
    t2 = logtem0 + (idx + 1) * dlogtem
    tdef = (logtem - t1) / (t2 - t1)
    return TableIndex(idx=idx, tdef=tdef, t1=t1, t2=t2, logtem=logtem)


def lookup(table, ti: TableIndex):
    """Linear interpolation of a 1-D table at the cell indices."""
    lo = table[ti.idx]
    return lo + (table[ti.idx + 1] - lo) * ti.tdef


def lookup_many(tables, ti: TableIndex):
    """Lookup a sequence of same-shaped tables at shared indices.

    Stacks the tables into a (n_tables, n_bins) matrix so the gather is a
    single fused op on TPU instead of n_tables separate gathers.
    """
    stacked = jnp.stack(tables, axis=0)
    lo = stacked[:, ti.idx]
    hi = stacked[:, ti.idx + 1]
    out = lo + (hi - lo) * ti.tdef[None, :]
    return tuple(out[i] for i in range(len(tables)))
