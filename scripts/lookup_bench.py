"""Microbench: table-lookup strategies INSIDE a device while_loop on TPU.

Compares, per iteration at N cells, evaluating K=60 stacked tables at
per-cell log-T positions:
  twohot  : (N,600) two-hot weight matmul (current design)
  gather  : fat row-gather stacked2[idx] with stacked2=(600, 2K) holding
            [table, table-shifted] so lo/hi come from ONE gather + lerp
  onehot2 : hierarchical: gather block, then small matmul  (skipped)

Each strategy runs CHUNK iterations inside one jit'd while_loop; the
loop carry feeds the result back into the position so XLA cannot hoist.

Usage: python scripts/lookup_bench.py [N] [CHUNK]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BINS = 600
K = 60

rng = np.random.RandomState(0)
stacked = jnp.asarray(rng.rand(BINS, K), dtype=jnp.float32)
# paired matrix for single-gather lo/hi
stacked2 = jnp.concatenate([stacked, jnp.roll(stacked, -1, axis=0)], axis=1)
pos0 = jnp.asarray(rng.uniform(0, BINS - 1, N), dtype=jnp.float32)

from grackle_tpu.ops.lookup import twohot_weights, _LOOKUP_PRECISION


def _vals_twohot(pos):
    idx = jnp.clip(pos.astype(jnp.int32), 0, BINS - 2)
    frac = pos - idx
    w = twohot_weights(idx, frac, BINS, jnp.float32)
    return jax.lax.dot_general(
        w, stacked, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_LOOKUP_PRECISION, preferred_element_type=jnp.float32,
    )


def _vals_gather(pos):
    idx = jnp.clip(pos.astype(jnp.int32), 0, BINS - 2)
    frac = pos - idx
    both = stacked2[idx]           # (N, 2K): lo = [:, :K], hi = [:, K:]
    lo, hi = both[:, :K], both[:, K:]
    return lo + (hi - lo) * frac[:, None]


def _vals_gather2(pos):
    idx = jnp.clip(pos.astype(jnp.int32), 0, BINS - 2)
    frac = pos - idx
    lo = stacked[idx]
    hi = stacked[idx + 1]
    return lo + (hi - lo) * frac[:, None]


def bench(name, vals_fn):
    @jax.jit
    def run(pos):
        def body(c):
            i, p = c
            v = vals_fn(p)
            # feed result back so nothing hoists; keep p in range
            p2 = jnp.abs(jnp.sum(v, axis=1)) % (BINS - 1)
            return i + 1, 0.5 * p + 0.5 * p2

        def cond(c):
            return c[0] < CHUNK

        _, p = jax.lax.while_loop(cond, body, (jnp.int32(0), pos))
        return p

    p = run(pos0)
    float(jnp.sum(p))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        p = run(pos0)
        float(jnp.sum(p))
        best = min(best, time.perf_counter() - t0)
    per = best / CHUNK * 1e3
    print(f"{name:12s} {per:8.4f} ms/iter   ({per / N * 1e6:.2f} ns/cell)")


if __name__ == "__main__":
    print(f"N={N} CHUNK={CHUNK} BINS={BINS} K={K} "
          f"platform={jax.default_backend()} prec={_LOOKUP_PRECISION}")
    bench("twohot", _vals_twohot)
    bench("gather-fat", _vals_gather)
    bench("gather-2", _vals_gather2)
