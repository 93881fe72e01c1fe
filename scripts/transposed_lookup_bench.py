"""Microbench: lookup-output LAYOUT inside a device while_loop on TPU.

The solver's fused lookup emits a (N, K) matrix whose K columns are then
consumed as separate per-rate (N,) vectors by the elementwise network.
The optimized HLO shows those column extractions as separate relayout
fusions (matrix (8,128) tiles -> vector tiles), part of the measured
~140 us/iteration fixed cost (docs/Performance.md "Remaining headroom").

Hypothesis: contracting TRANSPOSED — tables (K, 600) @ weights.T
(600, N) -> (K, N) — leaves each rate as a ROW whose minor dimension is
already the cell axis, so per-rate extraction is a sublane slice rather
than a cross-lane relayout.

Both variants consume every rate separately (an alternating add/mul
chain over all K rates) to force the per-rate extraction the real
network does; the feedback into the loop carry prevents hoisting.

Usage: python scripts/transposed_lookup_bench.py [N] [CHUNK]
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
stackedT = stacked.T  # (K, BINS)
pos0 = jnp.asarray(rng.uniform(0, BINS - 1, N), dtype=jnp.float32)

from grackle_tpu.ops.lookup import twohot_weights, _LOOKUP_PRECISION


def _chain(rates):
    """Consume every rate as a separate (N,) vector: alternating
    add/mul chain (proxy for the Gauss-Seidel network's per-rate use)."""
    acc = rates[0]
    for j, r in enumerate(rates[1:]):
        if j % 2 == 0:
            acc = acc + r * 0.5
        else:
            acc = acc * (1.0 + 1e-3 * r)
    return acc


def _vals_nk(pos):
    idx = jnp.clip(pos.astype(jnp.int32), 0, BINS - 2)
    frac = pos - idx
    w = twohot_weights(idx, frac, BINS, jnp.float32)
    v = jax.lax.dot_general(
        w, stacked, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_LOOKUP_PRECISION, preferred_element_type=jnp.float32,
    )  # (N, K)
    return _chain([v[:, k] for k in range(K)])


def _vals_kn(pos):
    idx = jnp.clip(pos.astype(jnp.int32), 0, BINS - 2)
    frac = pos - idx
    # two-hot weights transposed: (BINS, N)
    iota = jax.lax.broadcasted_iota(jnp.int32, (BINS, idx.shape[0]), 0)
    wT = ((iota == idx[None, :]).astype(jnp.float32)
          * (1.0 - frac)[None, :]
          + (iota == idx[None, :] + 1).astype(jnp.float32)
          * frac[None, :])
    v = jax.lax.dot_general(
        stackedT, wT, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_LOOKUP_PRECISION, preferred_element_type=jnp.float32,
    )  # (K, N)
    return _chain([v[k] for k in range(K)])


def bench(name, vals_fn):
    @jax.jit
    def run(pos):
        def body(c):
            i, p = c
            acc = vals_fn(p)
            p2 = jnp.abs(acc) % (BINS - 1)
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
    print(f"{name:16s} {per:8.4f} ms/iter   ({per / N * 1e6:.2f} ns/cell)")


if __name__ == "__main__":
    print(f"N={N} CHUNK={CHUNK} BINS={BINS} K={K} "
          f"platform={jax.default_backend()} prec={_LOOKUP_PRECISION}")
    bench("nk-columns", _vals_nk)
    bench("kn-rows", _vals_kn)
