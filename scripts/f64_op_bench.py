"""Rank emulated-f64 elementwise op costs on the TPU.

The f64 solve runs every elementwise op through XLA's double-word
emulation (no f64 hardware on v5e).  This script measures per-op
throughput for the ops the subcycle loop actually uses, f64 vs f32, so
the "emulated arithmetic dominates the f64 gap" claim in
docs/Performance.md is backed by numbers and the expensive ops are
ranked for targeted mixed-precision work.

Method: the tunnel's ~25 ms host round-trip swamps any single op
launch, so each measurement runs K applications of the op inside one
jitted fori_loop (the input is perturbed by the loop index so XLA
cannot hoist the op as loop-invariant) and reports
(t(K) - t(identity loop)) / K — pure marginal op cost per application
over an [N] vector.

Usage: python scripts/f64_op_bench.py [N] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
REPEATS = 3

OPS = {
    # baseline: same loop plumbing (perturb + accumulate), no op
    "baseline": lambda x: x,
    "add": lambda x: x + 1.000000001,
    "mul": lambda x: x * 1.000000001,
    "div": lambda x: 1.0 / x,
    "sqrt": jnp.sqrt,
    "exp": jnp.exp,
    "log": jnp.log,
    "log10": lambda x: jnp.log10(x),
    "exp10": lambda x: 10.0 ** x,
    "pow_0.17": lambda x: x ** 0.17,
    "pow_int4": lambda x: x ** 4,
    "where_mul_add": lambda x: jnp.where(x > 1.0, x * 2.0 + 1.0, x),
}


def make_loop(fn, dtype):
    eps = jnp.asarray(1e-12, dtype)

    @jax.jit
    def run(x):
        def body(i, acc):
            # i-dependent perturbation defeats loop-invariant hoisting;
            # costs one mul+add, identical across ops and dtypes, and
            # is subtracted out via the baseline loop
            return acc + fn(x + i.astype(dtype) * eps)

        return jax.lax.fori_loop(0, K, body, jnp.zeros_like(x))

    return run


def time_loop(fn, x):
    run = make_loop(fn, x.dtype)
    y = run(x)
    float(jnp.sum(y))  # tunnel-safe completion fence
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        y = run(x)
        float(jnp.sum(y))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.RandomState(7)
    base = 10.0 ** rng.uniform(-1.0, 1.0, N)  # ~O(1), transcendental-safe
    x32 = jnp.asarray(base, jnp.float32)
    x64 = jnp.asarray(base, jnp.float64)
    rows = []
    for name, fn in OPS.items():
        t32 = time_loop(fn, x32)
        t64 = time_loop(fn, x64)
        rows.append((name, t32, t64))
        print(f"{name:>14}: f32 {t32 * 1e3:8.2f} ms   f64 "
              f"{t64 * 1e3:8.2f} ms  (loop of {K})", flush=True)
    b32, b64 = rows[0][1], rows[0][2]
    print(f"\nmarginal per-application cost over [{N}] "
          f"(net of baseline loop, /K={K}):")
    print(f"{'op':>14}  {'f32 us':>9}  {'f64 us':>9}  {'f64/f32':>8}  "
          f"{'f64 ns/elem':>11}")
    for name, t32, t64 in rows[1:]:
        n32 = max((t32 - b32) / K, 1e-12)
        n64 = max((t64 - b64) / K, 1e-12)
        print(f"{name:>14}  {n32 * 1e6:9.1f}  {n64 * 1e6:9.1f}  "
              f"{n64 / n32:8.1f}  {n64 / N * 1e9:11.2f}")


if __name__ == "__main__":
    main()
