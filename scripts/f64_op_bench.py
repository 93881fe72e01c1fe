"""Rank emulated-f64 elementwise op costs on the TPU.

The f64 solve runs every elementwise op through XLA's double-word
emulation (no f64 hardware on v5e).  This script measures per-op
throughput for the ops the subcycle loop actually uses, f64 vs f32, so
the "emulated transcendentals dominate the f64 gap" claim in
docs/Performance.md is backed by numbers and the expensive ops are
ranked for targeted mixed-precision work.

Method: time y = op(x) over a [N] vector inside jit, subtracting the
measured cost of the identity baseline (same array in/out, isolating
launch + HBM traffic).  Each op is timed standalone — fusion effects
in the real loop differ, but relative op cost is what transfers.

Usage: python scripts/f64_op_bench.py [N]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
REPEATS = 5

OPS = {
    "identity": lambda x: x,
    "add": lambda x: x + 1.000000001,
    "mul": lambda x: x * 1.000000001,
    "div": lambda x: 1.0 / x,
    "sqrt": jnp.sqrt,
    "rsqrt": jax.lax.rsqrt,
    "exp": jnp.exp,
    "log": jnp.log,
    "log10": lambda x: jnp.log10(x),
    "pow_0.17": lambda x: x ** 0.17,
    "pow_int4": lambda x: x ** 4,
    "exp10": lambda x: 10.0 ** x,
    "tanh": jnp.tanh,
    "where_mul_add": lambda x: jnp.where(x > 1.0, x * 2.0 + 1.0, x),
}


def time_op(fn, x):
    f = jax.jit(fn)
    y = f(x)
    float(jnp.sum(y))  # tunnel-safe completion fence
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        y = f(x)
        float(jnp.sum(y))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.RandomState(7)
    base = 10.0 ** rng.uniform(-1.0, 1.0, N)  # ~O(1), transcendental-safe
    rows = []
    for name, fn in OPS.items():
        t32 = time_op(fn, jnp.asarray(base, jnp.float32))
        t64 = time_op(fn, jnp.asarray(base, jnp.float64))
        rows.append((name, t32, t64))
        print(f"{name:>14}: f32 {t32 * 1e3:7.3f} ms   f64 "
              f"{t64 * 1e3:8.3f} ms   ratio {t64 / t32:6.1f}x",
              flush=True)
    ident32 = rows[0][1]
    ident64 = rows[0][2]
    print(f"\nnet of identity baseline (f32 {ident32 * 1e3:.3f} ms, "
          f"f64 {ident64 * 1e3:.3f} ms):")
    for name, t32, t64 in rows[1:]:
        n32 = max(t32 - ident32, 1e-9)
        n64 = max(t64 - ident64, 1e-9)
        print(f"{name:>14}: f32 {n32 * 1e3:7.3f} ms   f64 "
              f"{n64 * 1e3:8.3f} ms   ratio {n64 / n32:6.1f}x")


if __name__ == "__main__":
    main()
