"""Multi-step fusion benchmark: K chemistry steps inside ONE jit
(`lax.scan` over the functional solve closure) vs K host-dispatched
calls of the same step.

The reference is a C library the host calls once per hydro timestep
(solve_chemistry.c:91-370), so every step pays a host boundary.  The
functional API (grackle_tpu/functional.py) removes that boundary: the
chemistry step traces into the caller's own jit, so a K-step driver
loop compiles into one XLA program with zero host round-trips — this
script quantifies what that amortization is worth on real hardware.

Usage: python scripts/scan_bench.py [N] [K] [DT]

Run on the real TPU (no JAX_PLATFORMS override).  dt defaults to a
hydro-like step needing O(10) subcycles, the regime where dispatch
overhead is a visible fraction of a step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from grackle_tpu import functional as gfn

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DT = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0e-5
REPEATS = 3


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out["energy"]))  # tunnel-safe completion fence
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out["energy"]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cd = ge._make_context(chem=3, precision=32)
    # Cast to the solver dtype: the scan carry must keep a fixed dtype
    # across iterations, and the precision-32 solve emits float32.
    fields = {k: jnp.asarray(v, dtype=jnp.float32)
              for k, v in ge._make_fields(cd, N).items()}
    solve = gfn.make_solve_fn(cd)

    step = jax.jit(lambda f, dt: solve(f, dt)[0])

    def host_loop(f, dt):
        for _ in range(K):
            f = step(f, dt)
        return f

    @jax.jit
    def scanned(f, dt):
        def body(carry, _):
            return solve(carry, dt)[0], None

        out, _ = jax.lax.scan(body, f, None, length=K)
        return out

    dt = jnp.float32(DT)
    t_host = _time(host_loop, fields, dt)
    t_scan = _time(scanned, fields, dt)
    work = N * K
    print(f"N={N} K={K} dt={DT}")
    print(f"host-dispatch loop : {work / t_host / 1e6:7.3f}M cell-steps/s"
          f"  ({t_host * 1e3:.1f} ms)")
    print(f"fused lax.scan     : {work / t_scan / 1e6:7.3f}M cell-steps/s"
          f"  ({t_scan * 1e3:.1f} ms)")
    print(f"scan fusion speedup: {t_host / t_scan:.3f}x")


if __name__ == "__main__":
    main()
