"""Attempt a minimal repro of the single-process XLA-CPU segfault.

The full suite run in one pytest process dies 4/4 with
`Fatal Python error: Segmentation fault` inside
jax/_src/compiler.py `backend_compile_and_load` after a few hundred
XLA-CPU compilations (docs/Testing.md "Known issue").  This script
distills the suspected trigger — many distinct mid-size compiles in
one process on a 1-core host, with `jax_enable_x64` toggling between
groups the way it toggles between test modules — WITHOUT pytest, to
separate "accumulating XLA-CPU compile state" from anything
test-framework related.

Each round builds a structurally fresh program (distinct shapes +
constants so nothing caches), compiles, runs, and prints a heartbeat.
A segfault before ROUNDS complete reproduces the bug standalone; a
clean exit means the crash needs the real suite's larger compile
volume/shapes.

Usage: JAX_PLATFORMS=cpu python scripts/repro_xla_cpu_segfault.py [ROUNDS]
REPRO_RETAIN=1 keeps every jitted function alive (as pytest does).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 600


def make_program(i, dtype):
    """A while_loop + scatter/gather program, shape-varied per round
    (the suite's solver compiles are masked while_loops with gathers
    between chunks)."""
    n = 64 + 8 * (i % 37)
    k = 3 + i % 5
    c = 1.0 + 0.001 * i

    @jax.jit
    def prog(x):
        def body(state):
            step, v = state
            w = jnp.where(v > c, v * 0.99, v * 1.01)
            for _ in range(k):
                w = w + jnp.tanh(w) * 0.01
            idx = jnp.argsort(w)[: n // 2]
            sub = w[idx] * 1.001
            w = w.at[idx].set(sub)
            return step + 1, w

        def cond(state):
            step, v = state
            return (step < 5) & jnp.any(v > 0)

        _, out = jax.lax.while_loop(cond, body, (0, x))
        return jnp.sum(out)

    x = jnp.asarray(np.random.RandomState(i).rand(n) + 0.5, dtype)
    return prog, x


def main():
    retain = os.environ.get("REPRO_RETAIN", "0") == "1"
    kept = []
    for i in range(ROUNDS):
        # toggle x64 every 50 rounds, as the suite does between modules
        if i % 50 == 0:
            jax.config.update("jax_enable_x64", (i // 50) % 2 == 1)
            print(f"round {i}: x64={jax.config.jax_enable_x64}",
                  flush=True)
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        prog, x = make_program(i, dtype)
        float(prog(x))
        if retain:
            kept.append((prog, x))  # pytest keeps every jit cache alive
    print(f"completed {ROUNDS} distinct compiles without crashing — "
          "the segfault needs the real suite's compile volume/shapes",
          flush=True)


if __name__ == "__main__":
    main()
