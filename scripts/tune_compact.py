"""Sweep the compaction knobs (warm-phase subcycles x batch size
[x warm-tile width]) on the flagship workload and print cells/s for
each point.

Usage: python scripts/tune_compact.py [N] [WARM,..] [BATCH,..] [TILE,..]

TILE sweeps GTPU_WARM_TILE (0 = the default, max(batch, 256k)).

Run on the real TPU (no JAX_PLATFORMS override).  Each point re-traces
(warm is the JIT-static solver_compaction parameter; batch flows through
GTPU_COMPACT_BATCH).  Timings force a device->host transfer of the
result (the only trustworthy timing through the axon tunnel; see
docs/Performance.md).
"""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

import __graft_entry__ as ge

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
WARMS = ([int(x) for x in sys.argv[2].split(",")]
         if len(sys.argv) > 2 else [12, 16, 20, 24, 28])
BATCHES = ([int(x) for x in sys.argv[3].split(",")]
           if len(sys.argv) > 3 else [32768, 49152, 65536])
TILES = ([int(x) for x in sys.argv[4].split(",")]
         if len(sys.argv) > 4 else [0])
DT = 1.0e-4
REPEATS = 3


def main():
    base_cd = ge._make_context(chem=3, precision=32)
    base_fields = ge._make_fields(base_cd, N)
    fields = {k: jnp.asarray(v) for k, v in base_fields.items()}

    import jax

    best = None
    for warm, batch, tile in itertools.product(WARMS, BATCHES, TILES):
        os.environ["GTPU_COMPACT_BATCH"] = str(batch)
        os.environ["GTPU_WARM_TILE"] = str(tile)
        # GTPU_WARM_TILE (and any future trace-time env knob) is read at
        # trace time and is not a jit static arg, so a cached trace would
        # silently ignore the new value.  Clear unconditionally: the
        # retrace cost is already paid per (warm, batch) point anyway.
        jax.clear_caches()
        # the real flagship config, with only the swept knob overridden
        cd = ge._make_context(chem=3, precision=32, solver_compaction=warm)
        # compile + warm cache
        out, _ = cd.solve_chemistry(dict(fields), DT)
        float(jnp.sum(out["energy"]))
        best_t = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out, _ = cd.solve_chemistry(dict(fields), DT)
            float(jnp.sum(out["energy"]))  # force transfer
            best_t = min(best_t, time.perf_counter() - t0)
        rate = N / best_t
        print(f"warm={warm:3d} batch={batch:6d} tile={tile:6d}"
              f"  {rate/1e6:6.3f}M cells/s"
              f"  ({best_t*1e3:.0f} ms)", flush=True)
        if best is None or rate > best[0]:
            best = (rate, warm, batch, tile)
    print(f"best: warm={best[1]} batch={best[2]} tile={best[3]}"
          f" {best[0]/1e6:.3f}M cells/s")


if __name__ == "__main__":
    main()
