"""Sweep the compaction knobs (warm-phase subcycles x batch size) on the
flagship workload and print cells/s for each point.

Usage: python scripts/tune_compact.py [N] [WARM,WARM,...] [BATCH,BATCH,...]

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
import numpy as np

import __graft_entry__ as ge
from grackle_tpu.api import ChemistryData
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
WARMS = ([int(x) for x in sys.argv[2].split(",")]
         if len(sys.argv) > 2 else [12, 16, 20, 24, 28])
BATCHES = ([int(x) for x in sys.argv[3].split(",")]
           if len(sys.argv) > 3 else [32768, 49152, 65536])
DT = 1.0e-4
REPEATS = 3


def make_cd(warm):
    data_file = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".synthetic_cloudy.h5",
    )
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = 3
    cd.precision = 32
    cd.metal_cooling = 1
    cd.grackle_data_file = data_file
    cd.dust_chemistry = 1
    cd.cmb_temperature_floor = 1
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    cd.solver_compaction = warm
    assert cd.initialize() == 1
    return cd


def main():
    base_cd = ge._make_context(chem=3, precision=32)
    base_fields = ge._make_fields(base_cd, N)
    fields = {k: jnp.asarray(v) for k, v in base_fields.items()}

    best = None
    for warm, batch in itertools.product(WARMS, BATCHES):
        os.environ["GTPU_COMPACT_BATCH"] = str(batch)
        cd = make_cd(warm)
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
        print(f"warm={warm:3d} batch={batch:6d}  {rate/1e6:6.3f}M cells/s"
              f"  ({best_t*1e3:.0f} ms)", flush=True)
        if best is None or rate > best[0]:
            best = (rate, warm, batch)
    print(f"best: warm={best[1]} batch={best[2]} {best[0]/1e6:.3f}M cells/s")


if __name__ == "__main__":
    main()
