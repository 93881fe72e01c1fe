"""Perf attribution: time a fixed number of full-width subcycles under
config ablations (flagship = 12-species + metals + dust, f32).

Each variant times run_subcycles with a fixed chunk so every variant does
the identical number of subcycle iterations regardless of physics -- the
delta between variants attributes cost to the toggled term.

Usage: python scripts/ablate.py [N] [CHUNK]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from grackle_tpu.api import _photo_rates
from grackle_tpu.ops import solver as _solver
from grackle_tpu.ops.common import make_unit_scalars

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DT = 1.0e-4
# ABLATE_PRECISION=64 attributes the f64 (split-fetch) solve instead
PRECISION = int(os.environ.get("ABLATE_PRECISION", "32"))


def time_variant(name, **overrides):
    cd = ge._make_context(chem=overrides.pop("chem", 3),
                          precision=PRECISION)
    for k, v in overrides.pop("params", {}).items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    ctx = cd.context
    cfg = ctx.config
    from grackle_tpu.ops.common import solver_dtype
    dtype = solver_dtype(cfg)
    fields = {k: jnp.asarray(v, dtype=dtype)
              for k, v in ge._make_fields(cd, N).items()}

    @jax.jit
    def run(f):
        us = make_unit_scalars(cfg, ctx.tables, ctx.units, 0.0)
        pr = _photo_rates(cfg, ctx.tables, ctx.uvb, ctx.units)
        f2, itmask0 = _solver.prepare_fields(cfg, f, us, True, False)
        f_state, f_const = _solver.split_state(cfg, f2)
        carry = _solver.init_carry(f_state, itmask0)
        # force the mask to stay all-true timing-wise? No: keep real
        # retirement; chunk is small enough that most lanes stay active.
        carry = _solver.run_subcycles(
            cfg, ctx.tables, ctx.cloudy_primordial, ctx.cloudy_metal,
            pr, us, carry, DT, imetal=True,
            cloudy_data_new=ctx.cloudy_data_new, chunk=CHUNK, const_f=f_const,
        )
        return carry["fields"]["energy"], carry["cell_it"]

    e, it = run(fields)
    float(jnp.sum(e))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        e, it = run(fields)
        float(jnp.sum(e))
        best = min(best, time.perf_counter() - t0)
    n_active = float(jnp.mean(it))
    per_iter_ms = best / CHUNK * 1e3
    print(f"{name:34s} {best*1e3:8.1f} ms  {per_iter_ms:7.3f} ms/subcycle"
          f"  (mean cell_it {n_active:.1f})")
    return best


if __name__ == "__main__":
    print(f"N={N} CHUNK={CHUNK} platform={jax.default_backend()}")
    if len(sys.argv) > 3 and sys.argv[3] == "sweep":
        # width sweep: fixed-overhead vs linear-cost attribution
        for n in [8192, 16384, 32768, 65536, 131072, 262144, 1048576]:
            N = n
            time_variant(f"flagship @ N={n}")
        sys.exit(0)
    base = time_variant("flagship (chem3+dust+metal)")
    time_variant("no dust", params={"dust_chemistry": 0,
                                    "cmb_temperature_floor": 1})
    time_variant("no metal cooling (dust off too)",
                 params={"metal_cooling": 0, "dust_chemistry": 0})
    time_variant("three_body_rate=1 (no k13dd)",
                 params={"three_body_rate": 1})
    time_variant("gather lookups (fused off)",
                 params={"use_fused_lookup": 0})
    time_variant("chem=2 (9-species)", chem=2)
    time_variant("chem=1 (6-species)", chem=1)
