"""Dump the optimized HLO of one full-width subcycle chunk and count ops.

Usage: python scripts/dump_hlo.py [N] [out.txt]
"""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from grackle_tpu.ops import solver as _solver
from grackle_tpu.ops.common import make_unit_scalars, solver_dtype
from grackle_tpu.api import _photo_rates

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/subcycle_hlo.txt"
# GTPU_DUMP_PRECISION=64 dumps the f64 (split-fetch) body instead
PRECISION = int(os.environ.get("GTPU_DUMP_PRECISION", "32"))

cd = ge._make_context(chem=3, precision=PRECISION)
ctx = cd.context
cfg = ctx.config
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
    carry = _solver.run_subcycles(
        cfg, ctx.tables, ctx.cloudy_primordial, ctx.cloudy_metal,
        pr, us, carry, 1.0e-4, imetal=True,
        cloudy_data_new=ctx.cloudy_data_new, chunk=32, const_f=f_const,
    )
    return carry["fields"]["energy"], carry["cell_it"]


txt = run.lower(fields).compile().as_text()
with open(OUT, "w") as fh:
    fh.write(txt)

import re  # noqa: E402

ops = Counter()
for line in txt.splitlines():
    s = line.strip()
    if " = " not in s:
        continue
    rhs = s.split(" = ", 1)[1]
    # `%name = TYPE op-name(args)` — the type token may itself contain
    # parens (tile layouts), so match the identifier right before the
    # first "(" that follows whitespace
    m = re.match(r"\S+\s+([a-zA-Z][\w-]*)\(", rhs)
    if m is None:
        m = re.search(r"\)\s*\}?\s+([a-zA-Z][\w-]*)\(", rhs)
    if m:
        ops[m.group(1)] += 1
print(f"wrote {OUT} ({len(txt)} bytes)")
for op, c in ops.most_common(25):
    print(f"  {op:28s} {c}")
print("total fusions:", ops["fusion"])
