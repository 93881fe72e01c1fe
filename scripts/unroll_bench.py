"""Sweep GTPU_SUBCYCLE_UNROLL on hardware at the flagship config.

The subcycle while-loop body issues ~36 fusions per trip = ~140 us of
fixed sequential launch cost vs ~7 ns/cell marginal work
(docs/Performance.md "Launch overhead").  GTPU_SUBCYCLE_UNROLL=k runs k
subcycle iterations per while trip, amortizing that fixed cost over k
iterations at the price of k x the compiled body (more code, same math;
bit-identical because retired lanes are masked no-ops).

Each unroll value is measured in a fresh subprocess (the knob is read
at trace time; in-process sweeps would hit the jit cache).  Measures
the flagship 1M-cell f32 solve (override the width with BENCH_N; the
warm phase's chunk=24 constrains warm-phase unroll to divisors of 24,
non-divisors silently run that phase rolled).

Round-5 result (docs/Performance.md "Subcycle unroll"): FLAT — the
per-iteration fixed cost is fusion-issue, which unrolling duplicates.

Usage: python scripts/unroll_bench.py [unroll values...]
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, {root!r})
import bench
rate, n_iter, t = bench._run_solve({n}, repeats=3)
print("SWEEP_RESULT", json.dumps(
    dict(unroll=os.environ.get("GTPU_SUBCYCLE_UNROLL", "1"),
         n={n}, rate=rate, subcycles=n_iter, wall_s=t)))
"""


def run_point(unroll, n):
    env = dict(os.environ)
    if unroll > 1:
        env["GTPU_SUBCYCLE_UNROLL"] = str(unroll)
    else:
        env.pop("GTPU_SUBCYCLE_UNROLL", None)
    code = CHILD.format(root=ROOT, n=n)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600, env=env, cwd=ROOT,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SWEEP_RESULT"):
            return json.loads(line.split(" ", 1)[1])
    sys.stderr.write(out.stdout[-3000:] + out.stderr[-3000:])
    return dict(unroll=str(unroll), n=n, rate=None, error=True)


def main():
    values = [int(v) for v in sys.argv[1:]] or [1, 2, 4, 8]
    results = []
    for u in values:
        r = run_point(u, int(os.environ.get("BENCH_N", 1_048_576)))
        results.append(r)
        print(json.dumps(r), flush=True)
    base = next((r["rate"] for r in results if r["unroll"] == "1"), None)
    if base:
        for r in results:
            if r.get("rate"):
                print(f"unroll={r['unroll']}: {r['rate']:,.0f} cells/s "
                      f"({r['rate'] / base:+.1%} vs unroll=1)")


if __name__ == "__main__":
    main()
