"""Canonical full-suite runner: fresh pytest process per test file.

Why this exists: running all ~330 tests in ONE pytest process dies with
`Fatal Python error: Segmentation fault` inside XLA-CPU
`backend_compile_and_load` partway through the run (reproduced 3/3 on
long runs in this image; stacks in docs/Testing.md "Known issue").  The
crash is accumulating process state from hundreds of XLA-CPU compiles —
every crashing file passes standalone, and no test *failure* was ever
observed.  The reference's suite runs whole under CI
(grackle .circleci/config.yml:100-115); ours runs whole through this
script, which shards the files across fresh interpreter processes and
aggregates one green/red summary line.

Usage:
    python scripts/run_suite.py                  # everything
    python scripts/run_suite.py --ignore tests/test_code_examples.py
    python scripts/run_suite.py -k freefall      # pass-through args
    python scripts/run_suite.py --shard-size 4   # files per process

Exit code 0 iff every shard exits 0.  A shard that crashes (negative
return code / signal) is reported as CRASH with its tail, distinct from
test failures.
"""

import argparse
import glob
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def parse_counts(out):
    """Pull (passed, failed, skipped, errors) from a pytest -q tail."""
    counts = [0, 0, 0, 0]
    for line in reversed(out.splitlines()):
        if " passed" in line or " failed" in line or " error" in line \
                or " skipped" in line or "no tests ran" in line:
            for i, key in enumerate(("passed", "failed", "skipped",
                                     "error")):
                m = re.search(rf"(\d+) {key}", line)
                if m:
                    counts[i] = int(m.group(1))
            return counts
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--shard-size", type=int, default=1,
                        help="test files per fresh process (default 1)")
    parser.add_argument("--ignore", action="append", default=[],
                        help="test file(s) to skip")
    parser.add_argument("--timeout", type=int, default=1800,
                        help="per-shard timeout in seconds")
    args, passthrough = parser.parse_known_args()

    files = sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    ignored = {os.path.abspath(os.path.join(ROOT, p))
               for p in args.ignore}
    files = [f for f in files if os.path.abspath(f) not in ignored]
    shards = [files[i:i + args.shard_size]
              for i in range(0, len(files), args.shard_size)]

    totals = [0, 0, 0, 0]  # passed, failed, skipped, errors
    bad_shards = []
    t_start = time.time()
    for shard in shards:
        names = " ".join(os.path.relpath(f, ROOT) for f in shard)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-m", "pytest", "-q",
                 "-p", "no:cacheprovider", *shard, *passthrough],
                cwd=ROOT, capture_output=True, text=True,
                timeout=args.timeout,
            )
            rc, out = r.returncode, r.stdout + r.stderr
        except subprocess.TimeoutExpired as exc:
            rc = 124
            out = ((exc.stdout or b"").decode(errors="replace")
                   + (exc.stderr or b"").decode(errors="replace")
                   + f"\nTIMEOUT after {args.timeout}s")
        dt = time.time() - t0
        counts = parse_counts(out)
        if counts:
            for i in range(4):
                totals[i] += counts[i]
        # pytest rc 5 = no tests collected (a file of all-skipped
        # parametrizations); treat as ok.  rc 1-4 are pytest's own
        # failure codes (failures / interrupted / internal / usage) —
        # report as FAIL; only signal deaths (rc < 0) are CRASH.
        if rc not in (0, 5):
            if rc == 124:
                kind = "TIMEOUT"
            elif rc < 0 or rc > 124:
                kind = "CRASH"
            else:
                kind = "FAIL"
            bad_shards.append((names, rc, kind, out[-4000:]))
            status = kind
        else:
            status = "ok"
        c = counts or ["?"] * 4
        print(f"[{status:>7}] {names}: {c[0]} passed, {c[1]} failed, "
              f"{c[2]} skipped ({dt:.0f}s)", flush=True)

    wall = time.time() - t_start
    print("=" * 70)
    for names, rc, kind, tail in bad_shards:
        print(f"--- {kind} rc={rc}: {names} ---")
        print(tail)
    print(f"TOTAL: {totals[0]} passed, {totals[1]} failed, "
          f"{totals[2]} skipped, {totals[3]} errors in {wall:.0f}s "
          f"across {len(shards)} shard(s)")
    if bad_shards or totals[1] or totals[3]:
        print("SUITE: RED")
        sys.exit(1)
    if totals[0] == 0:
        # a typo'd -k filter or an --ignore list covering everything
        # must not read as a passing suite
        print("SUITE: RED (no tests ran)")
        sys.exit(1)
    print("SUITE: GREEN")


if __name__ == "__main__":
    main()
