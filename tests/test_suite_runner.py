"""Unit tests for the canonical suite runner's result parsing and the
bench regression-gate helpers — both are CI-load-bearing (run_suite.py
is the suite's green/red signal; bench.py's deviations field is the
perf-regression signal), so their logic is pinned here."""

import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_counts_variants():
    rs = _load("run_suite", "scripts/run_suite.py")
    assert rs.parse_counts("3 passed in 1.2s") == [3, 0, 0, 0]
    assert rs.parse_counts(
        "1 failed, 2 passed, 4 skipped in 9s") == [2, 1, 4, 0]
    assert rs.parse_counts("2 errors\n1 error in 3s") == [0, 0, 0, 1]
    assert rs.parse_counts(
        "= 335 passed, 1 skipped in 2473s =") == [335, 0, 1, 0]
    assert rs.parse_counts("garbage with no summary") is None


def test_empty_suite_is_red():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_suite.py"),
         "-k", "zz_matches_nothing_zz",
         "--ignore", "tests/test_suite_runner.py"],
        capture_output=True, text=True, cwd=REPO, timeout=1200,
    )
    assert r.returncode == 1
    assert "SUITE: RED (no tests ran)" in r.stdout


def test_bench_expected_gating(monkeypatch):
    bench = _load("bench_mod", "bench.py")
    devs = []
    # at the measured width, a 26% drop is flagged
    bench._check_expected("f64", 100_000.0, devs, which="n_f64")
    assert len(devs) == 1 and devs[0]["datapoint"] == "f64"
    # within tolerance: silent
    devs = []
    bench._check_expected("f64", 130_000.0, devs, which="n_f64")
    assert devs == []
    # at a non-default width the check must not fire at all
    monkeypatch.setattr(bench, "N_F64", 1024)
    devs = []
    bench._check_expected("f64", 1_000.0, devs, which="n_f64")
    assert devs == []
    # chem2's widened tolerance: -15% passes, -25% flags
    devs = []
    bench._check_expected(
        "chem2_9species_uvb_selfshield", 1_300_000.0 * 0.85, devs)
    assert devs == []
    bench._check_expected(
        "chem2_9species_uvb_selfshield", 1_300_000.0 * 0.75, devs)
    assert len(devs) == 1
