"""Compile-and-run smoke tests for the native interface layer.

Analogue of grackle: src/python/tests/test_code_examples.py — build
libgrackle_tpu.so, compile the C example against it, run it, and check
for success output.
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLIB = os.path.join(REPO, "clib")
EXAMPLES = os.path.join(REPO, "examples")


def _have_toolchain():
    return shutil.which("g++") and shutil.which("gcc") and shutil.which(
        "make"
    )


@pytest.mark.skipif(not _have_toolchain(), reason="no C toolchain")
def test_c_example_builds_and_runs(tmp_path):
    # 1. build the shim library
    r = subprocess.run(["make"], cwd=CLIB, capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(CLIB, "libgrackle_tpu.so"))

    # 2. compile the C example
    exe = str(tmp_path / "c_example")
    r = subprocess.run(
        ["gcc", "-I" + os.path.join(CLIB, "include"),
         os.path.join(EXAMPLES, "c_example.c"),
         "-L" + CLIB, "-lgrackle_tpu", "-Wl,-rpath," + CLIB,
         "-o", exe],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # 3. run it (embedded interpreter on CPU)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([exe], capture_output=True, text=True,
                       timeout=600, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "C_EXAMPLE_SUCCESS" in r.stdout
    # physics sanity from the printed values
    for line in r.stdout.splitlines():
        if line.startswith("temperature[0]"):
            t = float(line.split("=")[1])
            assert 1.0e3 < t < 1.0e5


@pytest.mark.skipif(not _have_toolchain(), reason="no C toolchain")
def test_cxx_omp_example_builds_and_runs(tmp_path):
    """Concurrent host threads calling the C ABI must be safe and
    agree with a serial sweep (analogue of the reference's
    cxx_omp_example.C + MAKE_OMP=yes build,
    grackle: src/example/cxx_omp_example.C)."""
    r = subprocess.run(["make"], cwd=CLIB, capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    exe = str(tmp_path / "cxx_omp_example")
    r = subprocess.run(
        ["g++", "-fopenmp", "-I" + os.path.join(CLIB, "include"),
         os.path.join(EXAMPLES, "cxx_omp_example.cpp"),
         "-L" + CLIB, "-lgrackle_tpu", "-Wl,-rpath," + CLIB,
         "-o", exe],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([exe], capture_output=True, text=True,
                       timeout=600, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "CXX_OMP_EXAMPLE_SUCCESS" in r.stdout


@pytest.mark.skipif(not _have_toolchain(), reason="no C toolchain")
def test_dynamic_api_example_builds_and_runs(tmp_path):
    """The C dynamic parameter API (string-keyed access + name
    enumeration; grackle.h:41-50) must round-trip every registered
    parameter.  Pure C, no embedded interpreter needed."""
    r = subprocess.run(["make"], cwd=CLIB, capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    exe = str(tmp_path / "dynapi_example")
    r = subprocess.run(
        ["gcc", "-I" + os.path.join(CLIB, "include"),
         os.path.join(EXAMPLES, "dynamic_api_example.c"),
         "-L" + CLIB, "-lgrackle_tpu", "-Wl,-rpath," + CLIB,
         "-o", exe],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run([exe], capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "DYNAPI_EXAMPLE_SUCCESS" in r.stdout
