"""Compile-and-run smoke tests for the native interface layer.

Analogue of grackle: src/python/tests/test_code_examples.py — build
libgrackle_tpu.so, compile the C example against it, run it, and check
for success output.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLIB = os.path.join(REPO, "clib")
EXAMPLES = os.path.join(REPO, "examples")


def _have_toolchain():
    return shutil.which("g++") and shutil.which("gcc") and shutil.which(
        "make"
    )


def _build_and_run_c(tmp_path, src, marker, extra_cflags=()):
    """make the shim, compile one C example against it, run it on the
    CPU backend, assert the success marker, and return stdout."""
    r = subprocess.run(["make"], cwd=CLIB, capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(CLIB, "libgrackle_tpu.so"))

    exe = str(tmp_path / os.path.splitext(src)[0])
    r = subprocess.run(
        ["gcc", *extra_cflags, "-I" + os.path.join(CLIB, "include"),
         os.path.join(EXAMPLES, src),
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
    assert marker in r.stdout
    return r.stdout


def _assert_temperature_sane(stdout):
    for line in stdout.splitlines():
        if line.startswith("temperature[0]"):
            t = float(line.split("=")[1])
            assert 1.0e3 < t < 1.0e5
            return
    raise AssertionError("no temperature[0] line in output")


@pytest.mark.skipif(not _have_toolchain(), reason="no C toolchain")
def test_c_example_builds_and_runs(tmp_path):
    out = _build_and_run_c(tmp_path, "c_example.c", "C_EXAMPLE_SUCCESS")
    _assert_temperature_sane(out)


@pytest.mark.skipif(not _have_toolchain(), reason="no C toolchain")
def test_c_legacy_api_example_builds_and_runs(tmp_path):
    """Deprecated flat-pointer tier (grackle: src/clib/grackle.h:34-77):
    a legacy host written against _set_default_chemistry_parameters /
    _initialize_chemistry_data / _solve_chemistry /
    _calculate_temperature must link and run unchanged."""
    out = _build_and_run_c(
        tmp_path, "c_legacy_api_example.c", "C_LEGACY_EXAMPLE_SUCCESS",
        extra_cflags=("-Wno-deprecated-declarations",),
    )
    _assert_temperature_sane(out)


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
def test_cxx_grid_example_builds_and_runs(tmp_path):
    """3-D ghost-zone grid path through the C ABI: ghost cells must pass
    through solve_chemistry and all calculate_* routines bit-identical,
    for primordial_chemistry 0-3 (analogue of the reference's
    cxx_grid_example.C)."""
    r = subprocess.run(["make"], cwd=CLIB, capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    exe = str(tmp_path / "cxx_grid_example")
    r = subprocess.run(
        ["g++", "-I" + os.path.join(CLIB, "include"),
         os.path.join(EXAMPLES, "cxx_grid_example.cpp"),
         "-L" + CLIB, "-lgrackle_tpu", "-Wl,-rpath," + CLIB,
         "-o", exe],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    from grackle_tpu.data.synthetic import make_synthetic_data_file

    data_file = str(tmp_path / "synthetic_cloudy.h5")
    make_synthetic_data_file(data_file)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([exe, data_file], capture_output=True, text=True,
                       timeout=600, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "CXX_GRID_EXAMPLE_SUCCESS" in r.stdout


def test_generated_interfaces_are_fresh(tmp_path):
    """The C header, marshaling includes, and the Fortran BIND(C) module
    are all generated from the parameter registry; the committed files
    must match a fresh regeneration byte-for-byte (so the Fortran
    surface cannot silently rot -- the generator is the single source of
    truth for both ABIs)."""
    import shutil as sh

    workdir = tmp_path / "clib"
    workdir.mkdir()
    sh.copy(os.path.join(CLIB, "gen_header.py"), workdir)
    (workdir / "src").mkdir()
    os.symlink(os.path.join(REPO, "grackle_tpu"),
               str(tmp_path / "grackle_tpu"))
    r = subprocess.run([sys.executable, "gen_header.py"],
                       cwd=str(workdir), capture_output=True, text=True,
                       timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    pairs = [
        (workdir / "include" / "grackle_tpu.h",
         os.path.join(CLIB, "include", "grackle_tpu.h")),
        (workdir / "src" / "params_marshal.inc",
         os.path.join(CLIB, "src", "params_marshal.inc")),
        (workdir / "src" / "params_defaults.inc",
         os.path.join(CLIB, "src", "params_defaults.inc")),
        (workdir / "src" / "params_access.inc",
         os.path.join(CLIB, "src", "params_access.inc")),
        (workdir / "grackle_tpu_fortran.f90",
         os.path.join(CLIB, "grackle_tpu_fortran.f90")),
    ]
    for fresh, committed in pairs:
        with open(fresh) as fh:
            want = fh.read()
        with open(committed) as fh:
            got = fh.read()
        assert got == want, f"{committed} is stale; run clib/gen_header.py"


@pytest.mark.skipif(not shutil.which("gfortran"),
                    reason="no gfortran in this environment")
def test_fortran_example_builds_and_runs(tmp_path):
    """Fortran host-code path: compile the generated BIND(C) module and
    the example against libgrackle_tpu.so and run it (analogue of the
    reference's fortran_example.F + grackle_fortran_interface.def)."""
    r = subprocess.run(["make"], cwd=CLIB, capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    exe = str(tmp_path / "fortran_example")
    r = subprocess.run(
        ["gfortran", os.path.join(CLIB, "grackle_tpu_fortran.f90"),
         os.path.join(EXAMPLES, "fortran_example.f90"),
         "-J", str(tmp_path),
         "-L" + CLIB, "-lgrackle_tpu", "-Wl,-rpath," + CLIB,
         "-o", exe],
        capture_output=True, text=True, timeout=120, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([exe], capture_output=True, text=True,
                       timeout=600, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "FORTRAN_EXAMPLE_SUCCESS" in r.stdout


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
