"""Run every Python example as a subprocess, sanity-check its output,
and compare the produced arrays against stored answers at rtol 1e-6
(the analogue of grackle: src/python/tests/test_examples.py:43-104,
which runs the examples and compares their products to stored answers
at the same tolerance).

Regenerate the stored outputs after an intentional physics change with

    GTPU_REGEN_ANSWERS=1 python -m pytest tests/test_python_examples.py
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")
ANSWER_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "answers", "examples")


def _check_answer(tag, npz_path):
    """Compare every array the example wrote against the stored answer
    (or store it when GTPU_REGEN_ANSWERS=1)."""
    out = np.load(npz_path)
    stored_path = os.path.join(ANSWER_DIR, tag + ".npz")
    if os.environ.get("GTPU_REGEN_ANSWERS"):
        os.makedirs(ANSWER_DIR, exist_ok=True)
        np.savez(stored_path, **{k: out[k] for k in out.files})
        return out
    if not os.path.exists(stored_path):
        pytest.fail(
            f"no stored answer {stored_path}; regenerate with "
            "GTPU_REGEN_ANSWERS=1"
        )
    stored = np.load(stored_path)
    assert sorted(stored.files) == sorted(out.files), tag
    for key in stored.files:
        np.testing.assert_allclose(
            out[key], stored[key], rtol=1e-6, err_msg=f"{tag}/{key}",
        )
    return out


def _run(name, tmp_path, env_extra=None, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["MPLBACKEND"] = "Agg"
    env.update(env_extra or {})
    # The container's sitecustomize force-selects the TPU-tunnel backend
    # programmatically, overriding the JAX_PLATFORMS env var; only
    # jax.config.update before first backend use genuinely forces CPU.
    boot = (
        "import jax, runpy, sys\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "runpy.run_path(sys.argv[1], run_name='__main__')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", boot, os.path.join(EXAMPLES, name)],
        capture_output=True, text=True, timeout=timeout,
        cwd=str(tmp_path), env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    return r


@pytest.mark.parametrize("chem", [0, 1, 2, 3])
def test_cooling_rate_example(tmp_path, chem):
    _run("cooling_rate.py", tmp_path,
         {"PRIMORDIAL_CHEM": str(chem)})
    out = _check_answer(f"cooling_rate_chem{chem}",
                        tmp_path / "cooling_rate.npz")
    T = out["temperature"]
    rate = out["cooling_rate"]
    assert T.shape == rate.shape
    assert np.all(np.isfinite(rate))
    # equilibrium cooling at 1e6-1e7 K is dominated by H/He + brem:
    # magnitude should be in the classic 1e-24..1e-21 erg cm^3/s band
    sel = (T > 1e6) & (T < 1e7)
    assert np.all(np.abs(rate[sel]) > 1e-26)
    assert np.all(np.abs(rate[sel]) < 1e-20)


def test_cooling_cell_example(tmp_path):
    _run("cooling_cell.py", tmp_path)
    out = _check_answer("cooling_cell", tmp_path / "cooling_cell.npz")
    assert np.all(np.isfinite(out["temperature"]))
    # with radiative cooling on, the cell must cool over the run
    assert out["temperature"][-1] < out["temperature"][0]


@pytest.mark.parametrize("metal", [0, 1])
def test_freefall_example(tmp_path, metal):
    _run("freefall.py", tmp_path,
         {"METAL_COOLING": str(metal)}, timeout=1800)
    out = _check_answer(f"freefall_metal{metal}",
                        tmp_path / "freefall.npz")
    assert np.all(np.isfinite(out["temperature"]))
    # density must rise by orders of magnitude in the collapse
    assert out["density"][-1] > 1e3 * out["density"][0]


def test_functional_jit_example(tmp_path):
    _run("functional_jit.py", tmp_path,
         env_extra={"N_STEPS": "8", "DT_MYR": "1.0"})
    out = _check_answer("functional_jit", tmp_path / "functional_jit.npz")
    T = out["temperature"]
    assert T.shape == (8, 64)
    assert np.all(np.isfinite(T))
    # cooling-dominated band: hottest cells must cool monotonically
    assert T[-1, -1] < T[0, -1]
