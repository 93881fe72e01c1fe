"""Run every Python example as a subprocess and sanity-check its output
(analogue of grackle: src/python/tests/test_examples.py:43-104, which
runs the examples and compares their products to stored answers; here
the products are validated structurally and the solver outputs are
covered by tests/test_answers.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


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
    out = np.load(tmp_path / "cooling_rate.npz")
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
    out = np.load(tmp_path / "cooling_cell.npz")
    assert np.all(np.isfinite(out["temperature"]))
    # with radiative cooling on, the cell must cool over the run
    assert out["temperature"][-1] < out["temperature"][0]


@pytest.mark.parametrize("metal", [0, 1])
def test_freefall_example(tmp_path, metal):
    _run("freefall.py", tmp_path,
         {"METAL_COOLING": str(metal)}, timeout=1800)
    out = np.load(tmp_path / "freefall.npz")
    assert np.all(np.isfinite(out["temperature"]))
    # density must rise by orders of magnitude in the collapse
    assert out["density"][-1] > 1e3 * out["density"][0]
