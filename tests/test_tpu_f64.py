"""On-device double precision: one 12-species f64 solve on the real TPU
backend vs the same solve in CPU f64.

The reference's CONFIG_PRECISION=64 build (Make.config.settings:23) is
our runtime ``precision=64`` mode; on TPU it runs through XLA's
software-emulated doubles, so this test is the evidence that the f64
path works ON DEVICE, not just under the CPU-forced test suite.

The suite's conftest pins JAX to CPU, so the device run happens in a
subprocess with a clean platform environment; skipped when no
TPU/accelerator backend is reachable.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import json, sys
import jax
try:
    devs = jax.devices()
except Exception as exc:
    print(json.dumps({"ok": False, "why": str(exc)}))
    sys.exit(0)
kind = devs[0].platform.lower()
print(json.dumps({"ok": kind not in ("cpu",), "why": kind}))
"""

_RUN = r"""
import json, sys
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, %(repo)r)
import __graft_entry__ as ge

cd = ge._make_context(chem=3, precision=64)
fields = {k: jnp.asarray(v) for k, v in ge._make_fields(cd, 1024).items()}
new_f, diag = cd.solve_chemistry(fields, 1.0e-4)
out = {k: np.asarray(v).tolist() for k, v in new_f.items()}
out["_n_iterations"] = int(diag["n_iterations"])
print("RESULT " + json.dumps(out))
"""


def _device_env():
    env = dict(os.environ)
    # undo the suite's CPU forcing so the subprocess sees the real backend
    env.pop("JAX_PLATFORMS", None)
    xla = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in xla.split()
        if "xla_force_host_platform_device_count" not in f
    )
    return env


def _run_sub(code, timeout):
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=_device_env(),
    )


def _tpu_available():
    try:
        out = _run_sub(_PROBE, timeout=120)
    except subprocess.TimeoutExpired:
        return False
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return bool(json.loads(line)["ok"])
            except (ValueError, KeyError):
                continue
    return False


@pytest.mark.skipif(not _tpu_available(),
                    reason="no TPU/accelerator backend reachable")
def test_f64_solve_on_device_matches_cpu():
    out = _run_sub(_RUN % {"repo": REPO}, timeout=580)
    payload = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            payload = json.loads(line[len("RESULT "):])
    assert payload is not None, (out.stdout[-2000:], out.stderr[-2000:])
    n_iter_dev = payload.pop("_n_iterations")

    # same solve in-process (conftest pinned this process to CPU, f64)
    import jax.numpy as jnp

    import __graft_entry__ as ge

    cd = ge._make_context(chem=3, precision=64)
    fields = {k: jnp.asarray(v)
              for k, v in ge._make_fields(cd, 1024).items()}
    new_f, diag = cd.solve_chemistry(fields, 1.0e-4)

    assert n_iter_dev == int(diag["n_iterations"])
    # measured agreement (2026-08-17, 232 subcycles, n=1024): atomic
    # species/energy ~1e-9, H2I/HDI ~2e-5 — the molecular network
    # amplifies the emulated-f64 rounding; far beyond f32 either way
    loose = {"H2I", "H2II", "HM", "HDI", "DI", "DII"}
    for name, dev_vals in payload.items():
        cpu_vals = np.asarray(new_f[name], dtype=np.float64)
        rtol = 1.0e-3 if name in loose else 1.0e-7
        np.testing.assert_allclose(
            np.asarray(dev_vals), cpu_vals, rtol=rtol,
            err_msg=name,
        )
