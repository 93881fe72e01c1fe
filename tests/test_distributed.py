"""Multi-host initialization (parallel/distributed.py).

The reference's multi-node model is "each MPI rank links the library and
calls it on its own subgrid" (grackle: src/clib/grackle.h:56-60); the
TPU-native analogue is ``jax.distributed`` + a global device mesh.  A
real two-process run is spawned on the CPU backend (Gloo collectives),
each process contributing 4 virtual devices to an 8-device global mesh.
"""

import os
import socket
import subprocess
import sys

import jax
import pytest

from grackle_tpu.parallel.distributed import (
    global_cell_mesh,
    initialize_distributed,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
rank, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
from grackle_tpu.parallel.distributed import (
    initialize_distributed, global_cell_mesh)
pc, pi = initialize_distributed(f"localhost:{port}", 2, rank)
assert pc == 2 and pi == rank, (pc, pi)
mesh = global_cell_mesh()
assert mesh.shape["cells"] == 8, mesh.shape
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
# a real cross-process collective over the global mesh: each process
# contributes 4 cells, the jitted sum reduces across both
local = np.full(4, float(rank + 1))
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("cells")), local)
total = float(jax.jit(jnp.sum)(arr))
assert total == 12.0, total

# the reference's per-rank model: each process solves ITS OWN cells
# with the plain single-process API (grackle.h:56-60 local_* contract)
from grackle_tpu.api import ChemistryData
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs
cd = ChemistryData()
cd.use_grackle = 1
cd.with_radiative_cooling = 1
cd.primordial_chemistry = 1
cd.density_units = mass_hydrogen_cgs
cd.length_units = 3.0857e21
cd.time_units = 3.1556952e13
assert cd.initialize() == 1
fc = FluidContainer(cd, 4)
fc["density"][:] = 1.0 + rank
fc["HI"][:] = 0.76 * fc["density"]
fc["HII"][:] = 1e-20
fc["HeI"][:] = 0.24 * fc["density"]
fc["HeII"][:] = 1e-20
fc["HeIII"][:] = 1e-20
fc["de"][:] = 1e-20
fc["energy"][:] = 1.0e-2
new_f, diag = cd.solve_chemistry(fc._solver_fields(), 1.0e-4)
assert bool(np.all(np.asarray(diag["converged"])))
print(f"RANK_OK {rank}")
"""


def test_single_process_noop():
    """No coordinator, no cluster: a clean no-op returning (1, 0)."""
    pc, pi = initialize_distributed()
    assert pc == 1
    assert pi == 0


def test_global_cell_mesh_spans_all_devices():
    mesh = global_cell_mesh()
    assert mesh.shape["cells"] == len(jax.devices())


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(sys.platform != "linux", reason="gloo spawn test")
def test_two_process_global_mesh(tmp_path):
    port = _free_port()
    script = str(tmp_path / "child.py")
    with open(script, "w") as fh:
        fh.write(_CHILD % {"repo": REPO})
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(rank), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(tmp_path),
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (rank, out[-2000:])
        assert f"RANK_OK {rank}" in out, (rank, out[-2000:])
