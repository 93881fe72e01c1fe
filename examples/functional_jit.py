"""Functional-API example: chemistry compiled INTO the caller's jit.

A minimal "hydro-like" driver: a lax.scan time loop whose step fuses the
chemistry solve with caller-side arithmetic in ONE compiled XLA program.
This is the TPU-native integration mode the reference's per-call C
boundary cannot offer (grackle: src/clib/solve_chemistry.c:91-370);
see docs/Integration.md "Embedding in your own jit".

Evolves a batch of constant-density cells for N_STEPS and writes
temperature/energy trajectories to functional_jit.npz.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import get_data_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from grackle_tpu import chemistry_data, setup_fluid_container  # noqa: E402
import grackle_tpu.functional as gfn  # noqa: E402
from grackle_tpu.utilities.physical_constants import (  # noqa: E402
    cm_per_mpc,
    mass_hydrogen_cgs,
    sec_per_Myr,
)

if __name__ == "__main__":
    my_chemistry = chemistry_data()
    my_chemistry.use_grackle = 1
    my_chemistry.with_radiative_cooling = 1
    my_chemistry.primordial_chemistry = 1
    my_chemistry.metal_cooling = 1
    my_chemistry.UVbackground = 0
    my_chemistry.grackle_data_file = get_data_file()
    my_chemistry.density_units = mass_hydrogen_cgs
    my_chemistry.length_units = cm_per_mpc
    my_chemistry.time_units = sec_per_Myr
    my_chemistry.set_velocity_units()
    my_chemistry.initialize()

    fc = setup_fluid_container(
        my_chemistry, density=0.1,
        temperature=np.logspace(4.5, 6.5, 64),
        converge=False,
    )
    fields = {k: jnp.asarray(np.array(v)) for k, v in fc.items()
              if k in fc.density_fields or k == "energy"}

    solve = gfn.make_solve_fn(my_chemistry)
    temperature = gfn.make_temperature_fn(my_chemistry)

    dt = float(os.environ.get("DT_MYR", 1.0))       # Myr
    n_steps = int(os.environ.get("N_STEPS", 32))

    @jax.jit
    def evolve(f0):
        def step(f, _):
            new_f, diag = solve(f, dt)
            # caller-side work fused into the same program
            t = temperature(new_f)
            return new_f, (t, new_f["energy"], diag["n_iterations"])
        return jax.lax.scan(step, f0, None, length=n_steps)

    final, (T_traj, e_traj, iters) = evolve(fields)

    print(f"{n_steps} steps x {T_traj.shape[1]} cells in one compiled "
          f"scan; subcycles/step: min {int(iters.min())}, "
          f"max {int(iters.max())}")
    np.savez(
        "functional_jit.npz",
        temperature=np.asarray(T_traj),
        energy=np.asarray(e_traj),
        final_energy=np.asarray(final["energy"]),
    )
    print("wrote functional_jit.npz")
