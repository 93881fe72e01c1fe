"""Cooling-cell example: single cell cooling at constant density.

Mirror of grackle: src/python/examples/cooling_cell.py -- tabulated mode
(primordial_chemistry=0), evolve one cell at constant density for 100 Myr
and save temperature/mu vs time.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import get_data_file  # noqa: E402

from grackle_tpu import (
    chemistry_data,
    evolve_constant_density,
    setup_fluid_container,
)
from grackle_tpu.utilities.physical_constants import (
    cm_per_mpc,
    mass_hydrogen_cgs,
    sec_per_Myr,
)

if __name__ == "__main__":
    current_redshift = 0.0

    my_chemistry = chemistry_data()
    my_chemistry.use_grackle = 1
    my_chemistry.with_radiative_cooling = 1
    my_chemistry.primordial_chemistry = 0
    my_chemistry.metal_cooling = 1
    my_chemistry.UVbackground = 1
    my_chemistry.grackle_data_file = get_data_file()

    my_chemistry.comoving_coordinates = 0
    my_chemistry.a_units = 1.0
    my_chemistry.a_value = 1.0 / (1.0 + current_redshift)
    my_chemistry.density_units = mass_hydrogen_cgs
    my_chemistry.length_units = cm_per_mpc
    my_chemistry.time_units = sec_per_Myr
    my_chemistry.set_velocity_units()

    density = 0.1          # g/cm^3 in code units (0.1 H/cc)
    temperature = 1.0e6    # K
    final_time = float(os.environ.get("FINAL_TIME", 100.0))  # Myr

    fc = setup_fluid_container(
        my_chemistry,
        density=density * mass_hydrogen_cgs,
        temperature=np.array([temperature]),
        metal_mass_fraction=0.02041,
        converge=False,
    )

    data = evolve_constant_density(
        fc, final_time=final_time, safety_factor=0.01)

    np.savez("cooling_cell.npz", time=data["time"],
             temperature=data["temperature"], mu=data["mu"])
    print("wrote cooling_cell.npz")
