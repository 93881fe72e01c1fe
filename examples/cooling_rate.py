"""Cooling-rate example: equilibrium cooling rate vs temperature.

Mirror of grackle: src/python/examples/cooling_rate.py -- constant-density
fluid container over a log-T grid, iterated toward equilibrium, cooling
rate saved as cooling_rate.npz (and plotted if matplotlib is available).

Select the network with PRIMORDIAL_CHEM=0..3 (default 3).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import get_data_file  # noqa: E402

from grackle_tpu import chemistry_data, setup_fluid_container
from grackle_tpu.utilities.physical_constants import (
    cm_per_mpc,
    mass_hydrogen_cgs,
    sec_per_Myr,
)

if __name__ == "__main__":
    current_redshift = 0.0

    my_chemistry = chemistry_data()
    my_chemistry.use_grackle = 1
    my_chemistry.with_radiative_cooling = 0
    my_chemistry.primordial_chemistry = int(
        os.environ.get("PRIMORDIAL_CHEM", 3))
    my_chemistry.metal_cooling = 1
    my_chemistry.UVbackground = 1
    my_chemistry.grackle_data_file = get_data_file()
    my_chemistry.use_specific_heating_rate = 1
    my_chemistry.use_volumetric_heating_rate = 1

    my_chemistry.comoving_coordinates = 0
    my_chemistry.a_units = 1.0
    my_chemistry.a_value = 1.0 / (1.0 + current_redshift)
    my_chemistry.density_units = mass_hydrogen_cgs
    my_chemistry.length_units = cm_per_mpc
    my_chemistry.time_units = sec_per_Myr
    my_chemistry.set_velocity_units()

    density = 1.0  # code units, proper
    temperature = np.logspace(4, 9, 101)
    fc = setup_fluid_container(
        my_chemistry,
        density=density * mass_hydrogen_cgs,
        temperature=temperature,
        converge=(my_chemistry.primordial_chemistry > 0),
        tolerance=0.01,
        max_iterations=200,
    )

    fc.calculate_temperature()
    fc.calculate_cooling_time()
    fc.calculate_hydrogen_number_density()
    # cooling rate in erg s^-1 cm^3: e / t_cool * rho / n_H^2 (cgs)
    e_cgs = fc["energy"] * my_chemistry.energy_units
    t_cool_cgs = fc["cooling_time"] * my_chemistry.time_units
    rho_cgs = fc["density"] * my_chemistry.density_units
    cooling_rate = e_cgs / t_cool_cgs * rho_cgs / fc["nH"] ** 2

    out = "cooling_rate"
    np.savez(out + ".npz", temperature=fc["temperature"],
             cooling_rate=cooling_rate)
    print(f"wrote {out}.npz")
    try:
        from matplotlib import pyplot
        pyplot.loglog(fc["temperature"], np.abs(cooling_rate))
        pyplot.xlabel("T [K]")
        pyplot.ylabel(r"$|\Lambda|/n_{\rm H}^2$ [erg s$^{-1}$ cm$^3$]")
        pyplot.savefig(out + ".png")
        print(f"wrote {out}.png")
    except ImportError:
        pass
