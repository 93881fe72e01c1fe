"""Free-fall collapse answer test (the reference's freefall example
workload, grackle: src/python/examples/freefall.py): H2 formation via the
three-body channel must cool the collapsing gas."""

import numpy as np

from grackle_tpu import FluidContainer, chemistry_data, evolve_freefall
from grackle_tpu.utilities.physical_constants import (
    cm_per_mpc,
    mass_hydrogen_cgs,
    sec_per_Myr,
)


def test_freefall_collapse_h2_cooling():
    my_chemistry = chemistry_data()
    my_chemistry.use_grackle = 1
    my_chemistry.with_radiative_cooling = 1
    my_chemistry.primordial_chemistry = 2
    my_chemistry.three_body_rate = 0
    my_chemistry.cie_cooling = 1
    my_chemistry.h2_optical_depth_approximation = 1
    my_chemistry.density_units = mass_hydrogen_cgs
    my_chemistry.length_units = cm_per_mpc
    my_chemistry.time_units = sec_per_Myr
    my_chemistry.initialize()

    fc = FluidContainer(my_chemistry, 1)
    tiny = 1e-20
    fc["density"][:] = 0.1
    fc["HII"][:] = tiny
    fc["HI"][:] = 0.76 * fc["density"]
    fc["HeI"][:] = 0.24 * fc["density"]
    fc["HeII"][:] = tiny
    fc["HeIII"][:] = tiny
    fc["de"][:] = tiny
    fc["HM"][:] = tiny
    fc["H2I"][:] = 1e-6 * fc["density"]
    fc["H2II"][:] = tiny
    fc.calculate_mean_molecular_weight()
    fc["energy"][:] = (
        300.0 / my_chemistry.temperature_units / fc["mu"]
        / (my_chemistry.Gamma - 1.0)
    )
    fc.calculate_temperature()

    data = evolve_freefall(
        fc, 1.0e4 * mass_hydrogen_cgs, safety_factor=0.1, verbose=False
    )

    h2_frac = data["H2I"] / data["density"]
    # H2 grows during the collapse and keeps the gas below the adiabat
    assert h2_frac[-1] > 10 * h2_frac[0]
    t_adiabatic = 300.0 * (
        data["density"][-1] / data["density"][0]
    ) ** (2.0 / 3.0)
    assert data["temperature"][-1] < t_adiabatic
    assert np.all(np.isfinite(data["temperature"]))
