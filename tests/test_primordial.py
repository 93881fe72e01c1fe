"""Analytic answer test: 6-species collisional ionization equilibrium.

Analogue of grackle: src/python/tests/test_primordial.py:32-66 — iterate
the network to equilibrium and compare ionization fractions and the cooling
rate against the closed-form CIE solution built from the same rate fits.
"""

import numpy as np

from grackle_tpu.api import ChemistryData
from grackle_tpu.utilities.convenience import setup_fluid_container
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs
from grackle_tpu.utilities import primordial_equilibrium as peq


def test_equilibrium():
    my_chem = ChemistryData()
    my_chem.use_grackle = 1
    my_chem.with_radiative_cooling = 0
    my_chem.primordial_chemistry = 1
    my_chem.metal_cooling = 0
    my_chem.UVbackground = 0
    my_chem.comoving_coordinates = 0
    my_chem.a_units = 1.0
    my_chem.a_value = 1.0
    my_chem.density_units = mass_hydrogen_cgs
    my_chem.length_units = 1.0
    my_chem.time_units = 1.0

    # restrict to T >= 1e5 K where convergence is fast; the reference's
    # full version spans 1e4.5-1e9 K and "takes a long time"
    temperature = np.logspace(5.0, 9.0, 31)
    fc = setup_fluid_container(
        my_chem, temperature=temperature, converge=True,
        tolerance=1e-6, max_iterations=np.inf, verbose=False,
    )

    fc.calculate_temperature()
    fc.calculate_cooling_time()
    t_sort = np.argsort(fc["temperature"])
    t_cool = fc["cooling_time"][t_sort] * my_chem.time_units
    my_T = fc["temperature"][t_sort]
    fc.calculate_hydrogen_number_density()
    my_nH = fc["nH"].mean()

    # --- ionization balance vs closed form ---
    nH_g = (fc["HI"] + fc["HII"])[t_sort]
    fHI_g = fc["HI"][t_sort] / nH_g
    fHI_eq = peq.nHI(my_T, my_nH) / (
        peq.nHI(my_T, my_nH) + peq.nHII(my_T, my_nH)
    )
    sel = fHI_eq > 1e-12
    np.testing.assert_allclose(
        fHI_g[sel], fHI_eq[sel], rtol=0.05,
        err_msg="HI equilibrium fraction mismatch",
    )

    # --- cooling rate vs closed form ---
    cooling_rate_eq = -1 * peq.total_cooling(my_T, my_nH) / my_nH**2
    cooling_rate_g = (
        fc["energy"][t_sort] / t_cool * fc["density"]
        * my_chem.density_units / my_nH**2
    )
    # the closed-form model uses Katz+96-style He recombination-cooling
    # fits that differ slightly from the solver's Hui & Gnedin tables, so
    # agreement is ~15% near the He ionization edges (the reference's
    # version of this test compares visually only)
    np.testing.assert_allclose(
        cooling_rate_g, cooling_rate_eq, rtol=0.2,
        err_msg="CIE cooling rate mismatch",
    )
