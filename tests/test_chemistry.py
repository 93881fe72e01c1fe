"""Unit-system invariance tests.

Analogue of grackle: src/python/tests/test_chemistry.py:28-274 — the same
physical setup in different unit systems (proper vs comoving, two random
proper systems) must give the same cooling time to 4 significant digits.
"""

import numpy as np
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.utilities.convenience import setup_fluid_container
from grackle_tpu.utilities.testing import (
    assert_rel_equal,
    random_logscale,
)
from grackle_tpu.utilities.units import set_cosmology_units


def _base_chem(**kwargs):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 0
    cd.primordial_chemistry = 1
    cd.metal_cooling = 0
    cd.UVbackground = 0
    for k, v in kwargs.items():
        setattr(cd, k, v)
    return cd


def _cooling_time_cgs(cd, temperature):
    fc = setup_fluid_container(
        cd, temperature=temperature, converge=False, verbose=False
    )
    fc.calculate_temperature()
    fc.calculate_cooling_time()
    t_sort = np.argsort(fc["temperature"])
    return fc["cooling_time"][t_sort] * cd.time_units


def test_proper_comoving_units():
    """Proper and comoving unit systems agree to 4 significant digits
    (test_chemistry.py:28-91)."""
    my_random_state = np.random.RandomState(7921)
    temperature = np.logspace(4.2, 8.8, 41)
    for current_redshift in [0.0, 1.0, 3.0, 6.0]:
        chem_c = _base_chem()
        set_cosmology_units(
            chem_c, current_redshift=current_redshift,
            initial_redshift=99.0,
        )
        t_cool_c = _cooling_time_cgs(chem_c, temperature)

        chem_p = _base_chem()
        chem_p.comoving_coordinates = 0
        chem_p.a_units = 1.0
        chem_p.a_value = 1.0 / (1.0 + current_redshift)
        chem_p.density_units = (
            random_logscale(-2, 2, random_state=my_random_state)[0]
            * chem_c.density_units / (1 + current_redshift) ** 3
        )
        chem_p.length_units = (
            random_logscale(-2, 2, random_state=my_random_state)[0]
            * chem_c.length_units * (1 + current_redshift)
        )
        chem_p.time_units = (
            random_logscale(-2, 2, random_state=my_random_state)[0]
            * chem_c.time_units
        )
        t_cool_p = _cooling_time_cgs(chem_p, temperature)

        assert_rel_equal(
            t_cool_p, t_cool_c, 4,
            err_msg=f"Proper/comoving disagreement at "
                    f"z={current_redshift}",
        )


def test_two_random_proper_unit_systems():
    """Two random proper unit systems agree
    (test_chemistry.py:161-223)."""
    my_random_state = np.random.RandomState(8675309)
    temperature = np.logspace(4.2, 8.8, 41)
    t_cools = []
    for _ in range(2):
        cd = _base_chem()
        cd.comoving_coordinates = 0
        cd.a_units = 1.0
        cd.a_value = 1.0
        cd.density_units = random_logscale(
            -28, -24, random_state=my_random_state)[0]
        cd.length_units = random_logscale(
            0, 2, random_state=my_random_state)[0]
        cd.time_units = random_logscale(
            10, 13, random_state=my_random_state)[0]
        t_cools.append(_cooling_time_cgs(cd, temperature))
    assert_rel_equal(
        t_cools[0], t_cools[1], 4,
        err_msg="Random unit systems disagree.",
    )


def _units_with_set_cosmology():
    cd = _base_chem()
    set_cosmology_units(cd, current_redshift=1.0, initial_redshift=99.0)
    return cd


def test_comoving_cooling_time_finite():
    cd = _units_with_set_cosmology()
    t_cool = _cooling_time_cgs(cd, np.logspace(4.5, 8, 21))
    assert np.all(np.isfinite(t_cool))
    assert np.all(t_cool < 0)
