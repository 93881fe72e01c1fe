"""Derived-field calculator physics tests (pressure, gamma, dust
temperature balance)."""

import numpy as np
import jax.numpy as jnp

from grackle_tpu.api import ChemistryData
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.ops.dust_temp import (
    calc_gr_balance,
    calc_kappa_gr,
    calc_tdust_1d,
)
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


def make_chem(chem=2, **kw):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.primordial_chemistry = chem
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in kw.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def test_pressure_ideal_gas():
    cd = make_chem(1)
    n = 8
    fc = FluidContainer(cd, n)
    fc["density"][:] = 2.0
    fc["HI"][:] = 0.76 * 2.0
    fc["HeI"][:] = 0.24 * 2.0
    for k in ["HII", "HeII", "HeIII", "de"]:
        fc[k][:] = 1e-20
    fc["energy"][:] = 3.0
    fc.calculate_pressure()
    np.testing.assert_allclose(
        fc["pressure"], (5.0 / 3.0 - 1.0) * 2.0 * 3.0, rtol=1e-12
    )


def test_gamma_drops_with_h2():
    """Molecular gas has gamma < 5/3 (calculate_gamma.c:72-118)."""
    cd = make_chem(2)
    n = 4
    fc = FluidContainer(cd, n)
    fc["density"][:] = 1.0
    fc["HI"][:] = 0.26
    fc["H2I"][:] = 0.5       # H2-dominated
    fc["HeI"][:] = 0.24
    for k in ["HII", "HeII", "HeIII", "de", "HM", "H2II"]:
        fc[k][:] = 1e-20
    # T ~ 500 K where vibrational DOFs partially active
    fc["energy"][:] = 500.0 / cd.temperature_units / 1.2 / (5.0 / 3 - 1)
    fc.calculate_gamma()
    assert np.all(fc["gamma"] < 5.0 / 3.0)
    assert np.all(fc["gamma"] > 1.3)


def test_dust_temperature_balance():
    """The returned dust temperature zeroes the grain heat balance
    (calc_tdust_1d_g.F:459-468) and sits between T_CMB and T_gas."""
    n = 32
    rng = np.random.RandomState(2)
    tgas = jnp.asarray(10.0 ** rng.uniform(1.5, 3.0, n))
    nh = jnp.asarray(10.0 ** rng.uniform(0, 6, n))
    gasgr = jnp.asarray(np.full(n, 1.0e-33))
    isrf = jnp.ones(n)
    gamma_isrf = 3.9e-24 / 1.67262171e-24 / 0.009387
    trad = jnp.float64(2.73)
    tdust = calc_tdust_1d(
        tgas, nh, gasgr, gamma_isrf, isrf,
        jnp.ones(n, dtype=bool), trad,
    )
    tdust = np.asarray(tdust)
    assert np.all(tdust >= 2.73 - 1e-6)
    # residual balance is small relative to its largest term
    kgr = calc_kappa_gr(jnp.asarray(tdust))
    sol = np.asarray(calc_gr_balance(
        jnp.asarray(tdust), tgas, kgr, trad**4, gasgr,
        isrf * gamma_isrf, nh,
    ))
    scale = np.maximum(np.asarray(isrf) * gamma_isrf,
                       np.abs(np.asarray(gasgr * nh * tgas)))
    assert np.all(np.abs(sol) / scale < 2e-2)


def test_dust_temperature_field_api():
    cd = make_chem(2, h2_on_dust=1)
    n = 8
    fc = FluidContainer(cd, n)
    fc["density"][:] = 100.0
    fc["HI"][:] = 0.5
    fc["H2I"][:] = 0.2
    fc["HeI"][:] = 0.24
    for k in ["HII", "HeII", "HeIII", "de", "HM", "H2II"]:
        fc[k][:] = 1e-20
    fc["metal"][:] = 0.01
    fc["energy"][:] = 100.0 / cd.temperature_units / 1.2 / (5.0 / 3 - 1)
    fc.calculate_dust_temperature()
    assert np.all(np.isfinite(fc["dust_temperature"]))
    assert np.all(fc["dust_temperature"] >= 2.73 - 1e-6)
    fc.calculate_temperature()
    assert np.all(fc["dust_temperature"] <= fc["temperature"] + 1e-6)
