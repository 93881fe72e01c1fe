"""Exact-integration tabulated cooling (ops/exact_cool.py).

Three checks:
1. an analytic constant-Lambda table (alpha = 0 power law) where the
   scheme must reproduce the closed-form linear energy decay;
2. end-to-end agreement with the subcycled integrator on the synthetic
   Cloudy table at small dt (both approximate the same ODE — the
   subcycled path carries 10%-step error, the exact path only table
   resolution);
3. scope validation (cooling-only configuration enforced).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.config import default_config, resolve_config
from grackle_tpu.data.cloudy import CloudyTable
from grackle_tpu.data.synthetic import make_synthetic_data_file
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.ops import exact_cool
from grackle_tpu.ops.common import (
    make_unit_scalars,
    photo_rates_from_tables,
)
from grackle_tpu.rates.tables import build_rate_tables
from grackle_tpu.units import CodeUnits
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "synthetic_cloudy.h5"
    return str(make_synthetic_data_file(path))


def _units():
    return CodeUnits(
        comoving_coordinates=0,
        density_units=mass_hydrogen_cgs,
        length_units=3.0857e21,
        time_units=3.1556952e13,
        a_units=1.0,
        a_value=1.0,
    )


def test_constant_lambda_matches_analytic():
    """A rank-1 table with constant cooling and constant mmw: de/dt is
    constant, so e(t) = e0 - rate * t exactly (until the table floor)."""
    cfg = resolve_config(default_config(
        use_grackle=1, with_radiative_cooling=1, primordial_chemistry=0,
        metal_cooling=0, exact_cooling=1, precision=64,
    ))
    units = _units()
    tables = build_rate_tables(cfg, units, dtype=jnp.float64)
    us = make_unit_scalars(cfg, tables, units, 0.0)
    pr = photo_rates_from_tables(tables)

    K = 41
    log10T = np.linspace(1.0, 9.0, K)
    log_lambda = np.full(K, -2.0)  # constant Lambda = 1e-2 (code units)
    mmw = np.full(K, 0.6)
    prim = CloudyTable(
        grid_rank=1, grid_dimension=(K,),
        par1=jnp.asarray(log10T),
        cooling=jnp.asarray(log_lambda),
        mmw=jnp.asarray(mmw),
    )

    n = 64
    rng = np.random.RandomState(2)
    d = jnp.asarray(10.0 ** rng.uniform(-1, 2, n))
    fh = cfg.HydrogenFractionByMass
    rhoH = fh * d
    # start mid-table in T
    T0 = 10.0 ** rng.uniform(5.0, 7.0, n)
    mu = 0.6
    e0 = jnp.asarray(T0) / ((cfg.Gamma - 1.0) * mu * us.utem)
    f = {"density": d, "energy": e0}

    dt = 1.0e-3
    e_new = exact_cool.exact_cool_step(
        cfg, prim, CloudyTable(grid_rank=0, grid_dimension=()),
        pr, us, f, dt, imetal=False,
    )

    # analytic: de/dt = edot/d; edot = -Lambda*rhoH^2 + Compton(T).
    # Compton is negligible next to Lambda = 1e-2 here; integrate the
    # constant-rate decay.
    rate = np.asarray(10.0 ** -2.0 * rhoH * rhoH / d)
    expected = np.asarray(e0) - rate * dt
    np.testing.assert_allclose(
        np.asarray(e_new), expected, rtol=2e-3
    )
    # energies strictly decreased
    assert np.all(np.asarray(e_new) < np.asarray(e0))


def _tab_setup(data_file, exact, n=256, metal=True, precision=64):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = 0
    cd.metal_cooling = 1 if metal else 0
    cd.dust_chemistry = 0
    cd.UVbackground = 0
    cd.exact_cooling = exact
    cd.precision = precision
    cd.grackle_data_file = data_file
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    assert cd.initialize() == 1
    rng = np.random.RandomState(9)
    fc = FluidContainer(cd, n)
    fc["density"][:] = 10.0 ** rng.uniform(-1, 2, n)
    if metal:
        fc["metal"][:] = 1.0e-3 * fc["density"]
    T = 10.0 ** rng.uniform(4.5, 7.5, n)
    fc["energy"][:] = T / cd.temperature_units / 0.6 / (cd.Gamma - 1.0)
    return cd, fc


@pytest.mark.parametrize("metal", [False, True])
def test_exact_vs_subcycled(data_file, metal):
    dt = 3.0e-5  # small: subcycled path takes a handful of accurate steps
    outs = {}
    for exact in (0, 1):
        cd, fc = _tab_setup(data_file, exact, metal=metal)
        fc.solve_chemistry(dt)
        outs[exact] = np.asarray(fc["energy"]).copy()
        e0 = None
    rel = np.abs(outs[1] - outs[0]) / np.abs(outs[0])
    # both approximate the same ODE; agreement limited by the subcycled
    # integrator's per-step error at this dt
    assert np.max(rel) < 2.0e-2, np.max(rel)
    assert np.median(rel) < 5.0e-3


def test_exact_large_dt_stable(data_file):
    """At a dt requiring hundreds of subcycles, the exact path must stay
    finite, monotone non-increasing, and above the table floor."""
    cd, fc = _tab_setup(data_file, exact=1)
    e0 = fc["energy"].copy()
    fc.solve_chemistry(0.3)
    e1 = np.asarray(fc["energy"])
    assert np.all(np.isfinite(e1))
    assert np.all(e1 <= e0 * (1 + 1e-12))
    assert np.all(e1 > 0)
    fc.calculate_temperature()
    assert np.all(fc["temperature"] >= cd.TemperatureStart * 0.99)


def test_exact_cooling_scope_validation(data_file):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = 1
    cd.exact_cooling = 1
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    with pytest.raises(ValueError, match="primordial_chemistry"):
        cd.initialize()

    cd2 = ChemistryData()
    cd2.use_grackle = 1
    cd2.with_radiative_cooling = 1
    cd2.primordial_chemistry = 0
    cd2.metal_cooling = 1
    cd2.UVbackground = 1
    cd2.exact_cooling = 1
    cd2.grackle_data_file = data_file
    cd2.density_units = mass_hydrogen_cgs
    cd2.length_units = 3.0857e21
    cd2.time_units = 3.1556952e13
    with pytest.raises(ValueError, match="cooling-only"):
        cd2.initialize()


def test_exact_one_shot_matches_refined_integration(data_file):
    """One exact step over dt must match a 200x-refined subcycled
    integration of the same interval to ~1e-5 — i.e. the closed-form
    step carries no visible integration error at a step size where it
    does the work of hundreds of subcycles.  (The refined reference
    shares the subcycled path's table conventions, so the residual
    median ~1e-5 reflects convention differences, not step error —
    the one-step subcycled run lands at the same distance.)"""
    dt = 2.0e-3
    n_truth = 200

    cd, fc = _tab_setup(data_file, exact=0, n=128)
    for _ in range(n_truth):
        fc.solve_chemistry(dt / n_truth)
    truth = np.asarray(fc["energy"]).copy()

    cd, fc = _tab_setup(data_file, exact=1, n=128)
    fc.solve_chemistry(dt)
    err = np.abs(np.asarray(fc["energy"]) - truth) / np.abs(truth)
    assert np.median(err) < 5.0e-5
    # fast coolers traverse many bins where the two schemes' table
    # conventions (half-step log-T lookups vs node power laws) diverge
    assert np.percentile(err, 90) < 5.0e-3
    assert np.max(err) < 5.0e-2  # floor-hitting cells: bin resolution
