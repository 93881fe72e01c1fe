"""The stiff (DI, DII) charge-exchange pair: exact coupled BE solve.

The reference updates DI and DII Jacobi-style — each species' scoef
reads the OTHER's pre-step value (solve_rate_cool_g.F:2313-2345).  When
the subcycle dt exceeds the k50/k51 charge-exchange time (no dt limiter
covers D, unlike de/HI/energy, solve_rate_cool_g.F:554-718), each BE
step hands nearly the whole D budget to the other species: the pair
flip-flops with subcycle parity instead of equilibrating, leaving an
O(1) error in the D ionization state.  ``deuterium_coupled_solve=1``
(the default) replaces it with the exact 2x2 linear BE solve, which is
unconditionally stable and lands on the coupled equilibrium; =0 keeps
the reference-parity Jacobi update.  tests/test_ode_reference.py checks
the end-to-end consequence (first-order convergence to a BDF reference
including the D species); this file isolates the mechanism.
"""

import numpy as np
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs

TINY = 1e-20


def make_chem(**kwargs):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 0  # isolate chemistry from cooling
    cd.primordial_chemistry = 3
    cd.precision = 64
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13  # 1 Myr
    for k, v in kwargs.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def neutral_d_state(cd, n=1):
    """Half-ionized H at 1e4 K with ALL deuterium neutral: far from the
    charge-exchange equilibrium DII/DI ~ HII/HI, with the H network
    itself near equilibrium so the de/HI limiters allow subcycles much
    longer than the D charge-exchange time."""
    d = np.ones(n)
    f = {"density": d}
    f["HI"] = 0.5 * 0.76 * d
    f["HII"] = 0.5 * 0.76 * d
    f["HeI"] = 0.24 * d
    f["HeII"] = np.full(n, TINY)
    f["HeIII"] = np.full(n, TINY)
    f["H2I"] = 1.0e-5 * 0.76 * d
    f["HM"] = np.full(n, TINY)
    f["H2II"] = np.full(n, TINY)
    f["DI"] = 2.0 * 3.4e-5 * d
    f["DII"] = np.full(n, TINY)
    f["HDI"] = np.full(n, TINY)
    f["de"] = f["HII"].copy()
    mu = 1.0 / (0.76 * 1.5 + 0.24 / 4.0)  # half-ionized H, neutral He
    f["energy"] = np.full(
        n, 1.0e4 / cd.temperature_units / mu / (cd.Gamma - 1.0)
    )
    return f


def charge_exchange_ratio(cd, f):
    """Equilibrium DII/DI from the dominant charge-exchange +
    recombination terms at the state's temperature."""
    import jax.numpy as jnp

    from grackle_tpu.api import _photo_rates
    from grackle_tpu.ops import chemistry_step as cs
    from grackle_tpu.ops.common import make_unit_scalars
    from grackle_tpu.ops.cooling import cool1d_multi

    ctx = cd._require_context()
    cfg, tables = ctx.config, ctx.tables
    us = make_unit_scalars(cfg, tables, ctx.units, 0.0)
    pr = _photo_rates(cfg, tables, ctx.uvb, ctx.units)
    fj = {k: jnp.asarray(np.asarray(v, dtype=np.float64))
          for k, v in f.items()}
    first = jnp.ones_like(fj["density"], dtype=bool)
    cool = cool1d_multi(
        cfg, tables, ctx.cloudy_primordial, ctx.cloudy_metal, pr, us,
        fj, jnp.zeros_like(fj["density"]), first, imetal=False,
        cloudy_data_new=ctx.cloudy_data_new,
    )
    rs = cs.lookup_cool_rates(
        cfg, tables, pr, us, fj, cool.tgas, cool.mmw, cool.tdust,
        cool.dust2gas, None, imetal=False,
    )
    k = {kk: np.asarray(v, dtype=np.float64) for kk, v in rs.k.items()}
    de, HI, HII = (np.asarray(fj[nm], dtype=np.float64)
                   for nm in ("de", "HI", "HII"))
    num = k["k1"] * de + k["k50"] * HII
    den = k["k2"] * de + k["k51"] * HI
    return num / den


def test_coupled_solve_reaches_equilibrium():
    """One call with dt >> the charge-exchange time must ionize D to the
    charge-exchange equilibrium ratio (it tracks HII/HI ~ 1)."""
    cd = make_chem()
    f = neutral_d_state(cd)
    dt = 0.1  # Myr; charge-exchange time ~ 1/(k51 nHI) ~ 1e-4 Myr
    new_f, diag = cd.solve_chemistry(dict(f), dt)
    assert bool(np.all(np.asarray(diag["converged"])))
    got = float(np.asarray(new_f["DII"])[0] / np.asarray(new_f["DI"])[0])
    want = float(charge_exchange_ratio(cd, new_f)[0])
    assert abs(got - want) / want < 0.05, (got, want)


def test_jacobi_mode_flip_flops():
    """The reference-parity mode reproduces the Jacobi artifact: with
    large subcycles the D budget oscillates with subcycle parity, so the
    endpoint sits far off the charge-exchange equilibrium.  (This test
    documents the reproduced reference behavior the default fixes; if
    the artifact disappears the parity mode is not doing the Jacobi
    update any more.)"""
    cd = make_chem(deuterium_coupled_solve=0)
    f = neutral_d_state(cd)
    new_f, diag = cd.solve_chemistry(dict(f), 0.1)
    assert bool(np.all(np.asarray(diag["converged"])))
    got = float(np.asarray(new_f["DII"])[0] / np.asarray(new_f["DI"])[0])
    want = float(charge_exchange_ratio(cd, new_f)[0])
    # off-equilibrium by more than 2x in one direction or the other
    assert got > 2.0 * want or got < 0.5 * want, (got, want)


def test_modes_agree_when_resolved():
    """With subcycles much shorter than the charge-exchange time the
    Jacobi update converges too; both modes must then agree (up to the
    O((dt/tau)^2) staging difference of one resolved step)."""
    cd1 = make_chem()
    cd0 = make_chem(deuterium_coupled_solve=0)
    f = neutral_d_state(cd1)
    dt = 2.0e-7  # Myr, ~2% of the D-pair relaxation time
    out1, _ = cd1.solve_chemistry(dict(f), dt)
    out0, _ = cd0.solve_chemistry(dict(f), dt)
    # the step moves DII from ~0 to ~2% of D — check both modes took
    # the same (resolved) step, not that one of them did nothing
    assert np.asarray(out0["DII"])[0] > 100.0 * TINY
    for nm in ("DI", "DII", "HDI"):
        a = np.asarray(out1[nm], dtype=np.float64)
        b = np.asarray(out0[nm], dtype=np.float64)
        assert np.allclose(a, b, rtol=1.0e-2), (nm, a, b)


@pytest.mark.parametrize("mode", [0, 1])
def test_total_deuterium_conserved(mode):
    """Both modes conserve total D through the exit renormalization
    (make_consistent, solve_rate_cool_g.F:2419-2534)."""
    cd = make_chem(deuterium_coupled_solve=mode)
    f = neutral_d_state(cd)
    new_f, _ = cd.solve_chemistry(dict(f), 0.1)
    total = (np.asarray(new_f["DI"]) + np.asarray(new_f["DII"])
             + 2.0 / 3.0 * np.asarray(new_f["HDI"]))
    want = (cd.HydrogenFractionByMass * cd.DeuteriumToHydrogenRatio
            * np.asarray(new_f["density"]))
    assert np.allclose(total, want, rtol=1.0e-12)
