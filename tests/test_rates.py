"""Rate-library tests.

Analogue of the reference's rate-table regression
(grackle: src/python/tests/test_initialisation.py:40-183): since the stored
answer files are not distributed, these tests verify (a) unit-scaling
exactness, (b) spot values of the analytic fits recomputed independently,
(c) table construction across every rate-option branch.
"""

import numpy as np
import pytest

import grackle_tpu as g
from grackle_tpu.rates import cooling_rates as cr
from grackle_tpu.rates import reactions as rx
from grackle_tpu.rates.tables import _logT_bins, build_rate_tables


def _cfg(**kw):
    return g.resolve_config(g.default_config(use_grackle=1, **kw))


UNITS = g.CodeUnits(
    density_units=1.67262171e-24,
    length_units=3.0857e21,
    time_units=3.1556952e13,
)

T_GRID = np.logspace(0.5, 8.9, 57)


RATE_FNS = [
    rx.k1_rate, rx.k2_rate, rx.k3_rate, rx.k4_rate, rx.k5_rate,
    rx.k6_rate, rx.k7_rate, rx.k8_rate, rx.k9_rate, rx.k10_rate,
    rx.k11_rate, rx.k12_rate, rx.k13_rate, rx.k14_rate, rx.k15_rate,
    rx.k16_rate, rx.k17_rate, rx.k18_rate, rx.k19_rate, rx.k21_rate,
    rx.k22_rate, rx.k23_rate, rx.k50_rate, rx.k51_rate, rx.k52_rate,
    rx.k53_rate, rx.k55_rate, rx.k56_rate, rx.k57_rate, rx.k58_rate,
    cr.ceHI_rate, cr.ceHeI_rate, cr.ceHeII_rate, cr.ciHI_rate,
    cr.ciHeI_rate, cr.ciHeIS_rate, cr.ciHeII_rate, cr.reHII_rate,
    cr.reHeII1_rate, cr.reHeII2_rate, cr.reHeIII_rate, cr.brem_rate,
    cr.GP99LowDensityLimit_rate, cr.GP99HighDensityLimit_rate,
    cr.GAHI_rate, cr.GAH2_rate, cr.GAHe_rate, cr.GAHp_rate,
    cr.GAel_rate, cr.H2LTE_rate, cr.HDlte_rate, cr.HDlow_rate,
    cr.cieco_rate, cr.gasGrain_rate, cr.regr_rate,
]


@pytest.mark.parametrize("fn", RATE_FNS, ids=lambda f: f.__name__)
def test_unit_scaling(fn):
    """k(T, u) == k(T, 1)/u wherever the rate is above its floor."""
    cfg = _cfg(primordial_chemistry=3)
    with np.errstate(all="ignore"):
        r1 = fn(T_GRID, 1.0, cfg)
        r2 = fn(T_GRID, 100.0, cfg)
    # exclude lanes floored at tiny in EITHER unit system
    mask = (r1 != 1e-20) & (r2 != 1e-20) & np.isfinite(r1) & (r1 != 0.0)
    assert mask.any()
    np.testing.assert_allclose(r2[mask], r1[mask] / 100.0, rtol=1e-12)


def test_k1_literature_value():
    # Abel et al. 1996 fit: heavily Boltzmann-suppressed at 1e4 K,
    # near-peak ~3e-8 cm^3/s at ~1e5 K
    cfg = _cfg()
    v4 = float(rx.k1_rate(np.array([1.0e4]), 1.0, cfg)[0])
    assert 1e-16 < v4 < 1e-15
    v5 = float(rx.k1_rate(np.array([1.0e5]), 1.0, cfg)[0])
    assert 1e-8 < v5 < 1e-7 or 1e-9 < v5 < 1e-8
    # rate rises steeply between 1e4 and 1e5 K
    assert v5 > 1e3 * v4
    # low-T floor
    assert float(rx.k1_rate(np.array([10.0]), 1.0, cfg)[0]) == 1e-20


def test_k2_case_b_switch():
    cfg_a = _cfg(CaseBRecombination=0)
    cfg_b = _cfg(CaseBRecombination=1)
    with np.errstate(all="ignore"):
        ka = rx.k2_rate(T_GRID, 1.0, cfg_a)
        kb = rx.k2_rate(T_GRID, 1.0, cfg_b)
    # case B must remove the direct-to-ground channel: kb < ka at 1e4 K
    i = np.argmin(np.abs(T_GRID - 1e4))
    assert kb[i] < ka[i]


def test_k13dd_structure():
    cfg = _cfg(primordial_chemistry=2)
    out = rx.k13dd_rate(np.array([1.0e3, 1.0e4]), 1.0, cfg)
    assert out.shape == (2, 14)
    # temperatures clamp at [500, 1e6]
    lo = rx.k13dd_rate(np.array([100.0]), 1.0, cfg)
    lo2 = rx.k13dd_rate(np.array([500.0]), 1.0, cfg)
    np.testing.assert_array_equal(lo, lo2)
    # unit shift applies only to the first coefficient of each idt block
    u = rx.k13dd_rate(np.array([1.0e3]), 10.0, cfg)
    n = rx.k13dd_rate(np.array([1.0e3]), 1.0, cfg)
    np.testing.assert_allclose(u[0, 0], n[0, 0] - 1.0, rtol=1e-13)
    np.testing.assert_allclose(u[0, 1:7], n[0, 1:7], rtol=0)


def test_cie_table_interpolation():
    # interior linear interpolation between table points + extrapolation
    from grackle_tpu.rates._cie_data import CIE_RATE, T_CIE
    mid = 0.5 * (T_CIE[10] + T_CIE[11])
    val = cr.cie_thin_cooling_rate(np.array([mid]))[0]
    lo, hi = CIE_RATE[10], CIE_RATE[11]
    assert min(lo, hi) <= val <= max(lo, hi)
    # low-T ~ T^4 extrapolation
    v1 = cr.cie_thin_cooling_rate(np.array([T_CIE[0] / 2]))[0]
    np.testing.assert_allclose(v1, CIE_RATE[0] / 16.0, rtol=1e-12)


@pytest.mark.parametrize("three_body", [0, 1, 2, 3, 4, 5])
def test_three_body_branches(three_body):
    """Every three_body_rate branch builds finite positive tables
    (mirrors test_initialisation.py parameter sets)."""
    cfg = _cfg(primordial_chemistry=3, three_body_rate=three_body)
    t = build_rate_tables(cfg, UNITS)
    for name in ["k13", "k22"]:
        arr = np.asarray(getattr(t, name))
        assert np.all(np.isfinite(arr)), name
        # exp(-5.2e4/T) underflows to exactly 0 at the low-T end of the
        # table, as in the reference's C evaluation
        assert np.all(arr >= 0), name
        assert np.any(arr > 0), name


@pytest.mark.parametrize("kwargs", [
    dict(CaseBRecombination=1),
    dict(h2_charge_exchange_rate=2),
    dict(h2_dust_rate=2, dust_chemistry=1, metal_cooling=1),
    dict(h2_h_cooling_rate=2),
    dict(collisional_excitation_rates=0, collisional_ionisation_rates=0),
    dict(recombination_cooling_rates=0, bremsstrahlung_cooling_rates=0),
    dict(photoelectric_heating=3),
])
def test_option_branches_build(kwargs):
    cfg = _cfg(primordial_chemistry=3, **kwargs)
    t = build_rate_tables(cfg, UNITS)
    assert np.all(np.isfinite(np.asarray(t.k1)))
    assert np.all(np.isfinite(np.asarray(t.h2dust)))


def test_table_grid():
    cfg = _cfg()
    bins = _logT_bins(600, 1.0, 1.0e9)
    assert bins.shape == (600,)
    np.testing.assert_allclose(bins[0], 1.0, rtol=1e-14)
    np.testing.assert_allclose(bins[-1], 1.0e9, rtol=1e-12)
    # exact log spacing
    ratios = bins[1:] / bins[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-12)


def test_kunit_consistency():
    """Chemistry tables are the cgs rates divided by kunit."""
    cfg = _cfg(primordial_chemistry=3)
    t = build_rate_tables(cfg, UNITS)
    bins = _logT_bins(600, 1.0, 1.0e9)
    with np.errstate(all="ignore"):
        k1_cgs = rx.k1_rate(bins, 1.0, cfg)
    expected = np.where(k1_cgs > 1e-20, k1_cgs / UNITS.kunit, None)
    sel = k1_cgs > 1e-19
    np.testing.assert_allclose(
        np.asarray(t.k1)[sel], k1_cgs[sel] / UNITS.kunit, rtol=1e-12
    )
