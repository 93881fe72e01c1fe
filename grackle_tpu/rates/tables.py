"""Rate-table construction.

TPU-native analogue of the reference's rate-table initialization
(grackle: src/clib/initialize_rates.c:213-472).  All ~70 analytic rates are
evaluated on a log-spaced temperature grid once at initialization on the
host (NumPy, float64), then uploaded to device HBM as one ``RateTables``
pytree.  On-device lookups are vectorized gathers + linear interpolation
(grackle: src/clib/solve_rate_cool_g.F:1206-1323).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import cooling_rates as cr
from . import reactions as rx


def _logT_bins(n_bins: int, t_start: float, t_end: float) -> np.ndarray:
    """Log-spaced temperature bin centers
    (grackle: initialize_rates.c:99-104,136-145)."""
    logT_start = np.log(t_start)
    d_logT = (np.log(t_end) - logT_start) / (n_bins - 1)
    return np.exp(logT_start + np.arange(n_bins) * d_logT)


_ARRAY_FIELDS = [
    # chemistry rates (kunit)
    "k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9", "k10",
    "k11", "k12", "k13", "k14", "k15", "k16", "k17", "k18", "k19",
    "k20", "k23",
    # three-body (kunit_3bdy)
    "k21", "k22",
    # deuterium
    "k50", "k51", "k52", "k53", "k54", "k55", "k56",
    # H ionization
    "k57", "k58",
    # H2 formation heating terms
    "n_cr_n", "n_cr_d1", "n_cr_d2",
    # 2-D / multi-coefficient tables
    "k13dd", "h2dust",
    # cooling tables (coolingUnits)
    "ceHI", "ceHeI", "ceHeII", "ciHeIS", "ciHI", "ciHeI", "ciHeII",
    "reHII", "reHeII1", "reHeII2", "reHeIII", "brem",
    "vibh", "hyd01k", "h2k01", "rotl", "roth",
    "GP99LowDensityLimit", "GP99HighDensityLimit",
    "GAHI", "GAH2", "GAHe", "GAHp", "GAel", "H2LTE",
    "HDlte", "HDlow", "cieco",
    "gas_grain", "regr",
]

# rank of the log-space SVD factorization of the 2-D h2dust table used by
# the fused lookup path (max relative reconstruction error ~2e-9 at 16).
# precision=64 uses rank 24, which reaches the f64 log/exp round-trip
# floor (~7e-13 max) so the factorization is no longer the f64 mode's
# accuracy limiter; f32 keeps 16 (8 fewer chem-conv columns, and 2e-9
# is far below f32's own per-step noise).
H2DUST_RANK = 16


def h2dust_rank(cfg):
    """SVD rank for this config's h2dust factorization (see above)."""
    return 24 if cfg.precision == 64 else H2DUST_RANK

# Column layout of the stacked lookup matrices. The solver does two
# lookup rounds per subcycle at different temperature indices — the
# cooling tables at the half-step log-T (cool1d_multi_g.F:353) and the
# chemistry rates at the full-step log-T (solve_rate_cool_g.F:1211) — so
# the tables are stacked into two separate matrices and each lookup round
# (one two-hot matmul on the MXU, see ops/lookup.py) only pays for its
# own columns.
def active_cool_columns(cfg):
    """Cooling-table columns actually read by cool1d_multi for this
    config — the stacked matrix carries only these, so the per-subcycle
    lookup matmul scales with the enabled physics."""
    cols = []
    if cfg.primordial_chemistry > 0:
        cols += ["ceHI", "ceHeI", "ceHeII", "ciHeIS", "ciHI", "ciHeI",
                 "ciHeII", "reHII", "reHeII1", "reHeII2", "reHeIII",
                 "brem"]
    if cfg.primordial_chemistry > 1:
        variant = cfg.h2_cooling_variant
        if variant == 0:
            cols += ["GAHI", "GAH2", "GAHe", "GAHp", "GAel", "H2LTE"]
        elif variant == 1:
            cols += ["GP99LowDensityLimit", "GP99HighDensityLimit"]
        else:
            cols += ["hyd01k", "h2k01", "vibh", "roth", "rotl"]
        if cfg.cie_cooling == 1:
            cols += ["cieco"]
    if cfg.primordial_chemistry > 2:
        cols += ["HDlte", "HDlow"]
    anydust = (cfg.h2_on_dust > 0) or (cfg.dust_chemistry > 0) or (
        cfg.dust_recombination_cooling > 0)
    if anydust:
        cols += ["gas_grain"]
    if (cfg.dust_chemistry > 0) or (cfg.dust_recombination_cooling > 0):
        cols += ["regr"]
    return tuple(cols)


def active_chem_columns(cfg):
    """Chemistry-rate columns read by lookup_cool_rates for this config."""
    cols = []
    if cfg.primordial_chemistry > 0:
        cols += ["k1", "k2", "k3", "k4", "k5", "k6", "k57", "k58"]
    if cfg.primordial_chemistry > 1:
        cols += ["k7", "k8", "k9", "k10", "k11", "k12", "k13", "k14",
                 "k15", "k16", "k17", "k18", "k19", "k22",
                 "n_cr_n", "n_cr_d1", "n_cr_d2"]
        if cfg.three_body_rate == 0:
            cols += [f"k13dd_{i}" for i in range(14)]
    if cfg.primordial_chemistry > 2:
        cols += ["k50", "k51", "k52", "k53", "k54", "k55", "k56"]
    if (cfg.h2_on_dust > 0) or (cfg.dust_chemistry > 0):
        cols += [f"h2dust_u{i}" for i in range(h2dust_rank(cfg))]
    return tuple(cols)

_SCALAR_FIELDS = [
    "comp", "gammah", "gamma_isrf",
    # constant photo-rates (set by the LW background or left zero; the
    # UVB-interpolated values are computed per call, see data/uvb.py)
    "k24", "k25", "k26", "k27", "k28", "k29", "k30", "k31",
    "piHI", "piHeI", "piHeII",
    "crsHI", "crsHeI", "crsHeII",
    "comp_xray", "temp_xray",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(_ARRAY_FIELDS + _SCALAR_FIELDS
                 + ["stacked_cool", "stacked_chem", "h2dust_v",
                    "split_cool_pair", "split_chem_pair",
                    "split_h2dust_v_pair", "split_h2limit_pair"]),
    meta_fields=["cool_cols", "chem_cols"],
)
@dataclasses.dataclass(frozen=True)
class RateTables:
    """Device-resident rate tables (analogue of chemistry_data_storage,
    grackle: src/clib/grackle_chemistry_data.h:246-404)."""

    # populated dynamically; see _ARRAY_FIELDS/_SCALAR_FIELDS
    stacked_cool: Any = None  # (n_bins, K) matrix, cols = cool_cols
    stacked_chem: Any = None  # (n_bins, K) matrix, cols = chem_cols
    h2dust_v: Any = None  # (n_dust_bins, rank) log-SVD factor
    # f64 mode only: precomputed double-f32 splits of the pair matrices
    # (ops/lookup.py SplitTable) so the subcycle loop body never carries
    # the table split/pair math (emulated-f64 reductions that XLA's LICM
    # does not hoist)
    split_cool_pair: Any = None
    split_chem_pair: Any = None
    split_h2dust_v_pair: Any = None
    split_h2limit_pair: Any = None  # pair of stacked (k13, k22)
    cool_cols: Any = ()  # active cooling column names (static)
    chem_cols: Any = ()  # active chemistry column names (static)
    k1: Any = None
    k2: Any = None
    k3: Any = None
    k4: Any = None
    k5: Any = None
    k6: Any = None
    k7: Any = None
    k8: Any = None
    k9: Any = None
    k10: Any = None
    k11: Any = None
    k12: Any = None
    k13: Any = None
    k14: Any = None
    k15: Any = None
    k16: Any = None
    k17: Any = None
    k18: Any = None
    k19: Any = None
    k20: Any = None
    k23: Any = None
    k21: Any = None
    k22: Any = None
    k50: Any = None
    k51: Any = None
    k52: Any = None
    k53: Any = None
    k54: Any = None
    k55: Any = None
    k56: Any = None
    k57: Any = None
    k58: Any = None
    n_cr_n: Any = None
    n_cr_d1: Any = None
    n_cr_d2: Any = None
    k13dd: Any = None
    h2dust: Any = None
    ceHI: Any = None
    ceHeI: Any = None
    ceHeII: Any = None
    ciHeIS: Any = None
    ciHI: Any = None
    ciHeI: Any = None
    ciHeII: Any = None
    reHII: Any = None
    reHeII1: Any = None
    reHeII2: Any = None
    reHeIII: Any = None
    brem: Any = None
    vibh: Any = None
    hyd01k: Any = None
    h2k01: Any = None
    rotl: Any = None
    roth: Any = None
    GP99LowDensityLimit: Any = None
    GP99HighDensityLimit: Any = None
    GAHI: Any = None
    GAH2: Any = None
    GAHe: Any = None
    GAHp: Any = None
    GAel: Any = None
    H2LTE: Any = None
    HDlte: Any = None
    HDlow: Any = None
    cieco: Any = None
    gas_grain: Any = None
    regr: Any = None
    comp: Any = None
    gammah: Any = None
    gamma_isrf: Any = None
    k24: Any = None
    k25: Any = None
    k26: Any = None
    k27: Any = None
    k28: Any = None
    k29: Any = None
    k30: Any = None
    k31: Any = None
    piHI: Any = None
    piHeI: Any = None
    piHeII: Any = None
    crsHI: Any = None
    crsHeI: Any = None
    crsHeII: Any = None
    comp_xray: Any = None
    temp_xray: Any = None


_CHEM_RATE_FNS = {
    "k1": rx.k1_rate, "k2": rx.k2_rate, "k3": rx.k3_rate, "k4": rx.k4_rate,
    "k5": rx.k5_rate, "k6": rx.k6_rate, "k7": rx.k7_rate, "k8": rx.k8_rate,
    "k9": rx.k9_rate, "k10": rx.k10_rate, "k11": rx.k11_rate,
    "k12": rx.k12_rate, "k13": rx.k13_rate, "k14": rx.k14_rate,
    "k15": rx.k15_rate, "k16": rx.k16_rate, "k17": rx.k17_rate,
    "k18": rx.k18_rate, "k19": rx.k19_rate, "k20": rx.k20_rate,
    "k23": rx.k23_rate,
    "k50": rx.k50_rate, "k51": rx.k51_rate, "k52": rx.k52_rate,
    "k53": rx.k53_rate, "k54": rx.k54_rate, "k55": rx.k55_rate,
    "k56": rx.k56_rate, "k57": rx.k57_rate, "k58": rx.k58_rate,
    "n_cr_n": rx.n_cr_n_rate, "n_cr_d1": rx.n_cr_d1_rate,
    "n_cr_d2": rx.n_cr_d2_rate,
}

_COOLING_RATE_FNS = {
    "ceHI": cr.ceHI_rate, "ceHeI": cr.ceHeI_rate, "ceHeII": cr.ceHeII_rate,
    "ciHeIS": cr.ciHeIS_rate, "ciHI": cr.ciHI_rate, "ciHeI": cr.ciHeI_rate,
    "ciHeII": cr.ciHeII_rate,
    "reHII": cr.reHII_rate, "reHeII1": cr.reHeII1_rate,
    "reHeII2": cr.reHeII2_rate, "reHeIII": cr.reHeIII_rate,
    "brem": cr.brem_rate,
    "vibh": cr.vibh_rate, "hyd01k": cr.hyd01k_rate, "h2k01": cr.h2k01_rate,
    "rotl": cr.rotl_rate, "roth": cr.roth_rate,
    "GP99LowDensityLimit": cr.GP99LowDensityLimit_rate,
    "GP99HighDensityLimit": cr.GP99HighDensityLimit_rate,
    "GAHI": cr.GAHI_rate, "GAH2": cr.GAH2_rate, "GAHe": cr.GAHe_rate,
    "GAHp": cr.GAHp_rate, "GAel": cr.GAel_rate, "H2LTE": cr.H2LTE_rate,
    "HDlte": cr.HDlte_rate, "HDlow": cr.HDlow_rate, "cieco": cr.cieco_rate,
    "gas_grain": cr.gasGrain_rate, "regr": cr.regr_rate,
}


def build_rate_tables(cfg, units, dtype=jnp.float64) -> RateTables:
    """Compute all rate tables for a config + unit system.

    Mirrors initialize_rates (grackle: src/clib/initialize_rates.c:213-472):
    chemistry rates scaled by kUnit (kUnit_3Bdy for 3-body), cooling rates by
    coolingUnits; h2dust is a 2-D (T_gas, T_dust) table; k13dd is the
    14-coefficient Martin+96 table.
    """
    n = cfg.NumberOfTemperatureBins
    T = _logT_bins(n, cfg.TemperatureStart, cfg.TemperatureEnd)
    T_dust = _logT_bins(
        cfg.NumberOfDustTemperatureBins,
        cfg.DustTemperatureStart,
        cfg.DustTemperatureEnd,
    )

    kunit = units.kunit
    kunit_3bdy = units.kunit_3bdy
    coolunit = units.coolunit

    vals = {}
    # Overflow in the unselected branch of a two-sided fit (np.where) is
    # expected and discarded; suppress the warnings.
    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        for name, fn in _CHEM_RATE_FNS.items():
            vals[name] = fn(T, kunit, cfg)
        vals["k21"] = rx.k21_rate(T, kunit_3bdy, cfg)
        vals["k22"] = rx.k22_rate(T, kunit_3bdy, cfg)
        vals["k13dd"] = rx.k13dd_rate(T, kunit, cfg)
        # h2dust: shape (n_T, n_Tdust) (initialize_rates.c:182-210)
        vals["h2dust"] = rx.h2dust_rate(
            T[:, None], T_dust[None, :], kunit, cfg
        )
        for name, fn in _COOLING_RATE_FNS.items():
            vals[name] = fn(T, coolunit, cfg)

    vals["comp"] = cr.comp_rate(coolunit, cfg)
    vals["gammah"] = cr.gammah_rate(coolunit, cfg)
    vals["gamma_isrf"] = cr.gamma_isrf_rate(coolunit, cfg)

    # Constant photo-rates default to zero; the LW background sets k31
    # (grackle: update_UVbackground_rates.c:241-243).
    for name in ["k24", "k25", "k26", "k27", "k28", "k29", "k30", "k31",
                 "piHI", "piHeI", "piHeII", "crsHI", "crsHeI", "crsHeII",
                 "comp_xray", "temp_xray"]:
        vals[name] = 0.0
    if cfg.LWbackground_intensity > 0.0:
        vals["k31"] = (1.38e-12 * cfg.LWbackground_intensity
                       * units.time_units)

    out = {}
    for name in _ARRAY_FIELDS:
        out[name] = jnp.asarray(vals[name], dtype=dtype)
    for name in _SCALAR_FIELDS:
        out[name] = jnp.asarray(vals[name], dtype=dtype)

    # Log-space SVD factorization of the 2-D h2dust table: the fused path
    # evaluates h2dust as 10**sum_r u_r(T) v_r(T_dust) — a handful of 1-D
    # lookups instead of a (n_bins x n_dust_bins) contraction per subcycle.
    logH = np.log10(np.maximum(vals["h2dust"], 1e-300))
    U, sv, Vt = np.linalg.svd(logH, full_matrices=False)
    r = h2dust_rank(cfg)
    h2dust_u = U[:, :r] * sv[:r]
    h2dust_v = Vt[:r].T
    for i in range(r):
        vals[f"h2dust_u{i}"] = h2dust_u[:, i]
    out["h2dust_v"] = jnp.asarray(h2dust_v, dtype=dtype)

    # stacked (n_bins, K) lookup matrices for the fused two-hot path;
    # only the columns this config's physics actually reads
    def _stack(names):
        cols = []
        for name in names:
            if name.startswith("k13dd_"):
                cols.append(vals["k13dd"][:, int(name.split("_")[1])])
            elif name.startswith("h2dust_u"):
                cols.append(vals[name])
            else:
                cols.append(vals[name])
        if not cols:
            return jnp.zeros((n, 1), dtype=dtype)
        return jnp.asarray(np.stack(cols, axis=1), dtype=dtype)

    cool_cols = active_cool_columns(cfg)
    chem_cols = active_chem_columns(cfg)
    out["stacked_cool"] = _stack(cool_cols)
    out["stacked_chem"] = _stack(chem_cols)
    out["cool_cols"] = cool_cols
    out["chem_cols"] = chem_cols

    if dtype == jnp.float64:
        # precision=64: precompute the double-f32 splits of every pair
        # matrix the fused lookups fetch per subcycle, so the loop body
        # contains only the one-hot contraction + f64 lerp (the split
        # itself is table math XLA's LICM won't hoist out of the loop)
        from ..ops.lookup import pair_split

        out["split_cool_pair"] = pair_split(out["stacked_cool"])
        out["split_chem_pair"] = pair_split(out["stacked_chem"])
        if out["h2dust_v"] is not None:
            out["split_h2dust_v_pair"] = pair_split(out["h2dust_v"])
        if cfg.primordial_chemistry > 1:
            # the H2-equilibrium limiter's bracketing (k13, k22) fetch
            # (ops/solver.py _h2_limit_value)
            out["split_h2limit_pair"] = pair_split(
                jnp.asarray(
                    np.stack([vals["k13"], vals["k22"]], axis=1),
                    dtype=dtype,
                )
            )
    return RateTables(**out)
