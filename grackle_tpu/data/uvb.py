"""UV background tables: ingestion and per-call redshift interpolation.

TPU-native rebuild of the reference's UVB machinery:
* loader for ``/UVBRates/*`` (grackle:
  src/clib/initialize_UVbackground_data.c:27-320),
* per-call piecewise log-log interpolation in (1+z) with the tanh ramp
  (grackle: src/clib/update_UVbackground_rates.c:25-289), implemented in
  jnp so the whole solve stays inside one jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.common import PhotoRates

_UVB_RATE_NAMES = [
    "k24", "k25", "k26", "k27", "k28", "k29", "k30", "k31",
    "piHI", "piHeI", "piHeII", "crsHI", "crsHeI", "crsHeII",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["z"] + _UVB_RATE_NAMES,
    meta_fields=["info"],
)
@dataclasses.dataclass(frozen=True)
class UVBTable:
    """Analogue of UVBtable (grackle_chemistry_data.h:213-241)."""

    info: str
    z: Any = None
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


def load_uvb_table(filename: str, cfg, dtype=jnp.float64) -> UVBTable:
    """Read /UVBRates datasets (initialize_UVbackground_data.c:55-272).

    Missing higher-network rates (k27-k31) are required only when
    primordial_chemistry > 1; cross-sections only when
    self_shielding_method > 0 — matching the reference's conditional reads.
    """
    import h5py

    vals = {}
    with h5py.File(filename, "r") as f:
        try:
            info = f["/UVBRates/Info"][()]
            if isinstance(info, bytes):
                info = info.decode()
        except Exception:
            info = ""
        vals["z"] = np.asarray(f["/UVBRates/z"][...], dtype=np.float64)
        for k in ["k24", "k25", "k26"]:
            vals[k] = np.asarray(
                f[f"/UVBRates/Chemistry/{k}"][...], dtype=np.float64
            )
        if cfg.primordial_chemistry > 1:
            for k in ["k27", "k28", "k29", "k30", "k31"]:
                vals[k] = np.asarray(
                    f[f"/UVBRates/Chemistry/{k}"][...], dtype=np.float64
                )
        for k in ["piHI", "piHeII", "piHeI"]:
            vals[k] = np.asarray(
                f[f"/UVBRates/Photoheating/{k}"][...], dtype=np.float64
            )
        if cfg.self_shielding_method > 0:
            names = {
                "crsHI": "hi_avg_crs",
                "crsHeII": "heii_avg_crs",
                "crsHeI": "hei_avg_crs",
            }
            for k, d in names.items():
                vals[k] = np.asarray(
                    f[f"/UVBRates/CrossSections/{d}"][...], dtype=np.float64
                )

    kw = {k: jnp.asarray(v, dtype=dtype) for k, v in vals.items()}
    for name in _UVB_RATE_NAMES:
        kw.setdefault(name, None)
    return UVBTable(info=info, **kw)


def uvb_redshift_bounds(cfg, uvb: UVBTable):
    """Derive the default on/off redshifts from the table extent the way
    pygrackle's initialize does when the user leaves them unset: on/fullon
    at the table maximum, drop/off at the minimum."""
    zmax = float(np.asarray(uvb.z).max())
    zmin = float(np.asarray(uvb.z).min())
    updates = {}
    if cfg.UVbackground_redshift_on <= -99998.0:
        updates["UVbackground_redshift_on"] = zmax
    if cfg.UVbackground_redshift_fullon <= -99998.0:
        updates["UVbackground_redshift_fullon"] = zmax
    if cfg.UVbackground_redshift_drop <= -99998.0:
        updates["UVbackground_redshift_drop"] = zmin
    if cfg.UVbackground_redshift_off <= -99998.0:
        updates["UVbackground_redshift_off"] = zmin
    return updates


def _loglog_z_interp(table, zvec, idx, redshift_grad, zvec_grad):
    """Piecewise power-law interpolation in (1+z)
    (update_UVbackground_rates.c:80-96)."""
    lo = table[idx - 1]
    hi = table[idx]
    slope = jnp.log(hi / lo) / zvec_grad
    return jnp.exp(redshift_grad * slope + jnp.log(lo))


def update_uvb_rates(cfg, uvb: UVBTable, units) -> PhotoRates:
    """Compute the per-call photo rates (update_UVbackground_rates.c:25-289).

    Everything is traced jnp scalar math so this lives inside the solve jit;
    redshift enters through ``units.a_value``.
    """
    from ..ops.common import solver_dtype

    dtype = solver_dtype(cfg)
    zero = jnp.zeros((), dtype)
    out = {name: zero for name in
           ["k24", "k25", "k26", "k27", "k28", "k29", "k30", "k31",
            "piHI", "piHeI", "piHeII", "crsHI", "crsHeI", "crsHeII",
            "comp_xray", "temp_xray"]}

    # In tabulated mode the UVB enters only through the Cloudy heating
    # data; the photo rates stay zero
    # (update_UVbackground_rates.c:32-34).
    if cfg.primordial_chemistry == 0:
        return PhotoRates(**out)

    redshift = 1.0 / (units.a_value * units.a_units) - 1.0
    active = jnp.logical_and(
        redshift >= cfg.UVbackground_redshift_off,
        redshift <= cfg.UVbackground_redshift_on,
    )

    # tanh ramp (update_UVbackground_rates.c:47-63)
    ramp_on = 0.5 - 0.5 * jnp.tanh(
        15.0 * (redshift - 0.5 * (cfg.UVbackground_redshift_on
                                  + cfg.UVbackground_redshift_fullon))
    )
    ramp_off = 0.5 - 0.5 * jnp.tanh(
        15.0 * (0.5 * (cfg.UVbackground_redshift_drop
                       + cfg.UVbackground_redshift_off) - redshift)
    )
    ramp = jnp.where(
        redshift > cfg.UVbackground_redshift_fullon,
        ramp_on,
        jnp.where(redshift < cfg.UVbackground_redshift_drop,
                  ramp_off, 1.0),
    )
    ramp = jnp.where(active, ramp, 0.0)

    # redshift bracket (update_UVbackground_rates.c:69-78): first index
    # with zvec[index] >= redshift, clipped to [1, Nz-1]
    zvec = uvb.z
    nz = zvec.shape[0]
    idx = jnp.clip(
        jnp.searchsorted(zvec, redshift, side="left"), 1, nz - 1
    )
    zvec_grad = jnp.log((1.0 + zvec[idx]) / (1.0 + zvec[idx - 1]))
    redshift_grad = jnp.log((1.0 + redshift) / (1.0 + zvec[idx - 1]))

    def zinterp(table):
        return _loglog_z_interp(table, zvec, idx, redshift_grad, zvec_grad)

    names = ["k24", "k25", "k26", "piHI", "piHeII", "piHeI"]
    if cfg.primordial_chemistry > 1:
        names += ["k27", "k28", "k29", "k30", "k31"]
    if cfg.self_shielding_method > 0:
        names += ["crsHI", "crsHeI", "crsHeII"]
    for name in names:
        out[name] = zinterp(getattr(uvb, name))

    # unit conversion (update_UVbackground_rates.c:191-218): photo rates
    # to 1/code-time; heating rates from eV/s to code cooling units.
    tbase1 = units.time_units
    xbase1 = units.co_length_units / (units.a_value * units.a_units)
    dbase1 = units.co_density_units * (units.a_value * units.a_units) ** 3
    ev2erg = 1.60217653e-12
    mh_uvb = 1.67262171e-24
    cooling_units = (
        units.a_units**5 * xbase1**2 * mh_uvb**2
    ) / (tbase1**3 * dbase1) / ev2erg

    for k in ["k24", "k25", "k26", "k27", "k28", "k29", "k30", "k31"]:
        out[k] = out[k] * units.time_units * ramp
    for k in ["piHI", "piHeII", "piHeI"]:
        out[k] = out[k] / cooling_units * ramp

    # LW background override (update_UVbackground_rates.c:241-256)
    if cfg.LWbackground_intensity > 0.0:
        out["k31"] = jnp.asarray(
            1.38e-12 * cfg.LWbackground_intensity * units.time_units,
            dtype,
        )
    if cfg.LWbackground_sawtooth_suppression:
        out["k31"] = out["k31"] * (0.1 + 0.9 * ramp)

    # Compton X-ray heating (update_UVbackground_rates.c:260-285)
    if cfg.Compton_xray_heating:
        z_cut = 5.0
        out["comp_xray"] = (
            4.15e-13 * 3.0e10
            * (31.8 * (1.0 + redshift) ** 0.3333 / 511.0)
            * (6.3e-5 * 1.6e-12)
            * (1.0 + redshift) ** 4
            * jnp.exp(-((redshift / z_cut) ** 2))
            / cooling_units
        )
        out["temp_xray"] = (
            31.8e3 * (1.0 + redshift) ** 0.3333 * 1.6e-12
            / (4.0 * 1.38e-16)
            * 6.3e-5 * (1.0 + redshift) ** 4
            * jnp.exp(-((redshift / z_cut) ** 2))
            / (0.256 * (1.0 + redshift))
        )

    # Outside [redshift_off, redshift_on] the reference returns before
    # computing anything, leaving every rate zero
    # (update_UVbackground_rates.c:36-41).
    out = {k: jnp.where(active, v, 0.0).astype(dtype)
           for k, v in out.items()}

    return PhotoRates(**out)
