"""Shared traced-scalar containers for the solve/cooling kernels."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..constants import GravConst, kboltz, mh, pi_val


_US_FIELDS = [
    "dom", "coolunit", "tbase1", "xbase1", "dbase1", "uvel", "utem",
    "chunit", "dx_cgs", "c_ljeans", "aye", "zr", "comp1", "comp2",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=_US_FIELDS,
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class UnitScalars:
    """Traced per-call unit conversions (solve_rate_cool_g.F:331-343 and
    cool1d_multi_g.F:185-198)."""

    dom: Any
    coolunit: Any
    tbase1: Any
    xbase1: Any
    dbase1: Any
    uvel: Any
    utem: Any
    chunit: Any
    dx_cgs: Any
    c_ljeans: Any
    aye: Any
    zr: Any
    comp1: Any
    comp2: Any


def make_unit_scalars(cfg, tables, units, grid_dx=0.0):
    """Compute the solver's unit scalars from a CodeUnits instance.

    Mirrors solve_rate_cool_g.F:331-343; comp1/comp2 as in
    cool1d_multi_g.F:197-198.
    """
    aye = units.a_value
    utim = units.time_units
    uxyz = units.co_length_units
    uaye = units.a_units
    urho = units.co_density_units
    dom = urho * aye**3 / mh
    tbase1 = utim
    xbase1 = uxyz / (aye * uaye)
    dbase1 = urho * (aye * uaye) ** 3
    coolunit = (uaye**5 * xbase1**2 * mh**2) / (tbase1**3 * dbase1)
    uvel = (uxyz / aye) / utim
    # 1 eV per H2 formed (solve_rate_cool_g.F:337)
    chunit = 1.60218e-12 / (2.0 * uvel * uvel * mh)
    dx_cgs = grid_dx * xbase1
    c_ljeans = jnp.sqrt(
        (cfg.Gamma * pi_val * kboltz) / (GravConst * mh * dbase1)
    )
    utem = units.temperature_units
    zr = 1.0 / (aye * uaye) - 1.0
    comp1 = tables.comp * (1.0 + zr) ** 4
    comp2 = 2.73 * (1.0 + zr)
    return UnitScalars(
        dom=jnp.float64(dom),
        coolunit=jnp.float64(coolunit),
        tbase1=jnp.float64(tbase1),
        xbase1=jnp.float64(xbase1),
        dbase1=jnp.float64(dbase1),
        uvel=jnp.float64(uvel),
        utem=jnp.float64(utem),
        chunit=jnp.float64(chunit),
        dx_cgs=jnp.float64(dx_cgs),
        c_ljeans=jnp.float64(c_ljeans),
        aye=jnp.float64(aye),
        zr=jnp.float64(zr),
        comp1=comp1,
        comp2=jnp.float64(comp2),
    )


_PR_FIELDS = [
    "k24", "k25", "k26", "k27", "k28", "k29", "k30", "k31",
    "piHI", "piHeI", "piHeII", "crsHI", "crsHeI", "crsHeII",
    "comp_xray", "temp_xray",
]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=_PR_FIELDS,
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PhotoRates:
    """Per-call photo-ionization/heating scalars (analogue of
    photo_rate_storage, grackle: src/clib/grackle_chemistry_data.h:410-438).
    """

    k24: Any
    k25: Any
    k26: Any
    k27: Any
    k28: Any
    k29: Any
    k30: Any
    k31: Any
    piHI: Any
    piHeI: Any
    piHeII: Any
    crsHI: Any
    crsHeI: Any
    crsHeII: Any
    comp_xray: Any
    temp_xray: Any


def photo_rates_from_tables(tables) -> PhotoRates:
    """Copy the constant photo rates (solve_chemistry.c:120-137)."""
    return PhotoRates(**{f: getattr(tables, f) for f in _PR_FIELDS})
