"""Shared traced-scalar containers for the solve/cooling kernels."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..constants import GravConst, kboltz, mh, pi_val


def solver_dtype(cfg):
    """Field/solver dtype from the precision parameter (analogue of the
    gr_float compile-time choice, grackle_types.h:24-34)."""
    return jnp.float64 if cfg.precision == 64 else jnp.float32


def dtype_tiny8(dtype):
    """The reference's tiny8 = 1e-40 double floor
    (grackle_fortran_types.def); for float32 use 1e-37 (smallest normal is
    ~1.18e-38 and TPUs flush subnormals to zero)."""
    if dtype == jnp.float64:
        return 1.0e-40
    return 1.0e-37


def dtype_huge8(dtype):
    """huge8 = 1e40 (grackle_fortran_types.def); 1e37 for float32 where
    1e40 would overflow to inf."""
    if dtype == jnp.float64:
        return 1.0e40
    return 1.0e37


def dtype_tolerance(dtype):
    """Subcycle completion tolerance (solve_rate_cool_g.F:255-263):
    1e-10 for the double build, 1e-5 for the float build."""
    if dtype == jnp.float64:
        return 1.0e-10
    return 1.0e-5


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
    _lj_arg = (cfg.Gamma * pi_val * kboltz) / (GravConst * mh * dbase1)
    if isinstance(_lj_arg, (float, int)):
        # host path (python-float code units): true f64 — the argument
        # (~1e39 in cgs) exceeds the TPU backend's range-limited f64
        # emulation, so keep it off-device
        import math

        c_ljeans = math.sqrt(_lj_arg)
    else:
        c_ljeans = jnp.sqrt(_lj_arg)
    utem = units.temperature_units
    zr = 1.0 / (aye * uaye) - 1.0
    comp1 = tables.comp * (1.0 + zr) ** 4
    comp2 = 2.73 * (1.0 + zr)
    dt = solver_dtype(cfg)
    return UnitScalars(
        dom=jnp.asarray(dom, dt),
        coolunit=jnp.asarray(coolunit, dt),
        tbase1=jnp.asarray(tbase1, dt),
        xbase1=jnp.asarray(xbase1, dt),
        dbase1=jnp.asarray(dbase1, dt),
        uvel=jnp.asarray(uvel, dt),
        utem=jnp.asarray(utem, dt),
        chunit=jnp.asarray(chunit, dt),
        dx_cgs=jnp.asarray(dx_cgs, dt),
        c_ljeans=jnp.asarray(c_ljeans, dt),
        aye=jnp.asarray(aye, dt),
        zr=jnp.asarray(zr, dt),
        comp1=jnp.asarray(comp1, dt),
        comp2=jnp.asarray(comp2, dt),
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
