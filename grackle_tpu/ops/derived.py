"""Derived-field calculators: pressure, temperature, gamma, dust
temperature, cooling time.

TPU-native rebuild of the reference's per-field C drivers
(grackle: src/clib/calculate_pressure.c, calculate_temperature.c,
calculate_gamma.c, calculate_dust_temperature.c, calculate_cooling_time.c /
cool_multi_time_g.F) as pure batched functions over the flat cell axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import mh, tiny
from .cooling import cool1d_multi
from .dust_temp import calc_tdust_1d
from .lookup import lookup, table_index
from .tabulated_temp import tabulated_temperature

MU_METAL = 16.0
MINIMUM_TEMPERATURE = 1.0


def calculate_pressure(cfg, us, f, imetal: bool):
    """(calculate_pressure.c:31-128)"""
    d, e = f["density"], f["energy"]
    pressure = jnp.maximum((cfg.Gamma - 1.0) * d * e, tiny)

    if cfg.primordial_chemistry > 1:
        number_density = (
            0.25 * (f["HeI"] + f["HeII"] + f["HeIII"])
            + f["HI"] + f["HII"] + f["HM"] + f["de"]
        )
        nH2 = 0.5 * (f["H2I"] + f["H2II"])
        temp = jnp.maximum(
            us.utem * pressure / (number_density + nH2), 1.0
        )
        gamma_inv = 1.0 / (cfg.Gamma - 1.0)
        x = 6100.0 / temp
        gammaH2_inv_full = 0.5 * (
            5.0 + 2.0 * x**2 * jnp.exp(jnp.minimum(x, 10.0))
            / (jnp.exp(jnp.minimum(x, 10.0)) - 1.0) ** 2
        )
        gammaH2_inv = jnp.where(
            (nH2 / number_density > 1e-3) & (x < 10.0),
            gammaH2_inv_full,
            0.5 * 5.0,
        )
        gamma1 = 1.0 + (nH2 + number_density) / (
            nH2 * gammaH2_inv + number_density * gamma_inv
        )
        pressure = pressure * (gamma1 - 1.0) / (cfg.Gamma - 1.0)
    return pressure


def calculate_temperature(cfg, cloudy_prim, us, f, imetal: bool):
    """(calculate_temperature.c:64-148 for the species path;
    calc_temp_cloudy_g.F via tabulated_temperature for tabulated mode)"""
    if cfg.primordial_chemistry == 0:
        d = f["density"]
        metal = f["metal"] if imetal else jnp.zeros_like(d)
        rhoH = cfg.HydrogenFractionByMass * (
            (d - metal) if imetal else d
        )
        tgas, _ = tabulated_temperature(
            cloudy_prim, d, metal, f["energy"], rhoH, us.dom, us.zr,
            cfg.TemperatureStart, cfg.Gamma, us.utem, imetal,
            use_fused=cfg.use_fused_lookup == 1,
        )
        return tgas

    pressure = calculate_pressure(cfg, us, f, imetal)
    number_density = (
        0.25 * (f["HeI"] + f["HeII"] + f["HeIII"])
        + f["HI"] + f["HII"] + f["de"]
    )
    if cfg.primordial_chemistry > 1:
        number_density = number_density + (
            f["HM"] + 0.5 * (f["H2I"] + f["H2II"])
        )
    if imetal:
        number_density = number_density + f["metal"] / MU_METAL
    temperature = pressure * us.utem / jnp.maximum(number_density, tiny)
    return jnp.maximum(temperature, MINIMUM_TEMPERATURE)


def calculate_gamma(cfg, cloudy_prim, us, f, imetal: bool):
    """(calculate_gamma.c:38-124)"""
    d = f["density"]
    my_gamma = jnp.full_like(d, cfg.Gamma)
    if cfg.primordial_chemistry > 1:
        temperature = calculate_temperature(cfg, cloudy_prim, us, f,
                                            imetal)
        gamma_inv = 1.0 / (cfg.Gamma - 1.0)
        number_density = (
            0.25 * (f["HeI"] + f["HeII"] + f["HeIII"])
            + f["HI"] + f["HII"] + f["HM"] + f["de"]
        )
        nH2 = 0.5 * (f["H2I"] + f["H2II"])
        x = 6100.0 / temperature
        gammaH2_inv_full = 0.5 * (
            5.0 + 2.0 * x**2 * jnp.exp(jnp.minimum(x, 10.0))
            / (jnp.exp(jnp.minimum(x, 10.0)) - 1.0) ** 2
        )
        gammaH2_inv = jnp.where(
            (nH2 / number_density > 1e-3) & (x < 10.0),
            gammaH2_inv_full,
            0.5 * 5.0,
        )
        my_gamma = 1.0 + (nH2 + number_density) / (
            nH2 * gammaH2_inv + number_density * gamma_inv
        )
    return my_gamma


def calculate_dust_temperature(cfg, tables, cloudy_prim, us, f, units,
                               imetal: bool):
    """(calculate_dust_temperature.c:55-141 + calc_tdust_3d_g.F:60-186)"""
    d = f["density"]
    temperature = calculate_temperature(cfg, cloudy_prim, us, f, imetal)

    if cfg.use_isrf_field > 0:
        myisrf = f["isrf_habing"]
    else:
        myisrf = jnp.full_like(d, cfg.interstellar_radiation_field)

    if cfg.primordial_chemistry == 0:
        # Tabulated mode has no species fields; use the H mass fraction
        # of the metal-free density, the same convention the in-solve
        # dust path uses (cool1d_multi_g.F:688-705 tabulated branch).
        # The reference's standalone calculator reads the HI/HII
        # pointers unconditionally (calc_tdust_3d_g.F:138-141), which a
        # tabulated-mode host never allocates — a latent crash this
        # rebuild fixes rather than mirrors.
        fh = cfg.HydrogenFractionByMass
        nh = fh * (d - f["metal"]) if imetal else fh * d
    else:
        nh = f["HI"] + f["HII"]
        if cfg.primordial_chemistry > 1:
            nh = nh + f["H2I"] + f["H2II"]
    # NOTE: densities here are not converted to proper, so urho and not
    # dom (calc_tdust_3d_g.F:143-145)
    nh = nh * units.co_density_units / mh

    ti = table_index(
        jnp.log(temperature), cfg.NumberOfTemperatureBins,
        cfg.TemperatureStart, cfg.TemperatureEnd,
    )
    gasgr = lookup(tables.gas_grain, ti)
    gasgr = gasgr * cfg.local_dust_to_gas_ratio * us.coolunit / mh

    trad = 2.73 * (1.0 + us.zr)
    return calc_tdust_1d(
        temperature, nh, gasgr, tables.gamma_isrf, myisrf,
        jnp.ones(d.shape, dtype=bool), trad,
    )


def calculate_cooling_time(
    cfg, tables, cloudy_prim, cloudy_met, pr, us, f,
    imetal: bool, cloudy_data_new: bool = True, comoving: bool = False,
):
    """One cooling-rate pass; cooltime = energy / edot
    (cool_multi_time_g.F:292-299).  Densities are scaled comoving->proper
    for the rate evaluation when requested (cool_multi_time_g.F drivers
    handle this via scale_fields in the reference solver)."""
    from .solver import scale_fields

    if comoving:
        f = scale_fields(cfg, dict(f), us.aye**-3, imetal)

    zeros = jnp.zeros_like(f["density"])
    cool = cool1d_multi(
        cfg, tables, cloudy_prim, cloudy_met, pr, us, f,
        zeros, jnp.bool_(True), imetal, cloudy_data_new,
    )
    energy = jnp.maximum(cool.p2d / (cfg.Gamma - 1.0), tiny)
    return energy / cool.edot
