"""Synthetic grackle-format data files.

The real Cloudy/UVB data files (e.g. CloudyData_UVB=HM2012.h5) are
distributed separately (grackle: grackle_data_files submodule).  This module
writes physically-plausible synthetic files with the exact HDF5 schema the
loaders expect (grackle: src/clib/initialize_cloudy_data.c:100-206,
initialize_UVbackground_data.c:55-272), for tests and benchmarks run without
the data distribution.

The primordial cooling/MMW tables are generated from the analytic
collisional-ionization-equilibrium model (utilities/primordial_equilibrium),
so the tabulated mode reproduces real physics; metal cooling is a smooth
Λ_Z(T) bump; UVB rates follow an HM2012-like redshift history.
"""

from __future__ import annotations

import numpy as np

from ..utilities import primordial_equilibrium as peq


def _primordial_tables(log_nh, zgrid, log_T):
    """Λ/n_H^2 [erg cm^3 / s], heating, and mu on the (n_H, z, T) grid."""
    nh = 10.0**log_nh
    T = 10.0**log_T
    n_nh, n_z, n_T = len(log_nh), len(zgrid), len(log_T)
    cool = np.zeros((n_nh, n_z, n_T))
    heat = np.zeros((n_nh, n_z, n_T))
    mmw = np.zeros((n_nh, n_z, n_T))
    Y = 0.24
    # neutral-gas limits where the equilibrium formulas underflow (low T)
    y_he = Y / (4 - 4 * Y)  # n_He / n_H
    mu_neutral = (1.0 + 4.0 * y_he) / (1.0 + y_he)
    for i, nhi in enumerate(nh):
        with np.errstate(all="ignore"):
            lam = peq.total_cooling(T, nhi) / nhi**2  # erg cm^3/s
            # equilibrium mean molecular weight
            ntot = (peq.nHI(T, nhi) + peq.nHII(T, nhi)
                    + peq.nHeI(T, nhi, Y=Y) + peq.nHeII(T, nhi, Y=Y)
                    + peq.nHeIII(T, nhi, Y=Y) + peq.ne(T, nhi, Y=Y))
            rho_over_mh = nhi + 4.0 * (
                peq.nHeI(T, nhi, Y=Y) + peq.nHeII(T, nhi, Y=Y)
                + peq.nHeIII(T, nhi, Y=Y)
            )
            mu = rho_over_mh / ntot
        mu = np.where(np.isfinite(mu), mu, mu_neutral)
        mu = np.clip(mu, 0.5, mu_neutral)
        lam = np.where(np.isfinite(lam) & (lam > 0), lam, 1.0e-40)
        # keep a tiny low-T floor so log10 is finite
        lam = np.maximum(lam, 1.0e-40)
        for j, z in enumerate(zgrid):
            # weak redshift dependence stands in for the UVB's effect
            fz = 1.0 + 0.05 * np.log1p(z)
            cool[i, j, :] = lam * fz
            heat[i, j, :] = 1.0e-26 * np.exp(-T / 1.0e5) / (1.0 + nhi) \
                * fz
            mmw[i, j, :] = mu
    return cool, heat, mmw


def _metal_tables(log_nh, zgrid, log_T):
    """Smooth metal-cooling bump peaking near 2e5 K (solar Z)."""
    nh = 10.0**log_nh
    T = 10.0**log_T
    n_nh, n_z, n_T = len(log_nh), len(zgrid), len(log_T)
    cool = np.zeros((n_nh, n_z, n_T))
    heat = np.zeros((n_nh, n_z, n_T))
    lam_z = (
        3.0e-22 * np.exp(-0.5 * ((np.log10(T) - 5.3) / 0.7) ** 2)
        + 1.0e-23 * (T / 1.0e7) ** 0.5 * (T > 1.0e6)
        + 1.0e-26 * (T / 1.0e4) ** 2 / (1.0 + (T / 1.0e4) ** 2)
    )
    for i, nhi in enumerate(nh):
        for j, z in enumerate(zgrid):
            fz = 1.0 / (1.0 + 0.1 * z)
            cool[i, j, :] = lam_z * fz + 1.0e-30
            heat[i, j, :] = 5.0e-27 * np.exp(-T / 2.0e4) * fz + 1.0e-32
    return cool, heat


def _write_group(f, group, cool, heat, mmw, log_nh, zgrid, log_T):
    grp = f.create_group(f"CoolingRates/{group}") \
        if f"CoolingRates/{group}" not in f else f[f"CoolingRates/{group}"]
    for name, data in [("Cooling", cool), ("Heating", heat),
                       ("MMW", mmw)]:
        if data is None:
            continue
        ds = grp.create_dataset(name, data=data)
        ds.attrs["Rank"] = np.int64(3)
        ds.attrs["Dimension"] = np.array(data.shape, dtype=np.int64)
        ds.attrs["Parameter1"] = np.asarray(log_nh, dtype=np.float64)
        ds.attrs["Parameter2"] = np.asarray(zgrid, dtype=np.float64)
        ds.attrs["Temperature"] = 10.0 ** np.asarray(log_T,
                                                     dtype=np.float64)


def make_synthetic_old_style_file(path, rank=4):
    """Write a legacy ('old_style') metal-cooling file with a rank-4
    (n_H, logZ, e_frac, T) or rank-5 (+z) Metals table
    (grackle: src/clib/cool1d_cloudy_old_tables_g.F,
    initialize_cloudy_data.c:92-96)."""
    import h5py

    log_nh = np.linspace(-6.0, 4.0, 11)
    log_z = np.linspace(-4.0, 0.5, 7)
    e_frac = np.linspace(-6.0, 0.0, 5)  # log10 electron fraction
    zgrid = np.linspace(0.0, 8.0, 5)
    log_T = np.linspace(1.0, 9.0, 81)
    T = 10.0**log_T

    # amplitude exaggerated so tests see a clear metallicity response
    lam = 2.0e-21 * np.exp(-0.5 * ((np.log10(T) - 5.3) / 0.8) ** 2) \
        + 1.0e-24
    # old-style tables carry metallicity as a table axis (no external
    # scaling), so the synthetic cooling must grow with log_Z
    zscale = 10.0 ** log_z
    if rank == 4:
        dims = (len(log_nh), len(log_z), len(e_frac), len(log_T))
        cool = (lam[None, None, None, :]
                * zscale[None, :, None, None]
                + 1.0e-27) * np.ones(dims)
        heat = np.broadcast_to(1e-27 * np.exp(-T / 3e4) + 1e-32,
                               dims).copy()
        pars = [("Parameter1", log_nh), ("Parameter2", log_z),
                ("Parameter3", e_frac)]
    else:
        dims = (len(log_nh), len(log_z), len(e_frac), len(zgrid),
                len(log_T))
        cool = (lam[None, None, None, None, :]
                * zscale[None, :, None, None, None]
                + 1.0e-27) * np.ones(dims)
        heat = np.broadcast_to(1e-27 * np.exp(-T / 3e4) + 1e-32,
                               dims).copy()
        pars = [("Parameter1", log_nh), ("Parameter2", log_z),
                ("Parameter3", e_frac), ("Parameter4", zgrid)]

    with h5py.File(path, "w") as f:
        f.attrs["old_style"] = np.int64(1)
        grp = f.create_group("CoolingRates/Metals")
        for name, data in [("Cooling", cool), ("Heating", heat)]:
            ds = grp.create_dataset(name, data=data)
            ds.attrs["Rank"] = np.int64(rank)
            ds.attrs["Dimension"] = np.array(dims, dtype=np.int64)
            for pname, pvals in pars:
                ds.attrs[pname] = np.asarray(pvals, dtype=np.float64)
            ds.attrs["Temperature"] = 10.0 ** np.asarray(
                log_T, dtype=np.float64)
    return path


def make_synthetic_data_file(
    path,
    n_density=25,
    n_redshift=10,
    n_temperature=121,
    z_max=10.0,
):
    """Write a synthetic new-style grackle data file (Cloudy + UVB)."""
    import h5py

    log_nh = np.linspace(-10.0, 4.0, n_density)
    zgrid = np.linspace(0.0, z_max, n_redshift)
    log_T = np.linspace(1.0, 9.0, n_temperature)

    p_cool, p_heat, p_mmw = _primordial_tables(log_nh, zgrid, log_T)
    m_cool, m_heat = _metal_tables(log_nh, zgrid, log_T)

    with h5py.File(path, "w") as f:
        _write_group(f, "Primordial", p_cool, p_heat, p_mmw,
                     log_nh, zgrid, log_T)
        _write_group(f, "Metals", m_cool, m_heat, None,
                     log_nh, zgrid, log_T)

        # --- UVB rates: HM2012-like history peaking near z ~ 2 ---
        uvb = f.create_group("UVBRates")
        uvb.create_dataset(
            "Info", data=np.bytes_("synthetic UVB for grackle_tpu tests")
        )
        zu = np.linspace(0.0, z_max, 60)
        shape = np.exp(-((zu - 2.0) ** 2) / 8.0) + 0.05
        uvb.create_dataset("z", data=zu)
        chem = uvb.create_group("Chemistry")
        chem.create_dataset("k24", data=2.4e-13 * shape)   # 1/s
        chem.create_dataset("k25", data=1.2e-14 * shape)
        chem.create_dataset("k26", data=1.3e-13 * shape)
        chem.create_dataset("k27", data=5.0e-10 * shape)
        chem.create_dataset("k28", data=1.0e-10 * shape)
        chem.create_dataset("k29", data=8.0e-14 * shape)
        chem.create_dataset("k30", data=2.0e-13 * shape)
        chem.create_dataset("k31", data=1.0e-12 * shape)
        ph = uvb.create_group("Photoheating")
        # stored as eV/s per atom (update_UVbackground_rates.c:198-199);
        # roughly <E> ~ 4 eV per ionization
        ph.create_dataset("piHI", data=4.0 * 2.4e-13 * shape)
        ph.create_dataset("piHeI", data=4.5 * 1.3e-13 * shape)
        ph.create_dataset("piHeII", data=7.0 * 1.2e-14 * shape)
        crs = uvb.create_group("CrossSections")
        crs.create_dataset("hi_avg_crs", data=2.49e-18 * (1.0 + 0 * zu))
        crs.create_dataset("hei_avg_crs", data=4.4e-18 * (1.0 + 0 * zu))
        crs.create_dataset("heii_avg_crs", data=1.6e-18 * (1.0 + 0 * zu))
    return path
