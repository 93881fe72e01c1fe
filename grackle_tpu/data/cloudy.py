"""Cloudy cooling-table ingestion.

TPU-native rebuild of the reference's HDF5 table loader
(grackle: src/clib/initialize_cloudy_data.c:28-316).  Reads
``/CoolingRates/<group>/{Cooling,Heating,MMW}`` with ``Rank``/``Dimension``/
``Parameter1..N``/``Temperature`` attributes, log10s the data, shifts by
log10(CoolUnit) into code units, and uploads dense arrays to device HBM.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SMALL_LOG_VALUE = -99.0
CLOUDY_MAX_DIMENSION = 5


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["par1", "par2", "par3", "par4", "par5",
                 "cooling", "heating", "mmw"],
    meta_fields=["grid_rank", "grid_dimension"],
)
@dataclasses.dataclass(frozen=True)
class CloudyTable:
    """Device-resident Cloudy data (analogue of cloudy_data,
    grackle: src/clib/grackle_chemistry_data.h:183-207).

    grid_rank 0 means "not in use".  Parameter axes: the last axis is always
    log10(T); for rank 2 the first is log10(n_H); for rank 3 the middle is
    redshift.  Data arrays are stored in C order with parameter 1 slowest,
    matching the flattened layout the reference indexes
    (interpolators_g.F:83,150).
    """

    grid_rank: int
    grid_dimension: Tuple[int, ...]
    par1: Any = None
    par2: Any = None
    par3: Any = None
    par4: Any = None
    par5: Any = None
    cooling: Any = None
    heating: Any = None
    mmw: Any = None


def empty_cloudy_table() -> CloudyTable:
    return CloudyTable(grid_rank=0, grid_dimension=())


def _cool_unit(units) -> float:
    """CoolUnit as computed by the loader; NOTE the reference uses the
    truncated mh = 1.67e-24 here (initialize_cloudy_data.c:79-81), unlike
    the rest of the library.  Reproduced exactly for parity."""
    mh = 1.67e-24
    tbase1 = units.time_units
    xbase1 = units.co_length_units / (units.a_value * units.a_units)
    dbase1 = units.co_density_units * (units.a_value * units.a_units) ** 3
    return (units.a_units**5 * xbase1**2 * mh**2) / (tbase1**3 * dbase1)


def load_cloudy_table(
    filename: str,
    group_name: str,
    units,
    read_heating: bool,
    read_mmw: bool,
    dtype=jnp.float64,
) -> CloudyTable:
    """Read one Cloudy group ("Primordial" or "Metals") from a grackle data
    file (initialize_cloudy_data.c:83-315)."""
    import h5py

    with h5py.File(filename, "r") as f:
        dset = f[f"/CoolingRates/{group_name}/Cooling"]
        rank = int(np.asarray(dset.attrs["Rank"]).item())
        dims = tuple(
            int(x) for x in np.asarray(dset.attrs["Dimension"]).ravel()
        )
        if rank > CLOUDY_MAX_DIMENSION:
            raise ValueError(
                f"rank of Cloudy cooling data must be <= "
                f"{CLOUDY_MAX_DIMENSION}"
            )
        pars = []
        for q in range(rank):
            if q < rank - 1:
                p = np.asarray(dset.attrs[f"Parameter{q + 1}"],
                               dtype=np.float64)
            else:
                # temperature axis converted to log10
                # (initialize_cloudy_data.c:187-190)
                p = np.log10(
                    np.asarray(dset.attrs["Temperature"], dtype=np.float64)
                )
            pars.append(p)

        log_coolunit = np.log10(_cool_unit(units))

        def to_log_code_units(arr):
            arr = np.asarray(arr, dtype=np.float64).reshape(dims)
            out = np.where(
                arr > 0, np.log10(np.where(arr > 0, arr, 1.0)),
                SMALL_LOG_VALUE,
            )
            return out - log_coolunit

        cooling = to_log_code_units(dset[...])

        heating = None
        if read_heating:
            heating = to_log_code_units(
                f[f"/CoolingRates/{group_name}/Heating"][...]
            )

        mmw = None
        if read_mmw:
            mmw = np.asarray(
                f[f"/CoolingRates/{group_name}/MMW"][...], dtype=np.float64
            ).reshape(dims)

    kw = {}
    for i, p in enumerate(pars):
        kw[f"par{i + 1}"] = jnp.asarray(p, dtype=dtype)
    return CloudyTable(
        grid_rank=rank,
        grid_dimension=dims,
        cooling=jnp.asarray(cooling, dtype=dtype),
        heating=None if heating is None else jnp.asarray(heating,
                                                         dtype=dtype),
        mmw=None if mmw is None else jnp.asarray(mmw, dtype=dtype),
        **kw,
    )


def is_old_style(filename: str) -> bool:
    """Detect legacy 4/5-D tables via the file-level ``old_style``
    attribute (initialize_cloudy_data.c:92-96)."""
    import h5py

    with h5py.File(filename, "r") as f:
        return "old_style" in f.attrs
