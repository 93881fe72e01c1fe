"""Legacy ('old_style') 4/5-D Cloudy metal table support
(grackle: src/clib/cool1d_cloudy_old_tables_g.F)."""

import numpy as np
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.data.synthetic import make_synthetic_old_style_file
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


@pytest.mark.parametrize("rank", [4, 5])
def test_old_style_metal_cooling(tmp_path, rank):
    path = str(tmp_path / f"old_style_r{rank}.h5")
    make_synthetic_old_style_file(path, rank=rank)

    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = 1
    cd.metal_cooling = 1
    cd.grackle_data_file = path
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    assert cd.initialize() == 1
    assert cd.context.cloudy_data_new is False
    assert cd.context.cloudy_metal.grid_rank == rank

    n = 12
    results = {}
    for zfrac in [1e-6, 0.04]:
        fc = FluidContainer(cd, n)
        fc["density"][:] = 10.0
        fc["HII"][:] = 0.5 * 0.76 * fc["density"]
        fc["HI"][:] = 0.5 * 0.76 * fc["density"]
        fc["HeI"][:] = 0.24 * fc["density"]
        fc["HeII"][:] = 1e-20
        fc["HeIII"][:] = 1e-20
        fc["de"][:] = fc["HII"]
        fc["metal"][:] = zfrac * fc["density"]
        T = np.logspace(4.3, 6, n)
        fc.calculate_mean_molecular_weight()
        fc["energy"] = (T / cd.temperature_units / fc["mu"]
                        / (cd.Gamma - 1.0))
        fc.calculate_cooling_time()
        assert np.all(np.isfinite(fc["cooling_time"]))
        results[zfrac] = fc["cooling_time"].copy()
    # metal-enriched gas cools faster with the legacy tables too
    assert np.all(np.abs(results[0.04]) < np.abs(results[1e-6]))
