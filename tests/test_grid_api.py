"""3-D grid solve with ghost zones (the reference's grid_start/grid_end
active-region convention, grackle: grackle_types.h:36-53)."""

import numpy as np

from grackle_tpu.api import ChemistryData, solve_chemistry_grid
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


def test_grid_ghost_zones_untouched():
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.primordial_chemistry = 1
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    cd.initialize()

    shape = (6, 6, 6)
    tiny = 1e-20
    rng = np.random.RandomState(9)
    fields = {
        "density": 10.0 ** rng.uniform(-1, 1, shape),
    }
    fields["HI"] = 0.5 * 0.76 * fields["density"]
    fields["HII"] = 0.5 * 0.76 * fields["density"]
    fields["HeI"] = 0.24 * fields["density"]
    fields["HeII"] = np.full(shape, tiny)
    fields["HeIII"] = np.full(shape, tiny)
    fields["de"] = fields["HII"].copy()
    fields["energy"] = np.full(shape, 1.0e-2)

    start = [1, 1, 1]
    end = [4, 4, 4]
    new_f, diag = solve_chemistry_grid(
        cd.context, fields, 1.0e-3, grid_start=start, grid_end=end
    )

    # ghost zones unchanged
    for name in ["HI", "HII", "energy"]:
        np.testing.assert_array_equal(new_f[name][0], fields[name][0])
        np.testing.assert_array_equal(new_f[name][5], fields[name][5])
    # active region evolved
    assert not np.allclose(new_f["HI"][1:5, 1:5, 1:5],
                           fields["HI"][1:5, 1:5, 1:5])

    # matches the flat solve of the same active region
    flat = {k: v[1:5, 1:5, 1:5].reshape(-1) for k, v in fields.items()}
    flat_out, _ = cd.solve_chemistry(flat, 1.0e-3)
    np.testing.assert_allclose(
        new_f["HI"][1:5, 1:5, 1:5].reshape(-1),
        np.asarray(flat_out["HI"]), rtol=1e-14,
    )
