"""Parameter serialization round-trip (the dynamic API as the
serialization hook, grackle: src/clib/dynamic_api.c:89-95)."""

import numpy as np

from grackle_tpu import serialization
from grackle_tpu.api import ChemistryData
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


def test_round_trip(tmp_path):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.primordial_chemistry = 2
    cd.three_body_rate = 4
    cd.CaseBRecombination = 1
    cd.Gamma = 1.4
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    cd.initialize()

    path = str(tmp_path / "params.json")
    serialization.save(cd, path)
    cd2 = serialization.load(path)

    assert cd2.primordial_chemistry == 2
    assert cd2.three_body_rate == 4
    assert cd2.CaseBRecombination == 1
    assert cd2.Gamma == 1.4
    assert cd2.density_units == cd.density_units

    # restored context produces identical physics
    def run(c):
        fc = FluidContainer(c, 8)
        fc["density"][:] = 1.0
        fc["HI"][:] = 0.38
        fc["HII"][:] = 0.38
        fc["HeI"][:] = 0.24
        fc["HeII"][:] = 1e-20
        fc["HeIII"][:] = 1e-20
        fc["de"][:] = 0.38
        fc["HM"][:] = 1e-20
        fc["H2I"][:] = 1e-6
        fc["H2II"][:] = 1e-20
        fc["metal"][:] = 0.0
        fc["energy"][:] = 1.0e-4
        fc.solve_chemistry(1e-4)
        return fc["HI"]

    np.testing.assert_array_equal(run(cd), run(cd2))
