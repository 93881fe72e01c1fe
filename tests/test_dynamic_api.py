"""Dynamic parameter API tests.

Analogue of grackle: src/python/tests/test_dynamic_api.py:20-65 — every
registered parameter is gettable/settable by name with type enforcement,
and the registry matches the reference's names and defaults.
"""

import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.config import PARAMETER_REGISTRY


def test_every_parameter_accessible_by_name():
    cd = ChemistryData()
    for name, (ptype, default) in PARAMETER_REGISTRY.items():
        assert cd[name] == default, name
        if ptype is int:
            cd[name] = 1
            assert cd[name] == 1
        elif ptype is float:
            cd[name] = 2.5
            assert cd[name] == 2.5
        else:
            cd[name] = "foo"
            assert cd[name] == "foo"


def test_type_enforcement():
    cd = ChemistryData()
    cd["primordial_chemistry"] = 2.9  # coerced to int
    assert cd["primordial_chemistry"] == 2
    assert isinstance(cd["primordial_chemistry"], int)
    cd["Gamma"] = 2  # coerced to float
    assert isinstance(cd["Gamma"], float)


def test_unknown_parameter_rejected():
    cd = ChemistryData()
    with pytest.raises(AttributeError):
        cd.not_a_real_parameter = 1
    with pytest.raises(AttributeError):
        _ = cd.not_a_real_parameter


def test_reference_defaults():
    """Spot-check defaults against the reference registry
    (grackle_chemistry_data_fields.def)."""
    cd = ChemistryData()
    assert cd.Gamma == 5.0 / 3.0
    assert cd.NumberOfTemperatureBins == 600
    assert cd.TemperatureStart == 1.0
    assert cd.TemperatureEnd == 1.0e9
    assert cd.NumberOfDustTemperatureBins == 250
    assert cd.DustTemperatureStart == 1.0
    assert cd.DustTemperatureEnd == 1500.0
    assert cd.max_iterations == 10000
    assert cd.HydrogenFractionByMass == 0.76
    assert cd.DeuteriumToHydrogenRatio == 2.0 * 3.4e-5
    assert cd.SolarMetalFractionByMass == 0.01295
    assert cd.local_dust_to_gas_ratio == 0.009387
    assert cd.photoelectric_heating_rate == 8.5e-26
    assert cd.interstellar_radiation_field == 1.7
    assert cd.cloudy_electron_fraction_factor == 9.153959e-3
    assert cd.h2_charge_exchange_rate == 1
    assert cd.h2_dust_rate == 1
    assert cd.h2_h_cooling_rate == 1
    assert cd.CaseBRecombination == 0
    assert cd.cmb_temperature_floor == 1


def test_parameter_name_enumeration():
    """Name listing for serialization (dynamic_api.c:99-116)."""
    cd = ChemistryData()
    names = cd.parameter_names()
    assert "primordial_chemistry" in names
    assert "grackle_data_file" in names
    assert len(names) == len(PARAMETER_REGISTRY)


def test_derived_parameter_resolution():
    """photoelectric_heating/dust_recombination_cooling resolve at init
    (initialize_chemistry_data.c:71-105)."""
    from grackle_tpu.utilities.physical_constants import \
        mass_hydrogen_cgs
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.primordial_chemistry = 1
    cd.density_units = mass_hydrogen_cgs
    assert cd.photoelectric_heating == -1
    cd.initialize()
    assert cd.photoelectric_heating == 0


def test_rate_table_views():
    """pygrackle exposes k1..k58 + cooling coefficient tables as
    read-only NumPy views after initialize (grackle_wrapper.pyx:98-549);
    so does ChemistryData."""
    import numpy as np
    import pytest as _pytest

    from grackle_tpu.utilities.physical_constants import \
        mass_hydrogen_cgs

    cd = ChemistryData()
    cd.use_grackle = 1
    cd.primordial_chemistry = 2
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    with _pytest.raises(AttributeError):
        cd.k1  # only available after initialize
    cd.initialize()
    assert cd.k1.shape == (cd.NumberOfTemperatureBins,)
    assert np.all(np.isfinite(cd.ceHI))
    assert cd.h2dust.shape == (cd.NumberOfTemperatureBins,
                               cd.NumberOfDustTemperatureBins)
    with _pytest.raises(ValueError):
        cd.k1[0] = 1.0  # read-only
