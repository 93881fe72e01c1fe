"""Executed coverage for grackle_tpu.yt_fields via a mocked yt surface.

The reference exercises its yt integration through the yt_grackle example
(src/python/pygrackle/yt_fields.py:78-206, tests/test_examples.py:43-104).
yt is not installed in this image, so this module stubs the minimal yt
surface the integration touches — a dataset with Enzo-style parameters,
unit quantities, ``add_field`` registration, and chunked field access —
and asserts the parameter translation, field registration, electron-mass
scaling, and derived-field computation all actually run and are correct
against the direct FluidContainer path.
"""

import sys
import types

import numpy as np
import pytest

from grackle_tpu.data.synthetic import make_synthetic_data_file
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "synthetic_cloudy.h5"
    return str(make_synthetic_data_file(path))


# ---------------------------------------------------------------------------
# Minimal fake yt / unyt surface
# ---------------------------------------------------------------------------

LENGTH_CGS = 3.0857e21       # 1 kpc
TIME_CGS = 3.1556952e13     # 1 Myr
DENSITY_CGS = mass_hydrogen_cgs
MASS_CGS = DENSITY_CGS * LENGTH_CGS ** 3
VELOCITY_CGS = LENGTH_CGS / TIME_CGS

# cgs value of 1 of each unit expression yt_fields passes to ds.quan()
_UNIT_CGS = {
    "": 1.0,
    "K": 1.0,
    "code_time": TIME_CGS,
    "code_velocity": VELOCITY_CGS,
    "code_velocity**2": VELOCITY_CGS ** 2,
    "code_mass / code_length**3": DENSITY_CGS,
    "code_mass * code_velocity**2 / code_length**3":
        DENSITY_CGS * VELOCITY_CGS ** 2,
    "erg/s": 1.0,
    "g/cm**3": 1.0,
}


class FakeQuantity:
    """unyt_quantity stand-in: a scalar with a unit tag and cgs algebra."""

    # make ndarray * FakeQuantity defer to __rmul__ (like unyt does)
    __array_priority__ = 100.0

    def __init__(self, value, units=""):
        self.value = float(value)
        self.units = units

    @property
    def d(self):
        return self.value

    def in_cgs(self):
        return self

    def __mul__(self, other):
        if isinstance(other, FakeQuantity):
            return FakeQuantity(self.value * other.value)
        return self.value * other

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, FakeQuantity):
            return FakeQuantity(self.value / other.value)
        return FakeQuantity(self.value / other)

    def __pow__(self, n):
        return FakeQuantity(self.value ** n)

    def __float__(self):
        return self.value

    def __str__(self):
        return f"{self.value} {self.units}"


class FakeYTArray(np.ndarray):
    """unyt_array stand-in: data is stored in code units; .to() asserts
    the requested units are what the stored data already is in."""

    def __new__(cls, arr, units=""):
        obj = np.asarray(arr, dtype=np.float64).view(cls)
        obj.units = units
        return obj

    def __array_finalize__(self, obj):
        if obj is not None:
            self.units = getattr(obj, "units", "")

    def to(self, units):
        assert units == self.units, (
            f"field stored in {self.units!r}, requested {units!r}"
        )
        return self


class FakeFieldInfo:
    def __init__(self, name):
        self.name = name


class FakeDataset:
    def __init__(self, parameters, current_redshift=0.0,
                 cosmological_simulation=0):
        self.parameters = dict(parameters)
        self.current_redshift = current_redshift
        self.cosmological_simulation = cosmological_simulation
        self.mass_unit = FakeQuantity(MASS_CGS, "g")
        self.length_unit = FakeQuantity(LENGTH_CGS, "cm")
        self.time_unit = FakeQuantity(TIME_CGS, "s")
        self.field_list = []
        self.derived_fields = {}

    def add_field(self, name, function=None, units="", sampling_type=None):
        assert sampling_type == "cell"
        self.derived_fields[name] = (function, units)

    def quan(self, value, units):
        return FakeQuantity(value * _UNIT_CGS[units], "cgs")

    def arr(self, arr, units):
        return FakeYTArray(arr, units)


class FakeDataChunk(dict):
    """A yt data-chunk stand-in: tuple-keyed field dict + .ds backlink."""

    def __init__(self, ds, shape):
        super().__init__()
        self.ds = ds
        self.ActiveDimensions = shape
        self[("index", "ones")] = np.ones(shape)


class FakeFieldDetector(FakeDataChunk):
    """Mimics yt.fields.field_detector.FieldDetector (isinstance check
    at yt_fields._grackle_field: detection passes must not compute)."""


@pytest.fixture()
def fake_yt(monkeypatch):
    """Install a stub 'yt' package exposing FieldDetector."""
    yt_mod = types.ModuleType("yt")
    fields_mod = types.ModuleType("yt.fields")
    detector_mod = types.ModuleType("yt.fields.field_detector")
    detector_mod.FieldDetector = FakeFieldDetector
    fields_mod.field_detector = detector_mod
    yt_mod.fields = fields_mod
    monkeypatch.setitem(sys.modules, "yt", yt_mod)
    monkeypatch.setitem(sys.modules, "yt.fields", fields_mod)
    monkeypatch.setitem(sys.modules, "yt.fields.field_detector",
                        detector_mod)
    return yt_mod


# ---------------------------------------------------------------------------
# Dataset construction helpers
# ---------------------------------------------------------------------------

def _make_ds(data_file, chem=1):
    # Enzo-style dataset parameters, translated by _ENZO_PARAMETER_MAP
    return FakeDataset({
        "MultiSpecies": chem,
        "MetalCooling": 1,
        "with_radiative_cooling": 1,
        "grackle_data_file": data_file,
        "Gamma": 5.0 / 3.0,
        "UVbackground": 0,
        "CMBTemperatureFloor": 1,
    })


def _fill_chunk(data, shape, seed=7):
    """Populate a fake chunk with a physical 6-species state
    (code units)."""
    rng = np.random.RandomState(seed)
    n = int(np.prod(shape))
    dens = 10.0 ** rng.uniform(-1, 2, n).reshape(shape)
    rho_u = "code_mass / code_length**3"
    data[("gas", "density")] = FakeYTArray(dens, rho_u)
    data[("gas", "H_p0_density")] = FakeYTArray(0.38 * dens, rho_u)
    data[("gas", "H_p1_density")] = FakeYTArray(0.38 * dens, rho_u)
    data[("gas", "He_p0_density")] = FakeYTArray(0.24 * dens, rho_u)
    data[("gas", "He_p1_density")] = FakeYTArray(1e-20 * dens, rho_u)
    data[("gas", "He_p2_density")] = FakeYTArray(1e-20 * dens, rho_u)
    # yt stores TRUE electron mass density; grackle wants it scaled by
    # mp/me (yt_fields.py:141-144 in the reference)
    me_over_mp = 9.10938215e-28 / 1.67262171e-24
    data[("gas", "El_density")] = FakeYTArray(
        0.38 * dens * me_over_mp, rho_u)
    data[("gas", "total_metal_density")] = FakeYTArray(
        1.0e-3 * dens, rho_u)
    for ax in "xyz":
        data[("gas", f"velocity_{ax}")] = FakeYTArray(
            np.zeros(shape), "code_velocity")
    T = 10.0 ** rng.uniform(4.0, 6.0, n).reshape(shape)
    # e = T / (T_units * mu * (gamma - 1)); mu ~ 0.6 ionized — the exact
    # value only sets the state, not the correctness comparison
    t_units = 1.67262171e-24 * VELOCITY_CGS ** 2 / 1.3806504e-16
    e = T / t_units / 0.6 / (5.0 / 3.0 - 1.0)
    data[("gas", "specific_thermal_energy")] = FakeYTArray(
        e, "code_velocity**2")
    return data


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_require_yt_raises_without_yt():
    from grackle_tpu import yt_fields
    try:
        import yt  # noqa: F401
        pytest.skip("real yt installed; the ImportError path is moot")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="yt is required"):
        yt_fields._require_yt()


def test_prepare_grackle_data_translates_parameters(fake_yt, data_file):
    from grackle_tpu import yt_fields

    ds = _make_ds(data_file, chem=2)
    yt_fields.prepare_grackle_data(ds)

    cd = ds.grackle_data
    assert cd.use_grackle == 1
    assert cd.primordial_chemistry == 2          # from MultiSpecies
    assert cd.metal_cooling == 1                 # from MetalCooling
    assert cd.cmb_temperature_floor == 1         # from CMBTemperatureFloor
    assert cd.grackle_data_file == data_file
    assert cd.comoving_coordinates == 0
    np.testing.assert_allclose(cd.density_units, DENSITY_CGS, rtol=1e-12)
    np.testing.assert_allclose(cd.length_units, LENGTH_CGS, rtol=1e-12)
    np.testing.assert_allclose(cd.time_units, TIME_CGS, rtol=1e-12)
    # initialize() ran: the context exists and rate tables are built
    assert cd.context is not None


def test_prepare_grackle_data_parameter_overrides(fake_yt, data_file):
    from grackle_tpu import yt_fields

    ds = _make_ds(data_file, chem=1)
    yt_fields.prepare_grackle_data(
        ds, parameters={"primordial_chemistry": 3})
    assert ds.grackle_data.primordial_chemistry == 3


def test_add_grackle_fields_registers_all(fake_yt, data_file):
    from grackle_tpu import yt_fields

    ds = _make_ds(data_file)
    yt_fields.add_grackle_fields(ds)

    assert ("gas", "total_metal_density") in ds.derived_fields
    for fname in ("cooling_time", "dust_temperature", "gamma",
                  "mean_molecular_weight", "pressure", "temperature"):
        key = ("gas", f"grackle_{fname}")
        assert key in ds.derived_fields, key
        func, units = ds.derived_fields[key]
        assert callable(func)


def test_grackle_field_matches_direct_fluid_container(fake_yt, data_file):
    """The registered grackle_temperature / grackle_pressure fields must
    equal the direct FluidContainer calculation on the same state, with
    the cgs unit factor applied and the chunk shape restored."""
    from grackle_tpu import yt_fields

    shape = (4, 3, 2)
    ds = _make_ds(data_file)
    yt_fields.add_grackle_fields(ds)
    data = _fill_chunk(FakeDataChunk(ds, shape), shape)

    # direct path: same state through FluidContainer
    n = int(np.prod(shape))
    fc = FluidContainer(ds.grackle_data, n)
    for gfield in ("density", "HI", "HII", "HeI", "HeII", "HeIII",
                   "metal", "energy"):
        yname, units = yt_fields._FIELD_MAP[gfield]
        fc[gfield][:] = np.asarray(data[yname]).ravel()
    fc["de"][:] = (np.asarray(data[("gas", "El_density")]).ravel()
                   * yt_fields._MP_OVER_ME)

    fc.calculate_temperature()
    func, _ = ds.derived_fields[("gas", "grackle_temperature")]
    out = func(FakeFieldInfo(("gas", "grackle_temperature")), data)
    assert out.shape == shape
    np.testing.assert_allclose(
        np.asarray(out).ravel(), np.asarray(fc["temperature"]),
        rtol=1e-12)

    fc.calculate_pressure()
    func, _ = ds.derived_fields[("gas", "grackle_pressure")]
    out = func(FakeFieldInfo(("gas", "grackle_pressure")), data)
    # field returns cgs: code pressure x (rho_u * v_u^2)
    np.testing.assert_allclose(
        np.asarray(out).ravel(),
        np.asarray(fc["pressure"]) * DENSITY_CGS * VELOCITY_CGS ** 2,
        rtol=1e-12)


def test_grackle_field_electron_scaling_executes(fake_yt, data_file):
    """_data_to_fc applies the mp/me electron scaling (the El_density
    convention difference between yt and grackle)."""
    from grackle_tpu import yt_fields

    shape = (8,)
    ds = _make_ds(data_file)
    yt_fields.prepare_grackle_data(ds)
    data = _fill_chunk(FakeDataChunk(ds, shape), shape)
    fc = yt_fields._data_to_fc(data)
    np.testing.assert_allclose(
        np.asarray(fc["de"]),
        np.asarray(data[("gas", "El_density")]) * yt_fields._MP_OVER_ME,
        rtol=1e-12)


def test_grackle_field_detector_skips_computation(fake_yt, data_file):
    """On a FieldDetector chunk, _grackle_field must not run the solver
    (the reference isinstance check, yt_fields.py:197-199)."""
    from grackle_tpu import yt_fields

    shape = (2, 2, 2)
    ds = _make_ds(data_file)
    yt_fields.add_grackle_fields(ds)
    data = _fill_chunk(FakeFieldDetector(ds, shape), shape)
    func, _ = ds.derived_fields[("gas", "grackle_temperature")]
    out = func(FakeFieldInfo(("gas", "grackle_temperature")), data)
    # detection pass: the untouched FluidContainer temperature (zeros)
    assert out.shape == shape
    np.testing.assert_array_equal(np.asarray(out), np.zeros(shape))


def test_total_metal_density_sums_enzo_fields(fake_yt, data_file):
    from grackle_tpu import yt_fields

    shape = (5,)
    ds = _make_ds(data_file)
    ds.field_list = [("enzo", "Metal_Density"), ("enzo", "SN_Colour")]
    data = FakeDataChunk(ds, shape)
    data[("enzo", "Metal_Density")] = FakeYTArray(
        np.full(shape, 2.0), "code_mass / code_length**3")
    data[("enzo", "SN_Colour")] = FakeYTArray(
        np.full(shape, 3.0), "code_mass / code_length**3")
    out = yt_fields._total_metal_density(None, data)
    np.testing.assert_allclose(np.asarray(out), 5.0)


def test_grackle_field_requires_initialization(fake_yt, data_file):
    from grackle_tpu import yt_fields

    ds = _make_ds(data_file)
    data = _fill_chunk(FakeDataChunk(ds, (4,)), (4,))
    with pytest.raises(RuntimeError, match="not been initialized"):
        yt_fields._grackle_field(
            FakeFieldInfo(("gas", "grackle_temperature")), data)
