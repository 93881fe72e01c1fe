"""H2 self-shielding, UVB self-shielding, and radiative-transfer coupling
tests (solve_rate_cool_g.F:1382-1676 and the RT hooks)."""

import numpy as np
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.data.synthetic import make_synthetic_data_file
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "synthetic_cloudy.h5"
    return str(make_synthetic_data_file(path))


def make_chem(**kwargs):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = 2
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in kwargs.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def fill(fc, T0=1.0e3, density=1.0e4, h2_frac=1e-3):
    tiny = 1e-20
    fc["density"][:] = density
    fc["HI"][:] = 0.76 * fc["density"] * (1 - h2_frac)
    fc["HII"][:] = tiny
    fc["HeI"][:] = 0.24 * fc["density"]
    fc["HeII"][:] = tiny
    fc["HeIII"][:] = tiny
    fc["de"][:] = tiny
    if "HM" in fc:
        fc["HM"][:] = tiny
        fc["H2I"][:] = 0.76 * h2_frac * fc["density"]
        fc["H2II"][:] = tiny
    fc["metal"][:] = 0.0
    fc.calculate_mean_molecular_weight()
    cd = fc.chemistry_data
    fc["energy"] = T0 / cd.temperature_units / fc["mu"] / (cd.Gamma - 1)
    return fc


def _solve_h2(cd, n=8, grid_shape=None, extra=None):
    fc = FluidContainer(cd, n)
    fill(fc)
    if extra:
        for k, v in extra.items():
            fc[k if k in fc else k] = v
    fields = fc._solver_fields()
    if extra:
        fields.update(extra)
    new_f, _ = cd.solve_chemistry(fields, 1.0e-5,
                                  grid_dx=0.1, grid_shape=grid_shape)
    return np.asarray(new_f["H2I"])


def test_h2_self_shielding_reduces_dissociation():
    """With a strong LW background, shielding preserves more H2 than the
    unshielded solve (Jeans-length option 3)."""
    h2 = {}
    for shield in [0, 3]:
        cd = make_chem(LWbackground_intensity=1.0e3,
                       H2_self_shielding=shield)
        h2[shield] = _solve_h2(cd)
    assert np.all(h2[3] > h2[0])


def test_h2_self_shielding_option1_requires_3d():
    cd = make_chem(LWbackground_intensity=1.0e3, H2_self_shielding=1)
    fc = FluidContainer(cd, 8)
    fill(fc)
    with pytest.raises(ValueError):
        cd.solve_chemistry(fc._solver_fields(), 1.0e-5)
    # works with a 3-D grid shape
    h2 = _solve_h2(cd, n=8, grid_shape=(2, 2, 2))
    assert np.all(np.isfinite(h2))


def test_h2_self_shielding_option2_user_length():
    cd = make_chem(LWbackground_intensity=1.0e3, H2_self_shielding=2)
    fc = FluidContainer(cd, 8)
    fill(fc)
    fc["H2_self_shielding_length"][:] = 1.0e-3
    h2_short = _solve_h2(cd, extra={
        "H2_self_shielding_length": np.full(8, 1.0e-6)})
    h2_long = _solve_h2(cd, extra={
        "H2_self_shielding_length": np.full(8, 1.0e0)})
    # longer shielding column -> more H2 survives
    assert np.all(h2_long >= h2_short)


def test_h2_custom_shielding_factor():
    cd = make_chem(LWbackground_intensity=1.0e3, H2_custom_shielding=1)
    h2_open = _solve_h2(cd, extra={
        "H2_custom_shielding_factor": np.ones(8)})
    h2_shielded = _solve_h2(cd, extra={
        "H2_custom_shielding_factor": np.full(8, 1e-6)})
    assert np.all(h2_shielded > h2_open)


def test_uvb_self_shielding_methods(data_file):
    """Rahmati self-shielding (methods 1-3) preserves more HI than the
    optically-thin solve at high density under a UVB."""
    hi = {}
    for method in [0, 1, 2, 3]:
        cd = make_chem(
            UVbackground=1, metal_cooling=1,
            grackle_data_file=data_file,
            self_shielding_method=method,
            comoving_coordinates=1, a_units=0.01,
            a_value=100.0 / (1 + 2.0),  # z = 2
        )
        fc = FluidContainer(cd, 8)
        fill(fc, T0=1.0e4, density=1.0e3)
        fields = fc._solver_fields()
        new_f, _ = cd.solve_chemistry(fields, 1.0e-6)
        hi[method] = np.asarray(new_f["HI"]).mean()
    for method in [1, 2, 3]:
        assert hi[method] > hi[0], method


def test_rt_fields_drive_ionization():
    cd = make_chem(use_radiative_transfer=1, primordial_chemistry=1)
    n = 8
    fc = FluidContainer(cd, n)
    fill(fc, T0=1.0e4, density=1.0)
    fc["RT_HI_ionization_rate"][:] = 1.0e6  # 1/code-time
    fields = fc._solver_fields()
    new_f, _ = cd.solve_chemistry(fields, 1.0e-4)
    # photoionization should have ionized most HI
    assert np.all(np.asarray(new_f["HII"]) > np.asarray(new_f["HI"]))

    # RT heating raises energy
    cd2 = make_chem(use_radiative_transfer=1, primordial_chemistry=1)
    fc2 = FluidContainer(cd2, n)
    fill(fc2, T0=1.0e4, density=1.0)
    fc2["RT_heating_rate"][:] = 1.0e-24
    f2 = fc2._solver_fields()
    base_f, _ = cd.solve_chemistry(fc._solver_fields() | {
        "RT_heating_rate": np.zeros(n),
        "RT_HI_ionization_rate": np.zeros(n),
        "RT_HeI_ionization_rate": np.zeros(n),
        "RT_HeII_ionization_rate": np.zeros(n),
    }, 1.0e-4)
    heat_f, _ = cd2.solve_chemistry(f2, 1.0e-4)
    assert np.asarray(heat_f["energy"]).mean() > \
        np.asarray(base_f["energy"]).mean()


def test_rt_coupled_intermediate_step_masks():
    """Coupled RT stepping solves only cells with (or without) radiation
    (solve_rate_cool_g.F:418-439)."""
    cd = make_chem(
        use_radiative_transfer=1,
        radiative_transfer_coupled_rate_solver=1,
        radiative_transfer_intermediate_step=1,
        primordial_chemistry=1,
    )
    n = 8
    fc = FluidContainer(cd, n)
    fill(fc, T0=1.0e6, density=1.0)
    kph = np.zeros(n)
    kph[:4] = 1.0e2
    fc["RT_HI_ionization_rate"][:] = kph
    fields = fc._solver_fields()
    e0 = np.array(fields["energy"])
    new_f, _ = cd.solve_chemistry(fields, 1.0e-3)
    e1 = np.asarray(new_f["energy"])
    # cells without radiation are masked out in the intermediate step
    np.testing.assert_array_equal(e1[4:], e0[4:])
    assert not np.allclose(e1[:4], e0[:4])


def test_exit_after_iterations_exceeded():
    cd = make_chem(primordial_chemistry=1, max_iterations=3,
                   exit_after_iterations_exceeded=1)
    fc = FluidContainer(cd, 8)
    fill(fc, T0=1.0e7, density=1.0e2)
    with pytest.raises(RuntimeError):
        cd.solve_chemistry(fc._solver_fields(), 1.0e3)
