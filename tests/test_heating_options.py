"""Coverage for the remaining radiation/dust option branches: photoelectric
heating modes, ISRF/dust fields, Compton X-ray, LW sawtooth, H2 cooling
variants."""

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


def make_chem(**kw):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = 2
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    for k, v in kw.items():
        setattr(cd, k, v)
    assert cd.initialize() == 1
    return cd


def neutral_state(cd, n=8, T0=5.0e3, density=10.0, x_e=1e-20):
    fc = FluidContainer(cd, n)
    tiny = 1e-20
    fc["density"][:] = density
    fc["HI"][:] = 0.76 * density * max(1.0 - x_e, tiny)
    fc["HII"][:] = 0.76 * density * x_e + tiny
    fc["HeI"][:] = 0.24 * density
    fc["HeII"][:] = tiny
    fc["HeIII"][:] = tiny
    fc["de"][:] = fc["HII"]
    if "HM" in fc:
        fc["HM"][:] = tiny
        fc["H2I"][:] = 1e-4 * density
        fc["H2II"][:] = tiny
    if "metal" in fc:
        fc["metal"][:] = 0.01 * density
    fc.calculate_mean_molecular_weight()
    fc["energy"] = T0 / cd.temperature_units / fc["mu"] / (cd.Gamma - 1)
    return fc


@pytest.mark.parametrize("mode", [1, 2, 3])
def test_photoelectric_heating_modes(mode, data_file):
    """PE heating modes 1-3 (cool1d_multi_g.F:951-1001) add heat relative
    to PE off."""
    ct = {}
    for pe in [0, mode]:
        cd = make_chem(metal_cooling=1, grackle_data_file=data_file,
                       photoelectric_heating=pe)
        # mode 3's Wolfire epsilon needs a realistic electron fraction
        fc = neutral_state(cd, x_e=1e-3)
        fc.calculate_cooling_time()
        ct[pe] = fc["cooling_time"].copy()
    # heating offsets cooling -> longer (less negative) cooling time,
    # or even net heating (positive)
    assert np.all(ct[mode] != ct[0])
    cooling = ct[mode] < 0
    assert np.all(np.abs(ct[mode][cooling]) >= np.abs(ct[0][cooling]))


def test_isrf_field_scales_pe_heating(data_file):
    cd = make_chem(metal_cooling=1, grackle_data_file=data_file,
                   photoelectric_heating=2, use_isrf_field=1)
    rates = {}
    for isrf in [0.1, 100.0]:
        fc = neutral_state(cd)
        fc["isrf_habing"][:] = isrf
        fc.calculate_cooling_time()
        rates[isrf] = fc["cooling_time"].copy()
    # stronger ISRF -> more heating -> cooling time increases/less cooling
    assert np.all(rates[100.0] != rates[0.1])


def test_dust_density_field(data_file):
    """use_dust_density_field switches dust2gas from fgr*Z to the field
    (cool1d_multi_g.F:690-704)."""
    cd = make_chem(metal_cooling=1, dust_chemistry=1,
                   use_dust_density_field=1,
                   grackle_data_file=data_file)
    out = {}
    for dust in [1e-6, 1e-2]:
        fc = neutral_state(cd, T0=1.0e3, density=1.0e4)
        fc["dust"][:] = dust * fc["density"]
        fields = fc._solver_fields()
        new_f, _ = cd.solve_chemistry(fields, 1.0e-5)
        out[dust] = np.asarray(new_f["H2I"])
    # more dust -> more H2 formation on grains
    assert np.all(out[1e-2] > out[1e-6])


def test_compton_xray_heating(data_file):
    out = {}
    for xray in [0, 1]:
        cd = make_chem(metal_cooling=1, UVbackground=1,
                       grackle_data_file=data_file,
                       Compton_xray_heating=xray,
                       comoving_coordinates=1, a_units=0.01,
                       a_value=100.0 / (1.0 + 3.0))
        # Compton terms scale with the electron density: ionized gas
        fc = neutral_state(cd, T0=1.0e6, density=1e-3, x_e=0.999)
        fc.calculate_cooling_time()
        out[xray] = fc["cooling_time"].copy()
    assert not np.allclose(out[0], out[1])


def test_lw_sawtooth_suppression():
    h2 = {}
    for saw in [0, 1]:
        cd = make_chem(LWbackground_intensity=100.0,
                       LWbackground_sawtooth_suppression=saw,
                       UVbackground=0)
        fc = neutral_state(cd, T0=1.0e3, density=1.0e2)
        fields = fc._solver_fields()
        new_f, _ = cd.solve_chemistry(fields, 1.0e-4)
        h2[saw] = np.asarray(new_f["H2I"])
    # suppression weakens LW dissociation -> more H2 survives...
    # NOTE: with UVbackground=0 the ramp is zero so the sawtooth factor
    # is 0.1: strictly less dissociation
    assert np.all(h2[1] >= h2[0])


def test_lw_sawtooth_uvb_ramp(data_file):
    """UVB-path sawtooth (update_UVbackground_rates.c:241-256): with the
    tanh ramp mid-transition the suppression factor must sit strictly
    between the floor (0.1) and full strength (1.0), and must equal 1 in
    the full-on window."""
    import jax.numpy as jnp

    from grackle_tpu.data.uvb import update_uvb_rates

    def k31_at(z, saw):
        cd = make_chem(
            UVbackground=1, grackle_data_file=data_file,
            metal_cooling=1,
            LWbackground_intensity=100.0,
            LWbackground_sawtooth_suppression=saw,
            UVbackground_redshift_on=7.0,
            UVbackground_redshift_fullon=3.0,
            comoving_coordinates=1, a_units=1.0,
            a_value=1.0 / (1.0 + z),
        )
        ctx = cd.context
        return float(update_uvb_rates(ctx.config, ctx.uvb,
                                      ctx.units).k31)

    # full-on window: ramp == 1, sawtooth multiplies by exactly 1
    assert k31_at(1.0, 1) == pytest.approx(k31_at(1.0, 0), rel=1e-6)
    # ramp midpoint (z = (on+fullon)/2 = 5): factor = 0.1+0.9*0.5
    mid_on = k31_at(5.0, 1)
    mid_off = k31_at(5.0, 0)
    assert mid_on == pytest.approx(0.55 * mid_off, rel=1e-3)
    # just inside redshift_on the ramp has decayed: factor floors at 0.1
    hi_on = k31_at(6.9, 1)
    hi_off = k31_at(6.9, 0)
    assert hi_on == pytest.approx(0.1 * hi_off, rel=1e-3)
    # the LW intensity override itself is redshift-independent inside
    # the window
    assert mid_off == pytest.approx(hi_off, rel=1e-6)
    # outside [redshift_off, redshift_on] every UVB rate is zeroed,
    # including the LW override (update_UVbackground_rates.c:36-45)
    assert k31_at(9.0, 0) == 0.0
    assert k31_at(9.0, 1) == 0.0


@pytest.mark.parametrize("variant", [0, 1, 2])
def test_h2_cooling_variants_run(variant):
    cd = make_chem(h2_cooling_variant=variant)
    fc = neutral_state(cd, T0=2.0e3, density=1.0e4)
    fc.calculate_cooling_time()
    assert np.all(np.isfinite(fc["cooling_time"]))
    assert np.all(fc["cooling_time"] < 0)


def test_h2_cooling_variants_differ():
    vals = {}
    for variant in [0, 1]:
        cd = make_chem(h2_cooling_variant=variant)
        fc = neutral_state(cd, T0=2.0e3, density=1.0e4)
        fc.calculate_cooling_time()
        vals[variant] = fc["cooling_time"].copy()
    assert not np.allclose(vals[0], vals[1])
