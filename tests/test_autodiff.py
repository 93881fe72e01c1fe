"""Differentiability guarantees for the functional API.

The derived-field calculators (temperature, pressure, gamma, cooling
time — grackle: src/clib/calculate_*.c) are pure compositions of
elementwise math and table interpolation here, so they are exactly
reverse-differentiable with ``jax.grad`` — gradients of cooling rates
w.r.t. species abundances and energy are what calibration / ML-hybrid
host codes need and what the reference's Fortran can never provide.

(The subcycled solve itself uses early-exit ``lax.while_loop``s and is
deliberately NOT covered by this guarantee.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import grackle_tpu.functional as gfn

from .test_solver import make_chem, make_fc


def _fields(cd, n=8, T0=1.0e5):
    fc = make_fc(cd, n=n, T0=T0)
    # mixed ionization state: every differentiated species is a finite
    # fraction of the density, so central differences resolve the
    # response (make_fc's fully-ionized state leaves HI/H2I at ~1e-20,
    # far below the loss function's ulp)
    d = np.array(fc["density"])
    fc["HI"][:] = 0.3 * d
    fc["HII"][:] = 0.4 * d
    fc["de"][:] = np.array(fc["HII"]) + np.array(fc["HeII"]) / 4
    if cd.primordial_chemistry > 1:
        fc["H2I"][:] = 2.0e-3 * d
    return {k: jnp.asarray(np.array(v), jnp.float64)
            for k, v in fc.items()
            if k in fc.density_fields or k == "energy"}


def _fd_check(fn, fields, key, rtol):
    """Compare jax.grad against a central finite difference in the
    scalar sum(fn) w.r.t. fields[key]."""
    def loss(x):
        f = dict(fields)
        f[key] = x
        return jnp.sum(fn(f))

    x0 = fields[key]
    g = np.asarray(jax.grad(loss)(x0))
    eps = 1e-6 * float(jnp.abs(x0).max())
    num = (float(loss(x0 + eps)) - float(loss(x0 - eps))) / (2 * eps)
    assert np.all(np.isfinite(g))
    np.testing.assert_allclose(g.sum(), num, rtol=rtol)


@pytest.mark.parametrize("key", ["energy", "HI", "de"])
def test_cooling_time_grad(key):
    cd = make_chem(2)
    fields = _fields(cd)
    _fd_check(gfn.make_cooling_time_fn(cd), fields, key, rtol=1e-4)


@pytest.mark.parametrize("key", ["energy", "HI"])
def test_temperature_grad(key):
    cd = make_chem(2)
    fields = _fields(cd)
    _fd_check(gfn.make_temperature_fn(cd), fields, key, rtol=1e-5)


def test_pressure_and_gamma_grads():
    cd = make_chem(2)
    fields = _fields(cd)
    _fd_check(gfn.make_pressure_fn(cd), fields, "energy", rtol=1e-6)
    _fd_check(gfn.make_gamma_fn(cd), fields, "H2I", rtol=1e-4)


def test_grad_with_metal_cooling(tmp_path):
    """Gradients flow through the Cloudy table interpolation too."""
    from grackle_tpu.data.synthetic import make_synthetic_data_file

    path = str(tmp_path / "autodiff_data.h5")
    make_synthetic_data_file(path)
    cd = make_chem(2, metal_cooling=1, grackle_data_file=path)
    fields = _fields(cd)
    fields["metal"] = 0.01 * fields["density"]
    _fd_check(gfn.make_cooling_time_fn(cd), fields, "metal", rtol=1e-3)
