"""Interpolator tests: batched gathers vs straightforward NumPy
re-implementations of the reference semantics
(grackle: src/clib/interpolators_g.F)."""

import numpy as np
import jax.numpy as jnp

from grackle_tpu.ops import interp


def _np_index(x, par):
    dpar = (par[-1] - par[0]) / (len(par) - 1)
    return int(np.clip(np.floor((x - par[0]) / dpar), 0, len(par) - 2))


def _np_interp1d(x, par, data):
    i = _np_index(x, par)
    slope = (data[i + 1] - data[i]) / (par[i + 1] - par[i])
    return (x - par[i]) * slope + data[i]


def test_interp1d_matches_and_extrapolates():
    par = np.linspace(-2.0, 3.0, 11)
    rng = np.random.RandomState(42)
    data = rng.rand(11)
    xs = np.array([-3.0, -2.0, -1.95, 0.3, 2.999, 3.0, 4.5])
    got = np.asarray(interp.interpolate_1d(
        jnp.asarray(xs), jnp.asarray(par), jnp.asarray(data)))
    want = [_np_interp1d(x, par, data) for x in xs]
    np.testing.assert_allclose(got, want, rtol=1e-13)


def test_interp2d_exact_on_bilinear():
    # multilinear interpolation is exact for multilinear functions
    par1 = np.linspace(0.0, 1.0, 7)
    par2 = np.linspace(-1.0, 2.0, 9)
    f = lambda a, b: 2.0 * a - 3.0 * b + 0.5 * a * b + 1.0
    data = f(par1[:, None], par2[None, :])
    rng = np.random.RandomState(0)
    x1 = rng.uniform(0, 1, 33)
    x2 = rng.uniform(-1, 2, 33)
    got = np.asarray(interp.interpolate_2d(
        jnp.asarray(x1), jnp.asarray(x2),
        jnp.asarray(par1), jnp.asarray(par2), jnp.asarray(data)))
    np.testing.assert_allclose(got, f(x1, x2), rtol=1e-12)


def test_interp3d_exact_on_trilinear():
    par1 = np.linspace(0.0, 1.0, 5)
    par2 = np.linspace(0.0, 2.0, 6)
    par3 = np.linspace(-1.0, 1.0, 7)
    f = lambda a, b, c: a + 2 * b - c + a * b - b * c + 0.3 * a * c
    data = f(par1[:, None, None], par2[None, :, None],
             par3[None, None, :])
    rng = np.random.RandomState(1)
    x1 = rng.uniform(0, 1, 20)
    x2 = rng.uniform(0, 2, 20)
    x3 = rng.uniform(-1, 1, 20)
    got = np.asarray(interp.interpolate_3d(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(x3),
        jnp.asarray(par1), jnp.asarray(par2), jnp.asarray(par3),
        jnp.asarray(data)))
    np.testing.assert_allclose(got, f(x1, x2, x3), rtol=1e-12)


def test_interp3dz_loglog_redshift():
    """3Dz: middle axis interpolated in log(1+z) + 2-D fallback."""
    par1 = np.linspace(0.0, 1.0, 5)
    zpar = np.array([0.0, 1.0, 3.0, 7.0, 15.0])
    par3 = np.linspace(0.0, 2.0, 6)
    rng = np.random.RandomState(3)
    data = rng.rand(5, 5, 6)

    d2 = len(zpar)
    zr = 2.0
    zi0, end_int = interp.redshift_index(jnp.float64(zr),
                                         jnp.asarray(zpar), d2)
    assert not bool(end_int)
    assert int(zi0) == 1
    x1 = jnp.asarray([0.5])
    x3 = jnp.asarray([1.0])
    got = float(interp.interpolate_3dz(
        x1, zr, x3, jnp.asarray(par1), jnp.asarray(zpar),
        jnp.asarray(par3), jnp.asarray(data), zi0, end_int)[0])

    # manual: interpolate in log(1+z) between slices 1 and 2
    def val_at(zslice):
        return float(interp.interpolate_2d(
            x1, x3, jnp.asarray(par1), jnp.asarray(par3),
            jnp.asarray(data[:, zslice, :]))[0])
    w = np.log((1 + zr) / (1 + zpar[1])) / np.log(
        (1 + zpar[2]) / (1 + zpar[1]))
    want = val_at(1) + w * (val_at(2) - val_at(1))
    np.testing.assert_allclose(got, want, rtol=1e-12)

    # past the second-to-last redshift -> 2-D at the last slice
    zr_end = 14.0
    zi0e, end_e = interp.redshift_index(jnp.float64(zr_end),
                                        jnp.asarray(zpar), d2)
    assert bool(end_e)
    got_end = float(interp.interpolate_3dz(
        x1, zr_end, x3, jnp.asarray(par1), jnp.asarray(zpar),
        jnp.asarray(par3), jnp.asarray(data), zi0e, end_e)[0])
    np.testing.assert_allclose(got_end, val_at(4), rtol=1e-12)


def test_interp4d_5d_exact_on_multilinear():
    p1 = np.linspace(0, 1, 4)
    p2 = np.linspace(0, 1, 5)
    p3 = np.linspace(0, 1, 3)
    p4 = np.array([0.0, 0.5, 0.7, 1.0])  # non-uniform (bisection axis)
    p5 = np.linspace(0, 1, 4)

    f4 = lambda a, b, c, d: a + 2 * b + 3 * c + 4 * d + a * d
    data4 = f4(p1[:, None, None, None], p2[None, :, None, None],
               p3[None, None, :, None], p4[None, None, None, :])
    rng = np.random.RandomState(5)
    xs = [rng.uniform(0.05, 0.95, 10) for _ in range(4)]
    got = np.asarray(interp.interpolate_4d(
        *[jnp.asarray(x) for x in xs],
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(p3),
        jnp.asarray(p4), jnp.asarray(data4)))
    np.testing.assert_allclose(got, f4(*xs), rtol=1e-12)

    f5 = lambda a, b, c, d, e: a - b + c - d + e + b * e
    data5 = f5(p1[:, None, None, None, None],
               p2[None, :, None, None, None],
               p3[None, None, :, None, None],
               p4[None, None, None, :, None],
               p5[None, None, None, None, :])
    xs5 = [rng.uniform(0.05, 0.95, 10) for _ in range(5)]
    got5 = np.asarray(interp.interpolate_5d(
        *[jnp.asarray(x) for x in xs5],
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(p3),
        jnp.asarray(p4), jnp.asarray(p5), jnp.asarray(data5)))
    np.testing.assert_allclose(got5, f5(*xs5), rtol=1e-12)
