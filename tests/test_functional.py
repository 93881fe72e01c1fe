"""Pure-functional API: closures embeddable in the caller's own jit.

The stateful path (ChemistryData.solve_chemistry) is the parity surface;
these tests assert the functional closures return IDENTICAL results and
stay pure under jax.jit and lax.scan composition — the TPU-native
integration mode the reference's per-call C boundary cannot offer
(grackle: src/clib/solve_chemistry.c:91-370)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import grackle_tpu.functional as gfn

from .test_solver import make_chem, make_fc


def _fields_of(fc):
    return {k: np.array(v) for k, v in fc.items()
            if k in fc.density_fields or k == "energy"}


@pytest.mark.parametrize("chem", [1, 3])
def test_solve_fn_matches_stateful(chem):
    cd = make_chem(chem)
    fc = make_fc(cd, n=64, T0=3.0e4)
    fields = _fields_of(fc)
    dt = 0.01

    ref, ref_diag = cd.solve_chemistry(dict(fields), dt)

    solve = gfn.make_solve_fn(cd)
    out, diag = jax.jit(solve)(dict(fields), dt)

    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(out[k]), err_msg=k
        )
    assert int(diag["n_iterations"]) == int(ref_diag["n_iterations"])
    np.testing.assert_array_equal(
        np.asarray(diag["converged"]), np.asarray(ref_diag["converged"])
    )


def test_solve_fn_scan_composition():
    """lax.scan over the closure == repeated stateful calls."""
    cd = make_chem(2)
    fc = make_fc(cd, n=32, T0=1.0e5)
    fields = _fields_of(fc)
    dt = 0.02
    n_steps = 3

    ref = dict(fields)
    for _ in range(n_steps):
        ref, _ = cd.solve_chemistry(ref, dt)

    solve = gfn.make_solve_fn(cd)

    @jax.jit
    def evolve(f0):
        def step(f, _):
            new_f, diag = solve(f, dt)
            return new_f, diag["n_iterations"]
        return jax.lax.scan(step, f0, None, length=n_steps)

    out, iters = evolve({k: jnp.asarray(v) for k, v in fields.items()})
    assert iters.shape == (n_steps,)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(out[k]), rtol=1e-6,
            err_msg=k,
        )


def test_solve_fn_fused_with_user_ops():
    """The closure fuses with caller arithmetic under one jit (the
    hydro-step pattern) without host callbacks."""
    cd = make_chem(1)
    fc = make_fc(cd, n=32, T0=1.0e6)
    fields = {k: jnp.asarray(v) for k, v in _fields_of(fc).items()}
    solve = gfn.make_solve_fn(cd)

    @jax.jit
    def hydro_like_step(f, dt):
        f2, diag = solve(f, dt)
        # caller-side update using solver outputs in the same program
        e_floor = jnp.minimum(f2["energy"], f["energy"])
        return e_floor, diag["converged"]

    e, conv = hydro_like_step(fields, 0.005)
    assert np.all(np.isfinite(np.asarray(e)))
    assert np.asarray(conv).all()


def test_derived_fns_match_stateful():
    cd = make_chem(2)
    fc = make_fc(cd, n=48, T0=8.0e3)
    fields = _fields_of(fc)

    fc.calculate_temperature()
    fc.calculate_pressure()
    fc.calculate_gamma()
    fc.calculate_cooling_time()

    t_fn = jax.jit(gfn.make_temperature_fn(cd))
    p_fn = jax.jit(gfn.make_pressure_fn(cd))
    g_fn = jax.jit(gfn.make_gamma_fn(cd))
    ct_fn = jax.jit(gfn.make_cooling_time_fn(cd))

    np.testing.assert_array_equal(
        np.asarray(fc["temperature"]), np.asarray(t_fn(fields)))
    np.testing.assert_array_equal(
        np.asarray(fc["pressure"]), np.asarray(p_fn(fields)))
    np.testing.assert_array_equal(
        np.asarray(fc["gamma"]), np.asarray(g_fn(fields)))
    np.testing.assert_array_equal(
        np.asarray(fc["cooling_time"]), np.asarray(ct_fn(fields)))


def test_solve_fn_shard_map_composition():
    """The closure composes under the caller's own shard_map over the
    8-device CPU mesh — the documented multi-chip embedding mode
    (docs/Integration.md)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from grackle_tpu.parallel.sharding import make_cell_mesh

    cd = make_chem(1)
    fc = make_fc(cd, n=128, T0=5.0e4)
    fields = {k: jnp.asarray(v) for k, v in _fields_of(fc).items()}
    dt = 0.01

    ref, _ = cd.solve_chemistry(
        {k: np.array(v) for k, v in fields.items()}, dt)

    solve = gfn.make_solve_fn(cd)
    mesh = make_cell_mesh()
    spec = {k: P("cells") for k in fields}

    @jax.jit
    def sharded_step(f):
        def local(f_shard):
            new_f, diag = solve(f_shard, dt)
            return new_f, diag["converged"]
        return shard_map(
            local, mesh=mesh, in_specs=(spec,),
            out_specs=(spec, P("cells")), check_vma=False,
        )(f)

    out, conv = sharded_step(fields)
    assert np.asarray(conv).all()
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(out[k]), err_msg=k
        )


def test_solve_fn_exact_cooling_matches_stateful(tmp_path):
    """The exact-integration tabulated branch of the closure matches
    the stateful path too."""
    from grackle_tpu.data.synthetic import make_synthetic_data_file

    path = str(tmp_path / "functional_exact_data.h5")
    make_synthetic_data_file(path)

    from .test_exact_cooling import _tab_setup

    cd, fc = _tab_setup(path, exact=1, n=128)
    fields = {k: np.array(v) for k, v in fc.items()
              if k in ("density", "metal", "energy")}
    dt = 0.5

    ref, _ = cd.solve_chemistry(dict(fields), dt)
    out, diag = jax.jit(gfn.make_solve_fn(cd))(dict(fields), dt)

    # the closed-form Townsend pass fuses differently inside the
    # caller's jit than in the stateful wrapper's own jit; agreement is
    # ulp-level f64 (measured max 7e-15), unlike the subcycled paths
    # which are bit-identical
    np.testing.assert_allclose(
        np.asarray(ref["energy"]), np.asarray(out["energy"]),
        rtol=1e-12,
    )
    assert int(diag["n_iterations"]) == 1


def test_requires_initialized():
    from grackle_tpu.api import ChemistryData

    cd = ChemistryData()
    with pytest.raises(ValueError):
        gfn.make_solve_fn(cd)
