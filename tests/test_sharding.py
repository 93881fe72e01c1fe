"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference never needed these (single-node OpenMP only); here we verify
1-chip vs N-chip equality — the TPU-native analogue of the reference's
thread-count invariance (OMP_NUM_THREADS CI leg,
grackle: .circleci/config.yml:104-110).
"""

import numpy as np
import jax
import pytest

from grackle_tpu.api import ChemistryData
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.parallel.sharding import (
    make_cell_mesh,
    solve_chemistry_sharded,
)
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


def make_chem(chem=1):
    cd = ChemistryData()
    cd.use_grackle = 1
    cd.with_radiative_cooling = 1
    cd.primordial_chemistry = chem
    cd.density_units = mass_hydrogen_cgs
    cd.length_units = 3.0857e21
    cd.time_units = 3.1556952e13
    assert cd.initialize() == 1
    return cd


def make_fields(cd, n):
    rng = np.random.RandomState(17)
    fc = FluidContainer(cd, n)
    tiny = 1e-20
    fc["density"][:] = 10.0 ** rng.uniform(-1, 2, n)
    fc["HII"][:] = 0.76 * fc["density"] * 0.5
    fc["HI"][:] = 0.76 * fc["density"] * 0.5
    fc["HeI"][:] = 0.24 * fc["density"]
    fc["HeII"][:] = tiny
    fc["HeIII"][:] = tiny
    fc["de"][:] = fc["HII"] + fc["HeII"] / 4 + fc["HeIII"] / 2
    if cd.primordial_chemistry > 1:
        fc["HM"][:] = tiny * fc["density"]
        fc["H2I"][:] = 1e-6 * fc["density"]
        fc["H2II"][:] = tiny * fc["density"]
    if cd.primordial_chemistry > 2:
        fc["DI"][:] = 2.0 * 3.4e-5 * fc["density"]
        fc["DII"][:] = tiny
        fc["HDI"][:] = tiny
    fc["metal"][:] = 0.0
    T = 10.0 ** rng.uniform(4, 7, n)
    fc.calculate_mean_molecular_weight()
    fc["energy"] = (T / cd.temperature_units / fc["mu"]
                    / (cd.Gamma - 1.0))
    return fc


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("chem", [1, 3])
def test_sharded_equals_single(chem):
    """Sharded (8 devices, per-shard subcycling) vs single-device solve."""
    cd = make_chem(chem)
    n = 48
    fc = make_fields(cd, n)
    fields = fc._solver_fields()
    dt = 1.0e-3

    ref_f, _ = cd.solve_chemistry(fields, dt)

    mesh = make_cell_mesh()
    shard_f, diag = solve_chemistry_sharded(cd.context, fields, dt, mesh)

    assert diag["n_iterations"].shape == (8,)
    assert bool(np.all(np.asarray(diag["converged"])))
    for name in ["HI", "HII", "de", "energy"]:
        np.testing.assert_allclose(
            np.asarray(shard_f[name]), np.asarray(ref_f[name]),
            rtol=1e-12, err_msg=name,
        )


def test_sharded_uneven_n():
    """Cell counts not divisible by the device count are padded."""
    cd = make_chem(1)
    n = 37  # not a multiple of 8
    fc = make_fields(cd, n)
    fields = fc._solver_fields()
    dt = 1.0e-3
    ref_f, _ = cd.solve_chemistry(fields, dt)
    mesh = make_cell_mesh()
    shard_f, _ = solve_chemistry_sharded(cd.context, fields, dt, mesh)
    assert shard_f["HI"].shape == (n,)
    np.testing.assert_allclose(
        np.asarray(shard_f["HI"]), np.asarray(ref_f["HI"]), rtol=1e-12
    )


def test_sharded_compaction_equals_single(monkeypatch):
    """Per-shard converged-cell compaction under shard_map must match the
    single-device monolithic solve bit-for-bit."""
    import grackle_tpu.api as api

    monkeypatch.setattr(api, "_COMPACT_MIN_BUCKET", 16)
    cd = make_chem(1)
    cd.solver_compaction = 8
    assert cd.initialize() == 1
    n = 1024  # 128/shard >= 4*16 -> compaction engages per shard
    fc = make_fields(cd, n)
    fields = fc._solver_fields()
    dt = 1.0e-3

    cd0 = make_chem(1)
    cd0.solver_compaction = 0
    assert cd0.initialize() == 1
    ref_f, _ = cd0.solve_chemistry(fields, dt)

    mesh = make_cell_mesh()
    shard_f, diag = solve_chemistry_sharded(cd.context, fields, dt, mesh)
    assert bool(np.all(np.asarray(diag["converged"])))
    for name in ["HI", "HII", "de", "energy"]:
        np.testing.assert_array_equal(
            np.asarray(shard_f[name]), np.asarray(ref_f[name]),
            err_msg=name,
        )


def test_sharded_exact_cooling(tmp_path):
    """exact_cooling=1 (Townsend closed form) shards pointwise: sharded
    energies match the unsharded exact path."""
    from grackle_tpu.data.synthetic import make_synthetic_data_file

    from .test_exact_cooling import _tab_setup

    path = str(tmp_path / "sharded_exact.h5")
    make_synthetic_data_file(path)
    cd, fc = _tab_setup(path, exact=1, n=96)
    fields = {k: np.array(v) for k, v in fc.items()
              if k in ("density", "metal", "energy")}
    dt = 0.5

    ref_f, _ = cd.solve_chemistry(dict(fields), dt)

    mesh = make_cell_mesh()
    shard_f, diag = solve_chemistry_sharded(cd.context, fields, dt, mesh)
    assert bool(np.all(np.asarray(diag["converged"])))
    np.testing.assert_allclose(
        np.asarray(shard_f["energy"]), np.asarray(ref_f["energy"]),
        rtol=1e-12,
    )
