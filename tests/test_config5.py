"""BASELINE config #5 end-to-end: the full grid workload (scaled 256^3
-> 32^3) — 3-D grid with asymmetric ghost zones, user volumetric +
specific heating arrays, H2 self-shielding option 1 (full-grid Sobolev
stencil), solve_chemistry + every derived field — run unsharded AND
sharded over the virtual 8-device mesh.

Composes what test_grid_api / test_heating_options / test_sharding /
test_sobolev_shield each cover in isolation, the way a production hydro
client would drive it (grackle: src/example/cxx_grid_example.C semantics
at scale).
"""

import numpy as np

from grackle_tpu.api import sobolev_shield_length
from grackle_tpu.ops.common import make_unit_scalars
from grackle_tpu.parallel.sharding import (
    make_cell_mesh,
    solve_chemistry_sharded,
)

from . import answer_workloads as aw

DT = 1.0e-4
GRID_DX = 1.0e-3


def test_grid_full_ghosts_untouched():
    """Ghost zones (garbage values) pass through the whole workload
    bit-identical; every active cell evolves."""
    cd, f, sl = aw.grid_full_setup()
    before = {k: v.copy() for k, v in f.items()}
    new_f, diag = cd.solve_chemistry_grid(
        f, DT, grid_start=aw.GRID_START, grid_end=aw.GRID_END,
        grid_dx=GRID_DX,
    )
    assert bool(np.all(np.asarray(diag["converged"])))
    ghost = np.ones(aw.GRID_SHAPE, dtype=bool)
    ghost[sl] = False
    for name, arr in new_f.items():
        np.testing.assert_array_equal(
            np.asarray(arr)[ghost], before[name][ghost], err_msg=name,
        )
    # the active region must actually evolve
    assert not np.array_equal(np.asarray(new_f["energy"])[sl],
                              before["energy"][sl])


def test_grid_full_sharded_matches_unsharded():
    """The identical workload sharded over the 8-device cell mesh (with
    the Sobolev shielding lengths computed once on the full grid, then
    scattered with the cells) matches the unsharded grid solve."""
    cd, f, sl = aw.grid_full_setup()
    ref_f, ref_diag = cd.solve_chemistry_grid(
        f, DT, grid_start=aw.GRID_START, grid_end=aw.GRID_END,
        grid_dx=GRID_DX,
    )
    assert bool(np.all(np.asarray(ref_diag["converged"])))

    ctx = cd.context
    us = make_unit_scalars(ctx.config, ctx.tables, ctx.units, GRID_DX)
    l_h2 = np.asarray(sobolev_shield_length(
        np.asarray(f["density"], dtype=np.float64), us.xbase1, us.dx_cgs
    ))[sl].reshape(-1)

    flat = {k: np.asarray(v)[sl].reshape(-1) for k, v in f.items()}
    mesh = make_cell_mesh()
    assert mesh.shape["cells"] == 8
    shard_f, diag = solve_chemistry_sharded(
        ctx, flat, DT, mesh, grid_dx=GRID_DX,
        l_h2shield_field=np.asarray(l_h2),
    )
    assert bool(np.all(np.asarray(diag["converged"])))
    for name in ["HI", "H2I", "HDI", "de", "energy"]:
        np.testing.assert_allclose(
            np.asarray(shard_f[name]),
            np.asarray(ref_f[name])[sl].reshape(-1),
            rtol=1e-12, err_msg=name,
        )

    # derived fields on the sharded result land on the stored-answer
    # values too (same active state -> same fields)
    active = {k: np.asarray(v) for k, v in shard_f.items()}
    t_shard = np.asarray(cd.calculate_temperature(active))
    ref_active = {k: np.asarray(v)[sl].reshape(-1)
                  for k, v in ref_f.items()}
    t_ref = np.asarray(cd.calculate_temperature(ref_active))
    np.testing.assert_allclose(t_shard, t_ref, rtol=1e-12)
