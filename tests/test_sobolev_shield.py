"""Ghost-zone-correct Sobolev shielding stencil (H2_self_shielding == 1).

The reference evaluates the 6-point density stencil for every ACTIVE cell
reading neighbors that may be GHOST cells (solve_rate_cool_g.F:1420-1434);
these tests pin that semantics with a direct NumPy re-implementation of
the Fortran loop and an end-to-end grid solve whose ghost values are
non-trivial.
"""

import numpy as np
import pytest

from grackle_tpu.api import (
    ChemistryData,
    sobolev_shield_length,
    solve_chemistry_grid,
)
from grackle_tpu.fluid_container import FluidContainer
from grackle_tpu.ops.common import make_unit_scalars
from grackle_tpu.utilities.physical_constants import mass_hydrogen_cgs


def numpy_sobolev(d, sl, dx_cgs, xbase1):
    """Direct triple-loop port of solve_rate_cool_g.F:1420-1434: active
    cells read full-grid (ghost) neighbors; out-of-bounds directions at
    true domain edges are excluded (one-sided)."""
    shape = d.shape
    out = np.empty([s.stop - s.start for s in sl])
    for a in range(sl[0].start, sl[0].stop):
        for b in range(sl[1].start, sl[1].stop):
            for c in range(sl[2].start, sl[2].stop):
                divrho = 1.0e-20
                for da, db, dc in [(1, 0, 0), (-1, 0, 0), (0, 1, 0),
                                   (0, -1, 0), (0, 0, 1), (0, 0, -1)]:
                    na, nb, nc = a + da, b + db, c + dc
                    if not (0 <= na < shape[0] and 0 <= nb < shape[1]
                            and 0 <= nc < shape[2]):
                        continue
                    diff = d[na, nb, nc] - d[a, b, c]
                    if diff < 0.0:
                        divrho += diff
                out[a - sl[0].start, b - sl[1].start, c - sl[2].start] = \
                    min(dx_cgs * d[a, b, c] / abs(divrho), xbase1)
    return out


def test_stencil_matches_numpy_reference_with_ghosts():
    rng = np.random.RandomState(3)
    d = 10.0 ** rng.uniform(-1, 1, (7, 6, 5))
    sl = (slice(1, 6), slice(1, 5), slice(1, 4))
    dx_cgs, xbase1 = 0.37, 1.0e5
    got = np.asarray(sobolev_shield_length(d, xbase1, dx_cgs))[sl]
    want = numpy_sobolev(d, sl, dx_cgs, xbase1)
    np.testing.assert_allclose(got, want, rtol=1e-13)


def test_stencil_one_sided_at_domain_edges():
    """No ghost zones: edge cells exclude the missing direction (no
    periodic wrap)."""
    rng = np.random.RandomState(4)
    d = 10.0 ** rng.uniform(-1, 1, (4, 4, 4))
    sl = (slice(0, 4), slice(0, 4), slice(0, 4))
    dx_cgs, xbase1 = 1.1, 1.0e7
    got = np.asarray(sobolev_shield_length(d, xbase1, dx_cgs))
    want = numpy_sobolev(d, sl, dx_cgs, xbase1)
    np.testing.assert_allclose(got, want, rtol=1e-13)
    # explicit anti-wrap check on one corner: a periodic stencil would
    # read d[-1,...]; recompute the corner with wrapped neighbors and
    # assert we do NOT reproduce it unless it happens to agree
    divrho_wrap = 1.0e-20
    for da, db, dc in [(1, 0, 0), (-1, 0, 0), (0, 1, 0),
                       (0, -1, 0), (0, 0, 1), (0, 0, -1)]:
        diff = d[da % 4, db % 4, dc % 4] - d[0, 0, 0]
        if diff < 0.0:
            divrho_wrap += diff
    l_wrap = min(dx_cgs * d[0, 0, 0] / abs(divrho_wrap), xbase1)
    if not np.isclose(l_wrap, want[0, 0, 0]):
        assert not np.isclose(got[0, 0, 0], l_wrap)


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


def _grid_fields(shape, rng):
    tiny = 1e-20
    f = {"density": 10.0 ** rng.uniform(2, 4, shape)}
    f["HI"] = 0.76 * f["density"] * (1 - 1e-3)
    f["HII"] = np.full(shape, tiny)
    f["HeI"] = 0.24 * f["density"]
    f["HeII"] = np.full(shape, tiny)
    f["HeIII"] = np.full(shape, tiny)
    f["de"] = np.full(shape, tiny)
    f["HM"] = np.full(shape, tiny)
    f["H2I"] = 0.76e-3 * f["density"]
    f["H2II"] = np.full(shape, tiny)
    f["energy"] = np.full(shape, 1.0e-3)
    return f


def test_grid_solve_reads_ghost_densities():
    """End-to-end: option-1 grid solve equals the flat solve fed with
    NumPy-reference shielding lengths, and responds to ghost values."""
    cd = make_chem(LWbackground_intensity=1.0e3, H2_self_shielding=1)
    shape = (5, 5, 5)
    rng = np.random.RandomState(11)
    fields = _grid_fields(shape, rng)
    start, end = [1, 1, 1], [3, 3, 3]
    sl = tuple(slice(s, e + 1) for s, e in zip(start, end))
    grid_dx = 0.1

    new_f, _ = solve_chemistry_grid(
        cd.context, fields, 1.0e-5, grid_start=start, grid_end=end,
        grid_dx=grid_dx,
    )

    ctx = cd.context
    us = make_unit_scalars(ctx.config, ctx.tables, ctx.units, grid_dx)
    l_ref = numpy_sobolev(fields["density"], sl,
                          float(us.dx_cgs), float(us.xbase1))
    flat = {k: v[sl].reshape(-1) for k, v in fields.items()}
    flat_out, _ = cd.solve_chemistry(
        flat, 1.0e-5, grid_dx=grid_dx, l_h2shield=l_ref.reshape(-1)
    )
    np.testing.assert_allclose(
        new_f["H2I"][sl].reshape(-1), np.asarray(flat_out["H2I"]),
        rtol=1e-12,
    )

    # ghost densities MUST matter: crank the ghost layer down so every
    # boundary-active cell sees a steep negative gradient
    fields2 = {k: v.copy() for k, v in fields.items()}
    ghost_mask = np.ones(shape, dtype=bool)
    ghost_mask[sl] = False
    fields2["density"][ghost_mask] = 1.0e-6
    new_f2, _ = solve_chemistry_grid(
        cd.context, fields2, 1.0e-5, grid_start=start, grid_end=end,
        grid_dx=grid_dx,
    )
    face = new_f["H2I"][1, 1:4, 1:4]
    face2 = new_f2["H2I"][1, 1:4, 1:4]
    assert not np.allclose(face, face2), (
        "ghost-zone densities had no effect on boundary-cell shielding"
    )
    # interior cell (2,2,2) touches no ghost neighbor: identical
    np.testing.assert_allclose(
        new_f["H2I"][2, 2, 2], new_f2["H2I"][2, 2, 2], rtol=1e-12
    )


def test_flat_solve_grid_shape_still_works():
    """The flat entry point's grid_shape path (full grid == active)."""
    cd = make_chem(LWbackground_intensity=1.0e3, H2_self_shielding=1)
    rng = np.random.RandomState(12)
    fields = _grid_fields((2, 2, 2), rng)
    flat = {k: v.reshape(-1) for k, v in fields.items()}
    new_f, _ = cd.solve_chemistry(flat, 1.0e-5, grid_dx=0.1,
                                  grid_shape=(2, 2, 2))
    assert np.all(np.isfinite(np.asarray(new_f["H2I"])))
