"""Public API.

TPU-native analogue of the reference's 3-tier public surface
(grackle: src/clib/grackle.h:14-187 and the pygrackle ``chemistry_data``
class, src/python/pygrackle/grackle_wrapper.pyx:22-1051):

* :class:`ChemistryData` — the mutable parameter object with
  pygrackle-compatible attribute and string-keyed access
  (src/clib/dynamic_api.c:35-116), plus code-unit attributes and derived
  unit properties.
* ``initialize()`` builds a :class:`GrackleContext`: rate tables and data
  files become device-resident pytrees, and the solve/derived-field entry
  points are jitted with the frozen config as a static argument -- the
  re-entrant ``local_*`` API falls out for free because every context is an
  independent value (no globals).
* module functions ``solve_chemistry``, ``calculate_cooling_time``,
  ``calculate_temperature``, ``calculate_pressure``, ``calculate_gamma``,
  ``calculate_dust_temperature`` (grackle.h:52-102).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    PARAMETER_REGISTRY,
    ChemistryConfig,
    resolve_config,
)
from .data.cloudy import (
    CloudyTable,
    empty_cloudy_table,
    is_old_style,
    load_cloudy_table,
)
from .data.uvb import load_uvb_table, update_uvb_rates, uvb_redshift_bounds
from .ops import derived as _derived
from .ops import solver as _solver
from .ops.common import make_unit_scalars, photo_rates_from_tables
from .rates.tables import build_rate_tables
from .units import CodeUnits

_UNIT_FIELDS = [
    "comoving_coordinates", "density_units", "length_units",
    "time_units", "a_units", "a_value",
]


@dataclasses.dataclass
class GrackleContext:
    """Everything needed to run the solver: the re-entrant analogue of
    (chemistry_data, chemistry_data_storage, code_units)."""

    config: Any  # frozen ChemistryConfig (JIT-static)
    units: CodeUnits
    tables: Any
    cloudy_primordial: CloudyTable
    cloudy_metal: CloudyTable
    uvb: Any = None
    cloudy_data_new: bool = True


def initialize(cfg: "ChemistryConfig", units: CodeUnits) -> GrackleContext:
    """Build rate tables + data tables (analogue of
    initialize_chemistry_data, grackle:
    src/clib/initialize_chemistry_data.c:60-247)."""
    units.validate()
    cfg = resolve_config(cfg)

    if cfg.use_fused_lookup < 0:
        # auto: fused two-hot matmul lookups on accelerators, native
        # gathers on CPU
        backend = jax.default_backend()
        cfg = dataclasses.replace(
            cfg, use_fused_lookup=0 if backend == "cpu" else 1
        )

    cloudy_data_new = True
    read_prim = cfg.primordial_chemistry == 0
    read_met = cfg.metal_cooling == 1
    if (read_prim or read_met) and not cfg.grackle_data_file:
        raise ValueError(
            "tabulated/metal cooling requires grackle_data_file"
        )

    if read_prim or read_met:
        cloudy_data_new = not is_old_style(cfg.grackle_data_file)

    from .ops.common import solver_dtype as _sd

    cloudy_prim = (
        load_cloudy_table(
            cfg.grackle_data_file, "Primordial", units,
            read_heating=cfg.UVbackground == 1,
            read_mmw=True, dtype=_sd(cfg),
        )
        if read_prim
        else empty_cloudy_table()
    )
    cloudy_met = (
        load_cloudy_table(
            cfg.grackle_data_file, "Metals", units,
            read_heating=cfg.UVbackground == 1,
            read_mmw=False, dtype=_sd(cfg),
        )
        if read_met
        else empty_cloudy_table()
    )

    uvb = None
    if cfg.UVbackground == 1 and cfg.primordial_chemistry > 0:
        uvb = load_uvb_table(cfg.grackle_data_file, cfg, dtype=_sd(cfg))
        updates = uvb_redshift_bounds(cfg, uvb)
        if updates:
            cfg = dataclasses.replace(cfg, **updates)

    from .ops.common import solver_dtype

    tables = build_rate_tables(cfg, units, dtype=solver_dtype(cfg))

    from . import info as _info
    if _info.grackle_verbose:
        v = __import__(
            "grackle_tpu.version", fromlist=["get_grackle_version"]
        ).get_grackle_version()
        print(f"grackle_tpu {v.version} ({v.branch}@{v.revision[:12]})")
        print("Initializing grackle_tpu data.")
        _info.show_parameters(cfg)
        _info.write_info_file(cfg, units)

    return GrackleContext(
        config=cfg,
        units=units,
        tables=tables,
        cloudy_primordial=cloudy_prim,
        cloudy_metal=cloudy_met,
        uvb=uvb,
        cloudy_data_new=cloudy_data_new,
    )


def _photo_rates(cfg, tables, uvb, units):
    """solve_chemistry.c:103-137."""
    if cfg.UVbackground == 1 and uvb is not None:
        return update_uvb_rates(cfg, uvb, units)
    return photo_rates_from_tables(tables)


@partial(
    jax.jit,
    static_argnames=("cfg", "imetal", "cloudy_data_new", "comoving"),
)
def _solve_chemistry_core(
    cfg, tables, cloudy_prim, cloudy_met, us, pr, fields, dt,
    l_h2shield_field, imetal, cloudy_data_new, comoving,
):
    result = _solver.solve_rate_cool(
        cfg, tables, cloudy_prim, cloudy_met, pr, us, fields, dt,
        imetal=imetal, cloudy_data_new=cloudy_data_new,
        l_h2shield_field=l_h2shield_field, comoving=comoving,
    )
    return (result.fields, result.n_iterations, result.converged,
            result.cell_iterations)


# --- converged-cell compaction -------------------------------------
#
# The subcycle count per cell is heavy-tailed, so the monolithic
# while_loop makes every cell ride along until the slowest converges.
# solve_rate_cool_compacted runs the loop batch-wise entirely inside
# one jit (zero host syncs): see its docstring.  _compact_batch picks
# an absolute ~80k-cell batch clamped to n/4 (floored at
# _COMPACT_MIN_BUCKET; GTPU_COMPACT_BATCH overrides).

_COMPACT_MIN_BUCKET = 8192


def solve_path(cfg, n):
    """Which solve implementation a given (config, cell count) uses:
    'exact' | 'compact' | 'monolithic'.  Single source of truth for the
    stateful API (solve_chemistry below) and the functional closures
    (functional.make_solve_fn), which promise identical results."""
    if cfg.exact_cooling == 1 and cfg.with_radiative_cooling == 1:
        return "exact"
    if cfg.solver_compaction > 0 and n >= 4 * _COMPACT_MIN_BUCKET:
        return "compact"
    return "monolithic"


def _compact_batch(n):
    # Measured sweet spot on v5e is an ABSOLUTE batch of ~80k cells
    # regardless of n (bigger batches waste lanes on stragglers, smaller
    # ones lose to the fixed per-subcycle dispatch floor), clamped
    # to n/4 so small arrays still compact usefully.  Re-tuned after the
    # sorted-scatter + split-pack traffic reductions (the cheaper trips
    # moved the optimum up from ~48k; see docs/Performance.md).
    env = os.environ.get("GTPU_COMPACT_BATCH")
    try:
        target = int(env) if env else 81920
    except ValueError as exc:
        raise ValueError(
            f"GTPU_COMPACT_BATCH must be an integer, got {env!r}"
        ) from exc
    return max(_COMPACT_MIN_BUCKET, min(target, n // 4))


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "imetal", "cloudy_data_new", "comoving", "batch", "warm",
    ),
)
def _solve_chemistry_core_compact(
    cfg, tables, cloudy_prim, cloudy_met, us, pr, fields, dt,
    l_h2shield_field, imetal, cloudy_data_new, comoving,
    batch, warm,
):
    result = _solver.solve_rate_cool_compacted(
        cfg, tables, cloudy_prim, cloudy_met, pr, us, fields, dt,
        imetal=imetal, cloudy_data_new=cloudy_data_new,
        l_h2shield_field=l_h2shield_field, comoving=comoving,
        warm=warm, batch=batch,
    )
    return (result.fields, result.n_iterations, result.converged,
            result.cell_iterations)


@partial(jax.jit, static_argnames=("cfg", "imetal", "comoving"))
def _solve_chemistry_core_exact(
    cfg, cloudy_prim, cloudy_met, us, pr, fields, dt, imetal, comoving,
):
    """Exact-integration tabulated cooling (ops/exact_cool.py): one
    closed-form pass instead of the subcycle loop."""
    from .ops import exact_cool as _exact

    f = dict(fields)
    if comoving:
        f = _solver.scale_fields(cfg, f, us.aye**-3, imetal)
    new_energy = _exact.exact_cool_step(
        cfg, cloudy_prim, cloudy_met, pr, us, f, dt, imetal
    )
    out = dict(fields)
    out["energy"] = new_energy
    n = fields["density"].shape[0]
    return (
        out,
        jnp.int32(1),
        jnp.ones((n,), dtype=bool),
        jnp.ones((n,), dtype=jnp.int32),
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "imetal", "cloudy_data_new", "comoving"),
)
def _cooling_time_core(
    cfg, tables, cloudy_prim, cloudy_met, us, pr, fields,
    imetal, cloudy_data_new, comoving,
):
    return _derived.calculate_cooling_time(
        cfg, tables, cloudy_prim, cloudy_met, pr, us, fields,
        imetal=imetal, cloudy_data_new=cloudy_data_new, comoving=comoving,
    )


@partial(jax.jit, static_argnames=("cfg", "imetal"))
def _temperature_core(cfg, tables, cloudy_prim, us, fields, imetal):
    return _derived.calculate_temperature(
        cfg, cloudy_prim, us, fields, imetal
    )


@partial(jax.jit, static_argnames=("cfg", "imetal"))
def _pressure_core(cfg, tables, us, fields, imetal):
    return _derived.calculate_pressure(cfg, us, fields, imetal)


@partial(jax.jit, static_argnames=("cfg", "imetal"))
def _gamma_core(cfg, tables, cloudy_prim, us, fields, imetal):
    return _derived.calculate_gamma(cfg, cloudy_prim, us, fields, imetal)


@partial(jax.jit, static_argnames=("cfg", "imetal"))
def _dust_temperature_core(cfg, tables, cloudy_prim, us, units, fields,
                           imetal):
    return _derived.calculate_dust_temperature(
        cfg, tables, cloudy_prim, us, fields, units, imetal
    )


def _prep_fields(ctx, fields):
    """Convert a field dict to the solver dtype (the gr_float analogue);
    detect the metal field."""
    from .ops.common import solver_dtype

    dtype = solver_dtype(ctx.config)
    f = {}
    for key, val in fields.items():
        if val is None:
            continue
        f[key] = jnp.asarray(val, dtype=dtype)
    imetal = "metal" in f
    return f, imetal


def sobolev_shield_length(density_grid, xbase1, dx_cgs):
    """Sobolev-like H2-shielding length for H2_self_shielding == 1 from
    the 6-point 3-D density stencil (solve_rate_cool_g.F:1418-1434).

    Operates on the FULL grid (ghost zones included), so boundary cells
    of the active region read their real ghost-zone neighbors, exactly
    like the reference's d(i±1,j,k) loads.  At a true array edge the
    missing neighbor is edge-replicated, giving diff = 0 which the
    reference's "only drho/ds < 0 directions" rule excludes — i.e. a
    one-sided stencil.  Returns a grid-shaped array; callers slice the
    active region and ravel.
    """
    d = density_grid
    dp = jnp.pad(d, 1, mode="edge")
    inner = [slice(1, -1)] * 3
    divrho = jnp.full_like(d, 1.0e-20)
    for axis in range(3):
        for lo in (False, True):
            sl = list(inner)
            sl[axis] = slice(0, -2) if lo else slice(2, None)
            diff = dp[tuple(sl)] - d
            divrho = divrho + jnp.where(diff < 0.0, diff, 0.0)
    return jnp.minimum(dx_cgs * d / jnp.abs(divrho), xbase1)


def solve_chemistry(ctx: GrackleContext, fields, dt,
                    grid_dx: float = 0.0, grid_shape=None,
                    l_h2shield=None):
    """Advance chemistry + energy by dt (grackle.h:64, solve_chemistry.c).

    fields: dict of flat arrays (code units).  Returns (new_fields dict,
    diagnostics dict with n_iterations and converged mask).

    l_h2shield: optional precomputed per-cell shielding length (cgs) for
    H2_self_shielding == 1 — used by the grid entry points, which must
    evaluate the density stencil on the full grid including ghost zones
    before slicing the active region (solve_rate_cool_g.F:1420-1434).
    """
    cfg = ctx.config
    f, imetal = _prep_fields(ctx, fields)
    l_h2 = None
    if cfg.H2_self_shielding == 1:
        if l_h2shield is not None:
            from .ops.common import solver_dtype as _sd

            l_h2 = jnp.asarray(l_h2shield, dtype=_sd(cfg)).reshape(-1)
        elif grid_shape is None or len(grid_shape) != 3:
            raise ValueError(
                "H2_self_shielding option 1 requires a 3-D grid_shape "
                "(solve_chemistry.c:157-165); use option 2 to provide "
                "shielding lengths or option 3 for the Jeans length."
            )
        else:
            us = make_unit_scalars(cfg, ctx.tables, ctx.units, grid_dx)
            d_grid = f["density"].reshape(grid_shape)
            l_h2 = sobolev_shield_length(
                d_grid, us.xbase1, us.dx_cgs
            ).reshape(-1)
    from .ops.common import solver_dtype

    dtype = solver_dtype(cfg)
    n = f["density"].shape[0] if f["density"].ndim == 1 else 0
    comoving = bool(ctx.units.comoving_coordinates)
    # unit scalars and UVB photo rates are per-call HOST work (the
    # reference likewise computes them in C per call,
    # update_UVbackground_rates.c:25-289): with python-float code units
    # the arithmetic runs in true host f64, avoiding the TPU backend's
    # range-limited f64 emulation (intermediates like time_units**3
    # overflow the f32-pair representation and NaN when traced).
    us = make_unit_scalars(cfg, ctx.tables, ctx.units, grid_dx)
    pr = _photo_rates(cfg, ctx.tables, ctx.uvb, ctx.units)
    path = solve_path(cfg, n)
    if path == "exact":
        new_f, n_iter, converged, cell_iter = _solve_chemistry_core_exact(
            cfg, ctx.cloudy_primordial, ctx.cloudy_metal,
            us, pr, f, jnp.asarray(dt, dtype), imetal, comoving,
        )
    elif path == "compact":
        new_f, n_iter, converged, cell_iter = _solve_chemistry_core_compact(
            cfg, ctx.tables, ctx.cloudy_primordial, ctx.cloudy_metal,
            us, pr, f, jnp.asarray(dt, dtype),
            l_h2, imetal,
            ctx.cloudy_data_new, comoving,
            _compact_batch(n), int(cfg.solver_compaction),
        )  # solver_compaction = warm-phase subcycle count
    else:
        new_f, n_iter, converged, cell_iter = _solve_chemistry_core(
            cfg, ctx.tables, ctx.cloudy_primordial, ctx.cloudy_metal,
            us, pr, f, jnp.asarray(dt, dtype),
            l_h2, imetal, ctx.cloudy_data_new, comoving,
        )
    diagnostics = {"n_iterations": n_iter, "converged": converged,
                   "cell_iterations": cell_iter}
    if cfg.exit_after_iterations_exceeded:
        # analogue of the reference's hard failure when the subcycle cap
        # is hit (solve_rate_cool_g.F:823-843 honoring exititmax); forces
        # a sync, so it is only checked when the flag is on.
        if not bool(np.all(np.asarray(converged))):
            raise RuntimeError(
                f"solve_chemistry: iteration count exceeded "
                f"max_iterations = {cfg.max_iterations} before all cells "
                f"reached dt."
            )
    return new_f, diagnostics


def solve_chemistry_grid(ctx: GrackleContext, fields, dt,
                         grid_start=None, grid_end=None,
                         grid_dx: float = 0.0):
    """solve_chemistry for multi-dimensional grids with ghost zones.

    fields: dict of arrays of a common grid shape (any rank).  Only the
    active region [grid_start, grid_end] (inclusive, per axis — the
    reference's convention, grackle: grackle_types.h:44-46) is evolved;
    ghost zones pass through untouched.  H2_self_shielding == 1 uses the
    full grid's density stencil, exactly like the reference
    (solve_rate_cool_g.F:1420-1434).
    """
    shape = np.shape(next(iter(fields.values())))
    rank = len(shape)
    if grid_start is None:
        grid_start = [0] * rank
    if grid_end is None:
        grid_end = [s - 1 for s in shape]
    sl = tuple(slice(s, e + 1) for s, e in zip(grid_start, grid_end))

    flat = {}
    for key, val in fields.items():
        if val is None:
            continue
        flat[key] = np.asarray(val)[sl].reshape(-1)

    l_h2 = None
    if ctx.config.H2_self_shielding == 1:
        if rank != 3:
            raise ValueError(
                "H2_self_shielding option 1 requires 3-D grids"
            )
        # stencil on the FULL grid (ghost zones included), then slice to
        # the active region — reference semantics: boundary active cells
        # read real ghost-zone neighbor densities
        # (solve_rate_cool_g.F:1420-1434)
        us = make_unit_scalars(ctx.config, ctx.tables, ctx.units, grid_dx)
        d_full = jnp.asarray(np.asarray(fields["density"]))
        l_h2 = sobolev_shield_length(
            d_full, us.xbase1, us.dx_cgs
        )[sl].reshape(-1)
    new_flat, diag = solve_chemistry(ctx, flat, dt, grid_dx,
                                     l_h2shield=l_h2)

    out = {}
    for key, val in fields.items():
        if val is None:
            continue
        arr = np.array(val)
        if key in new_flat:
            arr[sl] = np.asarray(
                new_flat[key], dtype=arr.dtype
            ).reshape(arr[sl].shape)
        out[key] = arr
    return out, diag


def calculate_cooling_time(ctx: GrackleContext, fields):
    f, imetal = _prep_fields(ctx, fields)
    us = make_unit_scalars(ctx.config, ctx.tables, ctx.units)
    pr = _photo_rates(ctx.config, ctx.tables, ctx.uvb, ctx.units)
    return _cooling_time_core(
        ctx.config, ctx.tables, ctx.cloudy_primordial, ctx.cloudy_metal,
        us, pr, f, imetal, ctx.cloudy_data_new,
        bool(ctx.units.comoving_coordinates),
    )


def calculate_temperature(ctx: GrackleContext, fields):
    f, imetal = _prep_fields(ctx, fields)
    us = make_unit_scalars(ctx.config, ctx.tables, ctx.units)
    return _temperature_core(
        ctx.config, ctx.tables, ctx.cloudy_primordial, us, f,
        imetal,
    )


def calculate_pressure(ctx: GrackleContext, fields):
    f, imetal = _prep_fields(ctx, fields)
    us = make_unit_scalars(ctx.config, ctx.tables, ctx.units)
    return _pressure_core(ctx.config, ctx.tables, us, f, imetal)


def calculate_gamma(ctx: GrackleContext, fields):
    f, imetal = _prep_fields(ctx, fields)
    us = make_unit_scalars(ctx.config, ctx.tables, ctx.units)
    return _gamma_core(
        ctx.config, ctx.tables, ctx.cloudy_primordial, us, f,
        imetal,
    )


def calculate_dust_temperature(ctx: GrackleContext, fields):
    f, imetal = _prep_fields(ctx, fields)
    us = make_unit_scalars(ctx.config, ctx.tables, ctx.units)
    return _dust_temperature_core(
        ctx.config, ctx.tables, ctx.cloudy_primordial, us, ctx.units, f,
        imetal,
    )


class ChemistryData:
    """pygrackle-compatible parameter object.

    Set parameters as attributes (or string keys), set the unit attributes,
    then call :meth:`initialize`.  After initialization the solve and
    calculate_* methods are live.  (grackle:
    src/python/pygrackle/grackle_wrapper.pyx:22-96,943-1051)
    """

    def __init__(self, **kwargs):
        object.__setattr__(self, "_params", {
            name: default for name, (_, default) in
            PARAMETER_REGISTRY.items()
        })
        object.__setattr__(self, "_units", {
            "comoving_coordinates": 0,
            "density_units": 1.0,
            "length_units": 1.0,
            "time_units": 1.0,
            "a_units": 1.0,
            "a_value": 1.0,
        })
        object.__setattr__(self, "_context", None)
        for key, val in kwargs.items():
            setattr(self, key, val)

    # --- attribute access routed through the registry
    #     (dynamic_api.c analogue) ---

    def __getattr__(self, name):
        params = object.__getattribute__(self, "_params")
        units = object.__getattribute__(self, "_units")
        if name in params:
            return params[name]
        if name in units:
            return units[name]
        # rate-table views after initialize, like pygrackle's read-only
        # NumPy views of k1..k58 / cooling coefficient tables
        # (grackle_wrapper.pyx:98-549)
        ctx = object.__getattribute__(self, "_context")
        if (ctx is not None and not name.startswith("_")
                and hasattr(ctx.tables, name)):
            val = getattr(ctx.tables, name)
            if val is not None:
                view = np.asarray(val)
                view.flags.writeable = False
                return view
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if name in self._params:
            ptype = PARAMETER_REGISTRY[name][0]
            self._params[name] = ptype(value)
        elif name in self._units:
            self._units[name] = value
        else:
            raise AttributeError(
                f"unknown chemistry_data attribute: {name}"
            )

    # string-keyed dynamic API (dynamic_api.c:35-116)
    def __getitem__(self, key):
        return getattr(self, key)

    def __setitem__(self, key, value):
        setattr(self, key, value)

    def parameter_names(self):
        return list(self._params)

    # --- units ---

    @property
    def code_units(self) -> CodeUnits:
        return CodeUnits(**self._units)

    @property
    def velocity_units(self):
        return self.code_units.velocity_units

    @property
    def temperature_units(self):
        return self.code_units.temperature_units

    @property
    def energy_units(self):
        return self.code_units.energy_units

    @property
    def pressure_units(self):
        return self.code_units.pressure_units

    @property
    def cooling_units(self):
        return self.code_units.coolunit

    def set_velocity_units(self):
        """No-op for API parity: velocity units are always derived from
        length/time/a (grackle_units.c:24-36)."""
        return self.velocity_units

    # --- lifecycle ---

    def initialize(self) -> int:
        cfg = ChemistryConfig(**self._params)
        try:
            ctx = initialize(cfg, self.code_units)
        except Exception:
            raise
        object.__setattr__(self, "_context", ctx)
        # propagate derived parameter values back (e.g. tabulated-mode
        # HydrogenFractionByMass, photoelectric_heating resolution)
        for name in self._params:
            self._params[name] = getattr(ctx.config, name)
        return 1

    @property
    def config(self) -> "ChemistryConfig":
        """The frozen parameter struct for the current parameter values
        (the chemistry_data struct, grackle_chemistry_data.h:20-178).
        Usable before initialize() — e.g. for evaluating individual
        rate functions (docs/RateFunctions.md); after initialize() this
        is the resolved config the solver runs with."""
        if self._context is not None:
            return self._context.config
        return ChemistryConfig(**self._params)

    @property
    def context(self) -> Optional[GrackleContext]:
        return self._context

    def refresh_units(self):
        """Rebuild the context units view after unit attributes change
        (e.g. a_value updates in a cosmological run)."""
        if self._context is not None:
            self._context.units = self.code_units

    # --- solver entry points ---

    def _require_context(self):
        if self._context is None:
            raise RuntimeError(
                "chemistry_data not initialized; call initialize()"
            )
        self.refresh_units()
        return self._context

    def solve_chemistry(self, fields, dt, grid_dx=0.0, grid_shape=None,
                        l_h2shield=None):
        return solve_chemistry(self._require_context(), fields, dt,
                               grid_dx, grid_shape, l_h2shield)

    def solve_chemistry_grid(self, fields, dt, grid_start=None,
                             grid_end=None, grid_dx=0.0):
        return solve_chemistry_grid(self._require_context(), fields, dt,
                                    grid_start, grid_end, grid_dx)

    def calculate_cooling_time(self, fields):
        return calculate_cooling_time(self._require_context(), fields)

    def calculate_temperature(self, fields):
        return calculate_temperature(self._require_context(), fields)

    def calculate_pressure(self, fields):
        return calculate_pressure(self._require_context(), fields)

    def calculate_gamma(self, fields):
        return calculate_gamma(self._require_context(), fields)

    def calculate_dust_temperature(self, fields):
        return calculate_dust_temperature(self._require_context(), fields)
