"""Multi-host (multi-slice) initialization.

The reference's multi-node story is "each MPI rank links the library and
calls it on its own subgrid" (grackle: src/clib/grackle.h:56-60); the
TPU-native equivalent is ``jax.distributed`` + a global mesh: cells are
data-parallel across every chip of every slice (ICI within a slice, DCN
across slices — and since the solve has zero collectives, DCN never
carries solver traffic).
"""

from __future__ import annotations

import jax

from .sharding import CELL_AXIS, make_cell_mesh


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize jax.distributed for a multi-host run.

    No-op for a single-process run (no coordinator given and no
    auto-detectable cluster) and when already initialized; returns
    (process_count, process_index) either way.
    """
    if coordinator_address is None and num_processes in (None, 1):
        # single-process: nothing to coordinate
        return jax.process_count(), jax.process_index()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized
        pass
    return jax.process_count(), jax.process_index()


def global_cell_mesh(axis_name: str = CELL_AXIS):
    """1-D mesh over every addressable device across all hosts."""
    return make_cell_mesh(jax.devices(), axis_name)
