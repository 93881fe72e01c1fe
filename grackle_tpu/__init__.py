"""grackle_tpu: TPU-native chemistry and radiative cooling library.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the Grackle
chemistry and cooling library (brittonsmith/grackle) for TPU hardware:
non-equilibrium primordial chemistry (6/9/12-species), radiative
cooling/heating, tabulated Cloudy cooling, UV backgrounds, dust physics,
and derived-field calculators -- all as batched, jittable array programs
over a flat cell axis.
"""

__version__ = "0.1.0"

# Double precision is required for parity with the reference library
# (grackle: src/clib/grackle_types.h:24-34, CONFIG_PRECISION=64).
import jax as _jax

_jax.config.update("jax_enable_x64", True)

from .config import (  # noqa: F401,E402
    ChemistryConfig, PARAMETER_REGISTRY, default_config, resolve_config,
)
from .units import CodeUnits  # noqa: F401,E402
from .units import set_cosmology_units as make_cosmology_units  # noqa: F401,E402
from .rates import RateTables, build_rate_tables  # noqa: F401,E402

# pygrackle-compatible surface (grackle: src/python/pygrackle/__init__.py)
from .api import (  # noqa: F401,E402
    ChemistryData,
    GrackleContext,
    calculate_cooling_time,
    calculate_dust_temperature,
    calculate_gamma,
    calculate_pressure,
    calculate_temperature,
    initialize,
    solve_chemistry,
)
from .fluid_container import FluidContainer  # noqa: F401,E402
from .utilities.convenience import setup_fluid_container  # noqa: F401,E402
from .utilities.evolve import (  # noqa: F401,E402
    evolve_constant_density,
    evolve_freefall,
)
# pygrackle-style mutating form: set_cosmology_units(chemistry_data, ...)
from .utilities.units import set_cosmology_units  # noqa: F401,E402
from . import functional  # noqa: F401,E402
from .version import get_grackle_version  # noqa: F401,E402
from .info import set_verbose, show_parameters  # noqa: F401,E402

# pygrackle's class is lowercase
chemistry_data = ChemistryData


def add_grackle_fields(*args, **kwargs):
    """Lazy yt integration (requires yt)."""
    from .yt_fields import add_grackle_fields as _impl

    return _impl(*args, **kwargs)
