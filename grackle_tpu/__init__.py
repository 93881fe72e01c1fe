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

from .config import ChemistryConfig, PARAMETER_REGISTRY, default_config, resolve_config  # noqa: F401,E402
from .units import CodeUnits, set_cosmology_units  # noqa: F401,E402
from .rates import RateTables, build_rate_tables  # noqa: F401,E402
