import os

# Run the test suite on a virtual 8-device CPU mesh. The container's
# sitecustomize imports jax and registers the axon (TPU-tunnel) PJRT
# backend before this file runs, so mutating JAX_PLATFORMS here is too
# late; use jax.config.update, which takes effect as long as no backend
# has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
