import os

# Tests run on a virtual 8-device CPU mesh with float64/complex128 enabled,
# so numerics can be validated to 1e-10 against the NumPy oracle.
#
# NOTE: this machine's sitecustomize pins JAX_PLATFORMS=axon (TPU) and
# imports jax at interpreter start, so env vars alone are too late —
# jax.config.update is the reliable override (CPU client is created lazily).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
