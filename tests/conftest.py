"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests run on a simulated mesh) and enable x64 so fp64 parity configs work.

Note: the session environment registers a TPU PJRT plugin via sitecustomize
and pins JAX_PLATFORMS=axon; the env var route is therefore overridden, and
only `jax.config.update("jax_platforms", ...)` reliably selects CPU here.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
