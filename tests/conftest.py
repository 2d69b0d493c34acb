"""Test configuration: run everything on a virtual 8-device CPU mesh.

NOTE: in this environment jax is pre-imported by a site hook before any
test code runs, so JAX_PLATFORMS env changes are too late — but the backend
is not yet initialized, so `jax.config.update` still selects the platform,
and XLA_FLAGS is still read at backend creation.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("FRT_TEST_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", False)
