"""Test configuration: run JAX on a virtual 8-device CPU mesh.

jax is pre-imported at interpreter start in this image (a .pth hook),
so JAX_PLATFORMS from the ambient environment is already latched —
override via jax.config instead.  XLA_FLAGS is still read lazily at
backend-client creation, so setting it here works as long as no
computation ran yet.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
