"""Test configuration: force an 8-device virtual CPU mesh.

Tests validate numerics and sharding on CPU (the TPU analogue of a fake
backend); the real chip is exercised by bench.py and the TPU parity suite.

Note: under the axon TPU tunnel, the JAX_PLATFORMS env var is overridden at
interpreter start, so the platform must be forced programmatically via
jax.config (backends initialize lazily, so this works as long as it happens
before the first jax.devices()).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
