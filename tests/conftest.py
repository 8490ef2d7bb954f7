"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI; every sharding/collective
test runs against 8 virtual CPU devices instead (the JAX-recommended way to
test pjit/shard_map logic without TPUs). Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-register a hardware backend (e.g. a tunneled TPU
# plugin) at interpreter startup; override the platform selection after the
# fact — this wins as long as no backend has been instantiated yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
