"""Test harness config: force an 8-virtual-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so every test runs on the CPU
backend with 8 virtual devices (`--xla_force_host_platform_device_count=8`),
exercising the same jit/shard_map code paths the TPU mesh uses. This must run
before any JAX backend initialization — conftest import time is early enough
because the framework initializes backends lazily.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
