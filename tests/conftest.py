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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The suite compiles hundreds of XLA CPU executables (several very
    large interpret-mode Pallas kernels among them); keeping them all
    live in one process has produced sporadic segfaults inside later
    `backend_compile` calls (LLVM JIT state accumulation). Per-module
    cache clearing keeps the resident compiled-code footprint bounded;
    cross-module recompiles are rare because fixtures don't cross
    modules either."""
    yield
    jax.clear_caches()
