"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports so
multi-device mesh tests run without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# parity tests compare against torch fp32; JAX's DEFAULT matmul precision
# uses reduced-precision passes even on CPU (oneDNN), so force full fp32
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

jax.config.update("jax_default_matmul_precision", "highest")
# compilation in this environment is slow (~0.6 s per new computation); the
# persistent cache makes test reruns cheap
jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
