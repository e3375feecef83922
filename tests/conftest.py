"""Test harness: 8 virtual CPU devices so multi-device mesh tests run
without TPU hardware (SURVEY.md §4).

Note: XLA_FLAGS=--xla_force_host_platform_device_count is TOO LATE here —
this environment's sitecustomize imports jax at interpreter startup. The
jax_num_cpu_devices config still works pre-backend-initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# parity tests compare against torch fp32; JAX's DEFAULT matmul precision
# uses reduced-precision passes even on CPU (oneDNN)
jax.config.update("jax_default_matmul_precision", "highest")
# compilation in this environment is slow (~0.6 s per new computation); the
# persistent cache makes test reruns cheap
jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
