"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4). Must run before
jax is imported anywhere.
"""

import os

# force CPU: the session env pins JAX_PLATFORMS=axon (real TPU), but tests
# must run on the virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon sitecustomize registers the TPU backend and pins JAX_PLATFORMS=axon
# at interpreter boot; flipping the config AFTER import reliably lands on the
# 8-device virtual CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
# force full-precision matmuls so numerical parity tests against torch are
# meaningful (default f32 matmul accumulation is bf16-ish on some backends)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tokenizer():
    from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer

    return ByteLevelTokenizer()
