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

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
# this box's XLA:CPU (oneDNN) runs f32 matmuls in bf16 by default; force full
# precision so numerical parity tests against torch are meaningful
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
