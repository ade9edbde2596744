"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4). Must run before
jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tokenizer():
    from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer

    return ByteLevelTokenizer()
