"""Chunked attention must match the dense path exactly (no dropout)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import T5Config
from vidchapters_tpu.models.t5 import T5Attention


def test_chunked_matches_dense(rng):
    cfg = T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                   num_decoder_layers=1, num_heads=4, dtype="float32")
    attn = T5Attention(cfg)
    # length above the chunking threshold and not a multiple of the chunk
    lq = lk = 600
    x = jnp.asarray(rng.normal(size=(2, lq, 32)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(1, 4, lq, lk)), jnp.float32)
    key_mask = jnp.ones((2, lk), jnp.int32).at[0, -37:].set(0)
    params = attn.init(jax.random.PRNGKey(0), x, x, bias, 0.0, True,
                       key_mask=key_mask)["params"]

    out_chunked, _ = attn.apply({"params": params}, x, x, bias, 0.0, True,
                                key_mask=key_mask)
    # force dense path by monkeypatching the threshold
    old = T5Attention.CHUNK
    try:
        T5Attention.CHUNK = 10 ** 9
        out_dense, _ = attn.apply({"params": params}, x, x, bias, 0.0, True,
                                  key_mask=key_mask)
    finally:
        T5Attention.CHUNK = old
    np.testing.assert_allclose(np.asarray(out_chunked), np.asarray(out_dense),
                               rtol=1e-5, atol=1e-5)


def test_chunked_dropout_deterministic_per_rng(rng):
    cfg = T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                   num_decoder_layers=1, num_heads=4, dtype="float32")
    attn = T5Attention(cfg)
    lq = 300
    x = jnp.asarray(rng.normal(size=(1, lq, 32)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x, x, None, 0.0, True)["params"]
    a, _ = attn.apply({"params": params}, x, x, None, 0.3, False,
                      rngs={"dropout": jax.random.PRNGKey(7)})
    b, _ = attn.apply({"params": params}, x, x, None, 0.3, False,
                      rngs={"dropout": jax.random.PRNGKey(7)})
    c, _ = attn.apply({"params": params}, x, x, None, 0.3, False,
                      rngs={"dropout": jax.random.PRNGKey(8)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0
