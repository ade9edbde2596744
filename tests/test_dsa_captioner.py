"""LSTM-DSA caption head + sampling-only deformable op."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import PDVCConfig
from vidchapters_tpu.models.pdvc import DSACaptioner
from vidchapters_tpu.ops.deformable_attention import (
    deformable_attention_1d_reference,
    deformable_sampling_1d,
)

SHAPES = (8, 4)
N, M, D, P, LQ = 2, 2, 4, 3, 5


def test_sampling_consistent_with_weighted_sum(rng):
    value = rng.normal(size=(N, sum(SHAPES), M, D)).astype(np.float32)
    loc = rng.uniform(0, 1, size=(N, LQ, M, len(SHAPES), P)).astype(np.float32)
    attn = rng.uniform(size=(N, LQ, M, len(SHAPES), P)).astype(np.float32)
    attn /= attn.sum(axis=(3, 4), keepdims=True)
    samples = np.asarray(deformable_sampling_1d(
        jnp.array(value), SHAPES, jnp.array(loc)))
    assert samples.shape == (N, LQ, M, len(SHAPES), P, D)
    # weighting the samples reproduces the fused op
    manual = (samples * attn[..., None]).sum(axis=(3, 4)).reshape(N, LQ, M * D)
    fused = np.asarray(deformable_attention_1d_reference(
        jnp.array(value), SHAPES, jnp.array(loc), jnp.array(attn)))
    np.testing.assert_allclose(manual, fused, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def dsa():
    cfg = PDVCConfig(hidden_dim=16, vocab_size=20, max_caption_len=6,
                     rnn_size=24, cap_nheads=2, cap_num_feature_levels=2,
                     cap_dec_n_points=2, num_feature_levels=2)
    model = DSACaptioner(cfg)
    rng = np.random.default_rng(0)
    n, s = 4, 12  # 8 + 4 temporal positions
    feats = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)
    seq = jnp.asarray(rng.integers(1, 20, (n, 6)), jnp.int32)
    refs = jnp.asarray(rng.uniform(0.2, 0.8, (n, 2)), jnp.float32)
    memory = jnp.asarray(rng.normal(size=(n, s, 16)), jnp.float32)
    mmask = jnp.ones((n, s), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, seq, refs, memory,
                        mmask, (8, 4))["params"]
    return cfg, model, params, (feats, seq, refs, memory, mmask)


def test_dsa_teacher_forcing(dsa):
    cfg, model, params, (feats, seq, refs, memory, mmask) = dsa
    logps = model.apply({"params": params}, feats, seq, refs, memory, mmask,
                        (8, 4))
    assert logps.shape == (4, 5, cfg.vocab_size + 1)
    np.testing.assert_allclose(np.exp(np.asarray(logps)).sum(-1),
                               np.ones((4, 5)), rtol=1e-4)


def test_dsa_greedy_sample_and_grads(dsa):
    cfg, model, params, (feats, seq, refs, memory, mmask) = dsa
    toks, lps = model.apply({"params": params}, feats, refs, memory, mmask,
                            (8, 4), 6, method=model.greedy_sample)
    assert toks.shape == (4, 6)

    def loss(params):
        logps = model.apply({"params": params}, feats, seq, refs, memory,
                            mmask, (8, 4))
        return -logps.mean()

    grads = jax.grad(loss)(params)
    for key in ("w_offset", "w_ctx2att", "w_alpha", "w_x"):
        assert np.isfinite(float(jnp.abs(grads[key]).max()))
    # attention pathway receives gradient
    assert float(jnp.abs(grads["w_ctx2att"]).max()) > 0
