"""Fused attention Pallas kernel: forward + gradients vs the dense reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import jax.numpy as _jnp


def _seed0():
    return _jnp.zeros((1, 1), _jnp.uint32)


from vidchapters_tpu.ops.fused_attention import (
    BLOCK_Q,
    fused_attention,
    fused_attention_padded,
)

B, H, D = 2, 3, 16
NEG = -1e9


def dense_reference(q, k, v, bias, key_mask):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    scores = scores + bias.astype(jnp.float32)
    scores = jnp.where(key_mask[:, None, None, :] > 0, scores, NEG)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def make_inputs(rng, lq):
    q = jnp.asarray(rng.normal(size=(B, H, lq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, lq, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, lq, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(1, H, lq, lq)), jnp.float32)
    mask = np.ones((B, lq), np.int32)
    mask[0, -lq // 4:] = 0
    return q, k, v, bias, jnp.asarray(mask)


def test_forward_matches_dense(rng):
    q, k, v, bias, mask = make_inputs(rng, BLOCK_Q * 2)
    out = fused_attention(q, k, v, bias, mask, _seed0(), True)
    ref = dense_reference(q, k, v, bias, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_forward_padded_odd_length(rng):
    lq = BLOCK_Q + 37
    q, k, v, bias, mask = make_inputs(rng, lq)
    out = fused_attention_padded(q, k, v, bias, mask, True)
    ref = dense_reference(q, k, v, bias, mask)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_gradients_match_dense(rng):
    q, k, v, bias, mask = make_inputs(rng, BLOCK_Q)

    def loss_fused(q, k, v, bias):
        out = fused_attention(q, k, v, bias, mask, _seed0(), True)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    def loss_dense(q, k, v, bias):
        out = dense_reference(q, k, v, bias, mask)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4, err_msg=f"grad {name}")


def test_gradients_padded(rng):
    lq = BLOCK_Q + 11
    q, k, v, bias, mask = make_inputs(rng, lq)

    def loss_fused(q, k, v, bias):
        out = fused_attention_padded(q, k, v, bias, mask, True)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    def loss_dense(q, k, v, bias):
        out = dense_reference(q, k, v, bias, mask)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4, err_msg=f"grad {name}")


def test_t5_encoder_fused_matches_chunked(rng):
    """Force the fused path inside the T5 stack (interpret mode on CPU) and
    compare against the chunked implementation."""
    import vidchapters_tpu.models.t5 as t5mod
    from vidchapters_tpu.config import T5Config
    from vidchapters_tpu.models.t5 import T5ForConditionalGeneration

    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                   num_decoder_layers=1, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=16, dtype="float32",
                   dropout_rate=0.0, encoder_dropout=0.0, decoder_dropout=0.0)
    model = T5ForConditionalGeneration(cfg)
    ids = jnp.asarray(rng.integers(2, 64, (2, 600)), jnp.int32)
    attn = jnp.ones((2, 600), jnp.int32).at[0, -50:].set(0)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids[:, :8],
                        attn[:, :8], jnp.ones((2, 3), jnp.int32),
                        jnp.ones((2, 3), jnp.int32))["params"]

    old = t5mod.USE_FUSED_ATTENTION
    try:
        t5mod.USE_FUSED_ATTENTION = False
        ref = model.apply({"params": params}, input_ids=ids,
                          attention_mask=attn, method=model.encode)
        t5mod.USE_FUSED_ATTENTION = True
        fused = model.apply({"params": params}, input_ids=ids,
                            attention_mask=attn, method=model.encode)
    finally:
        t5mod.USE_FUSED_ATTENTION = old
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# in-kernel recomputable dropout
# ---------------------------------------------------------------------------


def dense_reference_dropout(q, k, v, bias, key_mask, seed, rate):
    from vidchapters_tpu.ops.fused_attention import _keep_scale

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    scores = scores + bias.astype(jnp.float32)
    scores = jnp.where(key_mask[:, None, None, :] > 0, scores, NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    lq, lk = probs.shape[2], probs.shape[3]
    keep = jnp.stack([
        jnp.stack([_keep_scale(seed[0, 0], b, h, 0, lq, lk, rate)
                   for h in range(H)]) for b in range(B)])
    return jnp.einsum("bhqk,bhkd->bhqd", (probs * keep).astype(q.dtype), v)


def test_dropout_forward_matches_reference_mask(rng):
    rate = 0.1
    q, k, v, bias, mask = make_inputs(rng, BLOCK_Q * 2)
    seed = jnp.full((1, 1), 12345, jnp.uint32)
    out = fused_attention(q, k, v, bias, mask, seed, True, rate)
    ref = dense_reference_dropout(q, k, v, bias, mask, seed, rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    # and it actually drops: fraction of zeroed probs ~ rate
    nodrop = fused_attention(q, k, v, bias, mask, seed, True, 0.0)
    assert not np.allclose(np.asarray(out), np.asarray(nodrop))


def test_dropout_keep_fraction():
    from vidchapters_tpu.ops.fused_attention import _keep_scale

    rate = 0.25
    keep = np.asarray(_keep_scale(jnp.uint32(99), 1, 2, 0, 256, 512, rate))
    frac = (keep > 0).mean()
    assert abs(frac - (1 - rate)) < 0.01
    np.testing.assert_allclose(keep[keep > 0], 1.0 / (1 - rate), rtol=1e-6)
    # deterministic: same args -> same mask
    keep2 = np.asarray(_keep_scale(jnp.uint32(99), 1, 2, 0, 256, 512, rate))
    np.testing.assert_array_equal(keep, keep2)
    # different seed/batch/head -> different mask
    assert (keep != np.asarray(
        _keep_scale(jnp.uint32(100), 1, 2, 0, 256, 512, rate))).any()
    assert (keep != np.asarray(
        _keep_scale(jnp.uint32(99), 0, 2, 0, 256, 512, rate))).any()


def test_dropout_gradients_match_reference_mask(rng):
    rate = 0.15
    q, k, v, bias, mask = make_inputs(rng, BLOCK_Q)
    seed = jnp.full((1, 1), 777, jnp.uint32)

    def loss_fused(q, k, v, bias):
        out = fused_attention(q, k, v, bias, mask, seed, True, rate)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    def loss_dense(q, k, v, bias):
        out = dense_reference_dropout(q, k, v, bias, mask, seed, rate)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4, err_msg=f"grad {name}")


# ---------------------------------------------------------------------------
# bias-free rectangular attention (decoder cross-attention shape)
# ---------------------------------------------------------------------------


def make_cross_inputs(rng, lq, lk):
    q = jnp.asarray(rng.normal(size=(B, H, lq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, lk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, lk, D)), jnp.float32)
    mask = np.ones((B, lk), np.int32)
    mask[0, -lk // 4:] = 0
    return q, k, v, jnp.asarray(mask)


def dense_reference_nobias(q, k, v, key_mask):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    scores = jnp.where(key_mask[:, None, None, :] > 0, scores, NEG)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def test_nobias_rectangular_forward(rng):
    lq, lk = BLOCK_Q + 11, BLOCK_Q * 2 + 57  # both need padding, lq != lk
    q, k, v, mask = make_cross_inputs(rng, lq, lk)
    out = fused_attention_padded(q, k, v, None, mask, True)
    ref = dense_reference_nobias(q, k, v, mask)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_nobias_rectangular_gradients(rng):
    lq, lk = BLOCK_Q, BLOCK_Q * 2
    q, k, v, mask = make_cross_inputs(rng, lq, lk)

    def loss_fused(q, k, v):
        out = fused_attention_padded(q, k, v, None, mask, True)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    def loss_dense(q, k, v):
        out = dense_reference_nobias(q, k, v, mask)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4, err_msg=f"grad {name}")


def test_nobias_dropout_rectangular(rng):
    rate = 0.2
    lq, lk = BLOCK_Q, BLOCK_Q * 2
    q, k, v, mask = make_cross_inputs(rng, lq, lk)
    seed = jnp.full((1, 1), 4242, jnp.uint32)
    out = fused_attention(q, k, v, None, mask, seed, True, rate)
    nodrop = fused_attention(q, k, v, None, mask, seed, True, 0.0)
    assert not np.allclose(np.asarray(out), np.asarray(nodrop))
    # grads still flow through the dropped path
    g = jax.grad(lambda q: (fused_attention(q, k, v, None, mask, seed, True,
                                            rate) ** 2).sum())(q)
    assert np.isfinite(np.asarray(g)).all()


def test_backward_vmem_guard():
    """Long sequences must route away from the merged backward before its
    quadratic VMEM footprint hits the Mosaic compile ceiling (ADVICE r1)."""
    from vidchapters_tpu.ops.fused_attention import backward_fits_vmem

    assert backward_fits_vmem(1024, 1124, 64, True)   # the training shape
    assert not backward_fits_vmem(4096, 4096, 64, True)
    assert not backward_fits_vmem(3072, 3072, 64, True)
