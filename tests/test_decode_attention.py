"""Fused decode-step self-attention kernel: parity with the plain
dynamic_update_slice + dense attention path, and end-to-end greedy/beam
equivalence when forced on (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vidchapters_tpu.models.t5 as t5mod
from vidchapters_tpu.ops.decode_attention import decode_self_attention

NEG = -1e9


@pytest.fixture(autouse=True)
def _reset_flag():
    yield
    t5mod.USE_FUSED_DECODE = None


def test_kernel_matches_reference_step(rng):
    b, h, l, d = 2, 3, 16, 8
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    k_cache = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    idx = 5
    bias = jnp.asarray(rng.normal(size=(1, h, 1, l)), jnp.float32)
    bias = jnp.where(jnp.arange(l)[None, None, None, :] <= idx, bias, NEG)

    out, k2, v2 = decode_self_attention(q, k_new, v_new, k_cache, v_cache,
                                        bias, jnp.int32(idx), interpret=True)

    k_ref = jax.lax.dynamic_update_slice(k_cache, k_new, (0, 0, idx, 0))
    v_ref = jax.lax.dynamic_update_slice(v_cache, v_new, (0, 0, idx, 0))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_ref) + bias
    probs = jax.nn.softmax(scores, axis=-1)
    out_ref = jnp.einsum("bhqk,bhkd->bhqd", probs, v_ref)

    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v_ref))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_under_while_loop(rng):
    """The decode loop shape: repeated steps with advancing index."""
    b, h, l, d = 1, 2, 8, 8
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.float32)
    kc = jnp.zeros((b, h, l, d), jnp.float32)
    vc = jnp.zeros((b, h, l, d), jnp.float32)
    bias0 = jnp.zeros((1, h, 1, l), jnp.float32)

    def body(i, carry):
        kc, vc = carry
        bias = jnp.where(jnp.arange(l)[None, None, None, :] <= i, bias0, NEG)
        _, kc, vc = decode_self_attention(q, q, q, kc, vc, bias, i,
                                          interpret=True)
        return kc, vc

    kc, vc = jax.lax.fori_loop(0, 4, body, (kc, vc))
    np.testing.assert_allclose(np.asarray(kc[:, :, :4]),
                               np.broadcast_to(np.asarray(q), (b, h, 1, d)
                                               ).repeat(4, axis=2), rtol=1e-6)
    assert (np.asarray(kc[:, :, 4:]) == 0).all()


def test_greedy_and_beam_match_plain_path(rng):
    """Force the fused decode path (interpret) and compare generated tokens
    against the plain path on a tiny T5."""
    from vidchapters_tpu.config import T5Config
    from vidchapters_tpu.models.t5 import T5ForConditionalGeneration
    from vidchapters_tpu.ops.decoding import (
        beam_search,
        greedy_decode,
        make_decode_fns,
    )

    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                   num_decoder_layers=2, num_heads=4, dropout_rate=0.0,
                   encoder_dropout=0.0, decoder_dropout=0.0, dtype="float32")
    model = T5ForConditionalGeneration(cfg)
    key = jax.random.PRNGKey(0)
    src = jnp.asarray(rng.integers(2, 60, (2, 12)), jnp.int32)
    tgt = jnp.asarray(rng.integers(2, 60, (2, 6)), jnp.int32)
    params = model.init({"params": key, "dropout": key}, src,
                        jnp.ones_like(src), tgt, jnp.ones_like(tgt))["params"]

    def run(max_len=10, beams=0):
        enc = model.apply({"params": params}, input_ids=src,
                          attention_mask=jnp.ones_like(src),
                          method=model.encode)
        fns = make_decode_fns(model, params, max_len)
        if beams:
            return beam_search(fns, enc, jnp.ones_like(src), max_len,
                               num_beams=beams)
        return greedy_decode(fns, enc, jnp.ones_like(src), max_len)

    t5mod.USE_FUSED_DECODE = False
    plain_greedy = np.asarray(run())
    plain_beam = np.asarray(run(beams=3))
    t5mod.USE_FUSED_DECODE = True
    fused_greedy = np.asarray(run())
    fused_beam = np.asarray(run(beams=3))
    np.testing.assert_array_equal(plain_greedy, fused_greedy)
    np.testing.assert_array_equal(plain_beam, fused_beam)
