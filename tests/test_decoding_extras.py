"""Nucleus sampling + grounding speech branch coverage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import GroundingConfig, T5Config
from vidchapters_tpu.models.t5 import T5ForConditionalGeneration
from vidchapters_tpu.ops.decoding import (
    greedy_decode,
    make_decode_fns,
    nucleus_sample,
)


@pytest.fixture(scope="module")
def t5_setup():
    cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                   num_decoder_layers=1, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=16, dtype="float32",
                   dropout_rate=0.0, encoder_dropout=0.0, decoder_dropout=0.0)
    model = T5ForConditionalGeneration(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 64, (2, 6)), jnp.int32)
    attn = jnp.ones((2, 6), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, attn,
                        jnp.ones((2, 3), jnp.int32),
                        jnp.ones((2, 3), jnp.int32))["params"]
    enc = model.apply({"params": params}, input_ids=ids, attention_mask=attn,
                      method=model.encode)
    return model, params, enc, attn


def test_nucleus_sample_runs_and_differs_by_seed(t5_setup):
    model, params, enc, attn = t5_setup
    fns = make_decode_fns(model, params, 8)
    a = nucleus_sample(fns, enc, attn, 8, jax.random.PRNGKey(0), top_p=0.9)
    b = nucleus_sample(fns, enc, attn, 8, jax.random.PRNGKey(0), top_p=0.9)
    c = nucleus_sample(fns, enc, attn, 8, jax.random.PRNGKey(99), top_p=0.9)
    assert a.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different seed should change at least one token (overwhelmingly likely)
    assert (np.asarray(a) != np.asarray(c)).any()


def test_nucleus_topp_one_token_equals_greedy(t5_setup):
    model, params, enc, attn = t5_setup
    fns = make_decode_fns(model, params, 8)
    # top_p -> 0 keeps only the argmax token: sampling == greedy
    s = nucleus_sample(fns, enc, attn, 8, jax.random.PRNGKey(0), top_p=1e-6)
    g = greedy_decode(fns, enc, attn, 8)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(g))


def test_grounding_speech_branch():
    from vidchapters_tpu.models.grounding import MomentDETR

    cfg = GroundingConfig(hidden_dim=32, nheads=4, enc_layers=1, dec_layers=1,
                          dim_feedforward=64, num_queries=4, v_feat_dim=10,
                          t_feat_dim=6, s_feat_dim=12, use_speech=True,
                          dropout=0.0, input_dropout=0.0, aux_loss=False)
    model = MomentDETR(cfg)
    rng = np.random.default_rng(0)
    src_txt = jnp.asarray(rng.normal(size=(2, 5, 6)), jnp.float32)
    txt_mask = jnp.ones((2, 5), jnp.int32)
    src_vid = jnp.asarray(rng.normal(size=(2, 12, 10)), jnp.float32)
    vid_mask = jnp.ones((2, 12), jnp.int32)
    src_speech = jnp.asarray(rng.normal(size=(2, 7, 12)), jnp.float32)
    sp_mask = jnp.ones((2, 7), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src_txt, txt_mask, src_vid,
                        vid_mask, src_speech, sp_mask)["params"]
    out = model.apply({"params": params}, src_txt, txt_mask, src_vid,
                      vid_mask, src_speech, sp_mask)
    assert out["pred_logits"].shape == (2, 4, 2)
    assert "speech_proj" in params
    # speech features influence predictions
    out2 = model.apply({"params": params}, src_txt, txt_mask, src_vid,
                       vid_mask, src_speech * 0.0, sp_mask)
    assert np.abs(np.asarray(out["pred_spans"])
                  - np.asarray(out2["pred_spans"])).max() > 1e-6


def test_topk_pallas_matches_lax_top_k_with_ties():
    """The single-pass Pallas top-k (beam body hot path on TPU) must match
    lax.top_k exactly, including the smallest-index tie-break."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vidchapters_tpu.ops.decoding import _topk_iterative, _topk_pallas

    rng = np.random.default_rng(3)
    x = rng.normal(size=(16, 1000)).astype(np.float32)
    # inject exact ties
    x[0, 5] = x[0, 905] = x[0].max() + 1.0
    x[3, 10] = x[3, 11] = x[3, 12] = x[3].max() + 2.0
    xj = jnp.asarray(x)
    for k in (1, 4, 8):
        ref_v, ref_i = jax.lax.top_k(xj, k)
        it_v, it_i = _topk_iterative(xj, k)
        pl_v, pl_i = _topk_pallas(xj, k, interpret=True)
        np.testing.assert_array_equal(np.asarray(it_i), np.asarray(ref_i))
        np.testing.assert_array_equal(np.asarray(pl_i), np.asarray(ref_i))
        np.testing.assert_allclose(np.asarray(pl_v), np.asarray(ref_v))
        np.testing.assert_allclose(np.asarray(it_v), np.asarray(ref_v))
