"""Megakernel decode parity vs the reference T5 incremental decode path.

fp32 configs make every in-kernel rounding a no-op, so greedy/beam tokens
must match the standard path exactly and per-step logits to ~1e-4."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import T5Config
from vidchapters_tpu.models.t5 import T5ForConditionalGeneration
from vidchapters_tpu.ops.decoding import (
    beam_search,
    greedy_decode,
    make_decode_fns,
)
from vidchapters_tpu.ops.decode_megakernel import make_mega_decode_fns

VOCAB = 150
MAX_LEN = 16
LENC = 20  # pads to 32 inside the mega path


@pytest.fixture(scope="module")
def setup():
    cfg = T5Config(vocab_size=VOCAB, d_model=256, d_kv=64, d_ff=512,
                   num_layers=2, num_decoder_layers=3, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=16,
                   dropout_rate=0.0, encoder_dropout=0.0,
                   decoder_dropout=0.0, dtype="float32")
    model = T5ForConditionalGeneration(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32))["params"]
    np_rng = np.random.default_rng(0)
    b0 = 8
    enc_out = jnp.asarray(
        np_rng.normal(size=(b0, LENC, cfg.d_model)).astype(np.float32))
    enc_mask = np.ones((b0, LENC), np.int32)
    enc_mask[0, 15:] = 0
    enc_mask[3, 10:] = 0
    return cfg, model, params, enc_out, jnp.asarray(enc_mask)


def test_mega_step_logits_match_reference(setup):
    cfg, model, params, enc_out, enc_mask = setup
    ref = make_decode_fns(model, params, MAX_LEN)
    mega = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=1,
                                interpret=True)
    b = enc_out.shape[0]
    ref_cache = ref.init_cache(b, enc_out)
    mega_cache = mega.init_cache(b, enc_out)
    rng = np.random.default_rng(1)
    tokens = jnp.zeros((b,), jnp.int32)
    for i in range(5):
        ref_logits, ref_cache = ref.step(tokens, ref_cache,
                                         jnp.asarray(i), enc_mask)
        mega_logits, mega_cache = mega.step(tokens, mega_cache,
                                            jnp.asarray(i), enc_mask)
        np.testing.assert_allclose(np.asarray(mega_logits),
                                   np.asarray(ref_logits),
                                   rtol=2e-4, atol=2e-4)
        tokens = jnp.asarray(rng.integers(2, VOCAB, (b,)), jnp.int32)


def test_mega_greedy_tokens_match_reference(setup):
    cfg, model, params, enc_out, enc_mask = setup
    ref = make_decode_fns(model, params, MAX_LEN)
    mega = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=1,
                                interpret=True)
    ref_seqs = np.asarray(greedy_decode(ref, enc_out, enc_mask, MAX_LEN))
    mega_seqs = np.asarray(greedy_decode(mega, enc_out, enc_mask, MAX_LEN))
    np.testing.assert_array_equal(mega_seqs, ref_seqs)


def test_mega_beam_tokens_match_reference(setup):
    cfg, model, params, enc_out, enc_mask = setup
    b0 = 2  # x4 beams -> 8 rows
    enc_out2, enc_mask2 = enc_out[:b0], enc_mask[:b0]
    ref = make_decode_fns(model, params, MAX_LEN)
    mega = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=4,
                                interpret=True)
    ref_seqs = np.asarray(beam_search(ref, enc_out2, enc_mask2, MAX_LEN,
                                      num_beams=4))
    mega_seqs = np.asarray(beam_search(mega, enc_out2, enc_mask2, MAX_LEN,
                                       num_beams=4))
    np.testing.assert_array_equal(mega_seqs, ref_seqs)


def test_generate_fn_picks_mega_and_matches(setup):
    """make_generate_fn with USE_MEGA_DECODE on must produce the same
    chapters as the standard path (fp32 Vid2Seq, greedy)."""
    from vidchapters_tpu.config import (
        GenerationConfig,
        T5Config,
        TemporalViTConfig,
        Vid2SeqConfig,
    )
    from vidchapters_tpu.models import t5 as t5_mod
    from vidchapters_tpu.models.vid2seq import Vid2Seq
    from vidchapters_tpu.train.dvc_train import make_generate_fn

    cfg = Vid2SeqConfig(
        t5=T5Config(vocab_size=VOCAB, d_model=256, d_kv=64, d_ff=512,
                    num_layers=2, num_decoder_layers=2, num_heads=4,
                    dropout_rate=0.0, encoder_dropout=0.0,
                    decoder_dropout=0.0, dtype="float32"),
        vit=TemporalViTConfig(num_features=8, embed_dim=256, depth=1,
                              num_heads=4, mlp_dim=64, dtype="float32"))
    model = Vid2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    video = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 8, 256)).astype(np.float32))
    toks = jnp.ones((8, 6), jnp.int32)
    params = model.init({"params": rng, "dropout": rng}, video, toks,
                        jnp.ones_like(toks), toks)["params"]
    gen = GenerationConfig(num_beams=1, max_length=MAX_LEN)
    ref_out = np.asarray(make_generate_fn(model, gen)(
        params, video, toks, rng))
    t5_mod.USE_MEGA_DECODE = True
    try:
        mega_out = np.asarray(make_generate_fn(model, gen)(
            params, video, toks, rng))
    finally:
        t5_mod.USE_MEGA_DECODE = False
    np.testing.assert_array_equal(mega_out, ref_out)


def test_mega_handles_nondefault_shapes(setup):
    """group=2 beams (bb=8, 4 examples/block) also matches."""
    cfg, model, params, enc_out, enc_mask = setup
    b0 = 4
    ref = make_decode_fns(model, params, MAX_LEN)
    mega = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=2,
                                interpret=True)
    ref_seqs = np.asarray(beam_search(ref, enc_out[:b0], enc_mask[:b0],
                                      MAX_LEN, num_beams=2))
    mega_seqs = np.asarray(beam_search(mega, enc_out[:b0], enc_mask[:b0],
                                       MAX_LEN, num_beams=2))
    np.testing.assert_array_equal(mega_seqs, ref_seqs)


def test_mega_chunked_cache_parity(setup, monkeypatch):
    """Prefix-skip chunking (CACHE_CHUNK < max_len): greedy and beam tokens
    must match the standard path exactly with the cache streamed in 2
    chunks whose dead cells clamp their index maps."""
    from vidchapters_tpu.ops import decode_megakernel as dm

    cfg, model, params, enc_out, enc_mask = setup
    monkeypatch.setattr(dm, "CACHE_CHUNK", 8)  # MAX_LEN=16 -> 2 chunks
    ref = make_decode_fns(model, params, MAX_LEN)
    mega = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=1,
                                interpret=True)
    ref_seqs = np.asarray(greedy_decode(ref, enc_out, enc_mask, MAX_LEN))
    mega_seqs = np.asarray(greedy_decode(mega, enc_out, enc_mask, MAX_LEN))
    np.testing.assert_array_equal(ref_seqs, mega_seqs)

    b0 = 2
    mega_b = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=4,
                                  interpret=True)
    ref_seqs = np.asarray(beam_search(ref, enc_out[:b0], enc_mask[:b0],
                                      MAX_LEN, num_beams=4))
    mega_seqs = np.asarray(beam_search(mega_b, enc_out[:b0], enc_mask[:b0],
                                       MAX_LEN, num_beams=4))
    np.testing.assert_array_equal(ref_seqs, mega_seqs)


def test_mega_int8_cross_kv_wiring_exact(setup, monkeypatch):
    """The int8 path's scale-folds (k-scale into q, v-scale into context)
    are EXACTLY the dequantized computation: feeding the exact path the
    dequantized cross KV must reproduce the quantized path's logits to
    f32 rounding.  This pins the wiring; quantization NOISE itself is
    bounded separately below."""
    from vidchapters_tpu.ops import decode_megakernel as dm

    cfg, model, params, enc_out, enc_mask = setup
    exact = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=1,
                                 interpret=True)
    monkeypatch.setattr(dm, "QUANTIZE_CROSS_KV", True)
    quant = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=1,
                                 interpret=True)
    b = enc_out.shape[0]
    cache_q = quant.init_cache(b, enc_out)
    assert cache_q["cross"]["k"].dtype == jnp.int8
    cache_e = exact.init_cache(b, enc_out)
    cache_e["cross"]["k"] = (cache_q["cross"]["k"].astype(jnp.float32)
                             * cache_q["cross"]["k_scale"])
    cache_e["cross"]["v"] = (cache_q["cross"]["v"].astype(jnp.float32)
                             * cache_q["cross"]["v_scale"])
    tokens = jnp.zeros((b,), jnp.int32)
    for i in range(2):
        log_e, cache_e = exact.step(tokens, cache_e, i, enc_mask)
        log_q, cache_q = quant.step(tokens, cache_q, i, enc_mask)
        np.testing.assert_allclose(np.asarray(log_q), np.asarray(log_e),
                                   rtol=1e-5, atol=1e-5)
        tokens = jnp.argmax(log_e, -1).astype(jnp.int32)


def test_mega_int8_cross_kv_noise_bounded(setup, monkeypatch):
    """Quantization noise bound.  NOTE: this random-weight config is a
    pathological worst case — T5's normal(1.0) init with the unscaled
    256-dim QK dot produces huge scores, so absolute int8 error on scores
    is large and near-uniform attention amplifies it.  Trained T5 scores
    are orders of magnitude smaller; this asserts a coarse ceiling only."""
    from vidchapters_tpu.ops import decode_megakernel as dm

    cfg, model, params, enc_out, enc_mask = setup
    exact = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=1,
                                 interpret=True)
    monkeypatch.setattr(dm, "QUANTIZE_CROSS_KV", True)
    quant = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=1,
                                 interpret=True)
    b = enc_out.shape[0]
    cache_e = exact.init_cache(b, enc_out)
    cache_q = quant.init_cache(b, enc_out)
    tokens = jnp.zeros((b,), jnp.int32)
    for i in range(3):
        log_e, cache_e = exact.step(tokens, cache_e, i, enc_mask)
        log_q, cache_q = quant.step(tokens, cache_q, i, enc_mask)
        e = np.asarray(log_e, np.float32)
        q = np.asarray(log_q, np.float32)
        rel = np.linalg.norm(q - e) / max(np.linalg.norm(e), 1e-9)
        assert rel < 0.10, (i, rel)
        tokens = jnp.argmax(log_e, -1).astype(jnp.int32)


def test_mega_four_chunk_beam_ancestry_parity(setup, monkeypatch):
    """4 cache chunks x beam-4: frozen-chunk composed ancestry maps must
    reproduce the standard path exactly through many beam permutations and
    three chunk-freeze transitions (round-3 write-back scheme: only the
    active chunk is physically rewritten)."""
    from vidchapters_tpu.ops import decode_megakernel as dm

    cfg, model, params, enc_out, enc_mask = setup
    monkeypatch.setattr(dm, "CACHE_CHUNK", 4)  # MAX_LEN=16 -> 4 chunks
    ref = make_decode_fns(model, params, MAX_LEN)
    mega = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=4,
                                interpret=True)
    b0 = 2
    ref_seqs = np.asarray(beam_search(ref, enc_out[:b0], enc_mask[:b0],
                                      MAX_LEN, num_beams=4))
    mega_seqs = np.asarray(beam_search(mega, enc_out[:b0], enc_mask[:b0],
                                       MAX_LEN, num_beams=4))
    np.testing.assert_array_equal(ref_seqs, mega_seqs)


def test_gated_act_mega_parity_and_misaligned_fallback():
    """t5-v1_1 (gated-gelu): the megakernel streams wi as [d, 2*dff] and
    applies gelu_new(g)*l in-kernel — tokens must match the standard path
    exactly (fp32). A dff that is not 128-lane-aligned keeps the standard
    path (the in-kernel split point must sit on a lane boundary)."""
    import numpy as _np

    from vidchapters_tpu.config import (
        GenerationConfig,
        TemporalViTConfig,
        Vid2SeqConfig,
    )
    from vidchapters_tpu.models import t5 as t5_mod
    from vidchapters_tpu.models.vid2seq import Vid2Seq
    from vidchapters_tpu.train.dvc_train import make_generate_fn

    def run(d_ff):
        cfg = Vid2SeqConfig(
            t5=T5Config(vocab_size=VOCAB, d_model=64, d_kv=16, d_ff=d_ff,
                        num_layers=1, num_decoder_layers=2, num_heads=4,
                        feed_forward_proj="gated-gelu", dropout_rate=0.0,
                        encoder_dropout=0.0, decoder_dropout=0.0,
                        dtype="float32"),
            vit=TemporalViTConfig(num_features=4, embed_dim=64, depth=1,
                                  num_heads=4, mlp_dim=32, dtype="float32"))
        model = Vid2Seq(cfg)
        rng = jax.random.PRNGKey(0)
        video = jnp.asarray(_np.random.default_rng(0).normal(
            size=(8, 4, 64)).astype(_np.float32))
        toks = jnp.ones((8, 5), jnp.int32)
        params = model.init({"params": rng, "dropout": rng}, video, toks,
                            jnp.ones_like(toks), toks)["params"]
        gen = GenerationConfig(num_beams=4, max_length=8)
        ref = _np.asarray(make_generate_fn(model, gen)(
            params, video, toks, rng))
        t5_mod.USE_MEGA_DECODE = True
        try:
            out = _np.asarray(make_generate_fn(model, gen)(
                params, video, toks, rng))
        finally:
            t5_mod.USE_MEGA_DECODE = False
        return ref, out

    ref, out = run(128)  # aligned: mega engages, token-identical
    np.testing.assert_array_equal(out, ref)
    ref, out = run(96)   # misaligned dff: falls back, still identical
    np.testing.assert_array_equal(out, ref)


def test_mega_skipped_reorder_is_noop(setup):
    """Regression for the round-4 advisor finding: after a step consumes
    pending_src (the deferred beam permutation is applied inside the
    kernel), the returned cache must carry the identity so a caller that
    skips reorder_cache gets a no-op instead of a stale re-permutation."""
    from vidchapters_tpu.ops.decoding import reorder_beam_cache

    cfg, model, params, enc_out, enc_mask = setup
    b0, K = 2, 4
    rows = b0 * K
    enc2, mask2 = enc_out[:b0], enc_mask[:b0]
    ref = make_decode_fns(model, params, MAX_LEN)
    mega = make_mega_decode_fns(cfg, params, MAX_LEN, num_beams=K,
                                interpret=True)
    cache_r = ref.init_cache(rows, enc2)
    cache_m = mega.init_cache(rows, enc2)

    rng = np.random.default_rng(7)
    toks = jnp.asarray(rng.integers(2, VOCAB, (rows,)), jnp.int32)
    lr, cache_r = ref.step(toks, cache_r, jnp.asarray(0), mask2)
    lm, cache_m = mega.step(toks, cache_m, jnp.asarray(0), mask2)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lr),
                               rtol=2e-4, atol=2e-4)

    # a non-identity within-example beam permutation
    parent = jnp.asarray(
        [(i // K) * K + (K - 1 - i % K) for i in range(rows)], jnp.int32)
    cache_r = reorder_beam_cache(cache_r, parent)
    cache_m = mega.reorder_cache(cache_m, parent)

    toks2 = jnp.asarray(rng.integers(2, VOCAB, (rows,)), jnp.int32)
    lr, cache_r = ref.step(toks2, cache_r, jnp.asarray(1), mask2)
    lm, cache_m = mega.step(toks2, cache_m, jnp.asarray(1), mask2)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(cache_m["pending_src"]),
                                  np.arange(rows))

    # skipped reorder: old bug re-applied the stale permutation here
    toks3 = jnp.asarray(rng.integers(2, VOCAB, (rows,)), jnp.int32)
    lr, cache_r = ref.step(toks3, cache_r, jnp.asarray(2), mask2)
    lm, cache_m = mega.step(toks3, cache_m, jnp.asarray(2), mask2)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lr),
                               rtol=2e-4, atol=2e-4)
