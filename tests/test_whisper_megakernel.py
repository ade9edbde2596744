"""Whisper cross-layer decode megakernel parity (round 3).

The kernel mirrors models/whisper.py's incremental decode semantics
(LayerNorm with biases, q*d_head^-0.5 scaling, bias-free k, current-token
row included, full-encoding cross attention, exact-form GELU). The only
intentional numeric difference is the in-kernel polynomial erf
(|err| <= 1.5e-7); tokens must still match the standard path on random
weights and per-step logits must agree to f32 working precision.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.models.whisper import Whisper, WhisperConfig
from vidchapters_tpu.ops.decoding import (
    greedy_decode,
    make_decode_fns,
    reorder_beam_cache,
)
from vidchapters_tpu.ops.whisper_megakernel import (
    gelu_erf,
    make_whisper_mega_fns,
)

MAX_LEN = 12


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig(vocab_size=256, num_mel_bins=8, d_model=64,
                        encoder_layers=1, decoder_layers=2, num_heads=4,
                        d_ff=128, max_source_positions=30,
                        max_target_positions=MAX_LEN, dtype="float32")
    model = Whisper(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(4, 8, 60)), jnp.float32)
    toks = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), mel[:1], toks)["params"]
    enc = model.apply({"params": params}, mel, method=model.encode)
    return cfg, model, params, enc


def test_gelu_erf_matches_xla_exact_gelu():
    x = jnp.asarray(np.linspace(-6, 6, 4096), jnp.float32)
    ref = jax.nn.gelu(x, approximate=False)
    got = gelu_erf(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_mega_step_logits_match_standard(setup):
    cfg, model, params, enc = setup
    ref = make_decode_fns(model, params, MAX_LEN)
    mega = make_whisper_mega_fns(cfg, params, MAX_LEN, interpret=True,
                                 quantize=False)
    b = enc.shape[0]
    cache_r = ref.init_cache(b, enc)
    cache_m = mega.init_cache(b, enc)
    toks = jnp.asarray([50, 7, 190, 3], jnp.int32)
    for i in range(4):
        lr, cache_r = ref.step(toks, cache_r, jnp.asarray(i), None)
        lm, cache_m = mega.step(toks, cache_m, jnp.asarray(i), None)
        np.testing.assert_allclose(np.asarray(lm), np.asarray(lr),
                                   atol=2e-4, rtol=2e-4)
        toks = jnp.argmax(lr, axis=-1).astype(jnp.int32)


def test_mega_greedy_tokens_match_standard(setup):
    cfg, model, params, enc = setup
    ref = make_decode_fns(model, params, MAX_LEN)
    mega = make_whisper_mega_fns(cfg, params, MAX_LEN, interpret=True,
                                 quantize=False)
    enc_mask = jnp.ones((enc.shape[0], enc.shape[1]), jnp.int32)
    ref_seqs = np.asarray(greedy_decode(ref, enc, enc_mask, MAX_LEN))
    mega_seqs = np.asarray(greedy_decode(mega, enc, enc_mask, MAX_LEN))
    np.testing.assert_array_equal(mega_seqs, ref_seqs)


def test_mega_int8_cross_close_to_exact(setup):
    """int8 per-lane cross KV (the large-v2 VMEM requirement) stays close
    to the unquantized path and keeps greedy tokens stable on this
    fixture."""
    cfg, model, params, enc = setup
    exact = make_whisper_mega_fns(cfg, params, MAX_LEN, interpret=True,
                                  quantize=False)
    quant = make_whisper_mega_fns(cfg, params, MAX_LEN, interpret=True,
                                  quantize=True)
    b = enc.shape[0]
    ce = exact.init_cache(b, enc)
    cq = quant.init_cache(b, enc)
    assert cq["cross"]["k"].dtype == jnp.int8
    toks = jnp.asarray([5, 9, 100, 200], jnp.int32)
    le, _ = exact.step(toks, ce, jnp.asarray(0), None)
    lq, _ = quant.step(toks, cq, jnp.asarray(0), None)
    # int8 noise is bounded by the per-lane scale; logits stay close
    assert float(jnp.max(jnp.abs(le - lq))) < 0.15
    np.testing.assert_array_equal(np.asarray(jnp.argmax(le, -1)),
                                  np.asarray(jnp.argmax(lq, -1)))


def test_mega_transcriber_integration():
    """The transcriber picks the megakernel path when enabled and produces
    the same window decode as the standard path (full-range vocab so the
    whisper special-token ids are addressable)."""
    from vidchapters_tpu.factory import whisper_transcribe as wt

    cfg = WhisperConfig(vocab_size=wt.TIMESTAMP_BEGIN + 1501,
                        num_mel_bins=8, d_model=64, encoder_layers=1,
                        decoder_layers=2, num_heads=4, d_ff=128,
                        max_source_positions=30,
                        max_target_positions=MAX_LEN, dtype="float32")
    model = Whisper(cfg)
    mel0 = jnp.zeros((1, 8, 60), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel0,
                        jnp.zeros((1, 4), jnp.int32))["params"]
    old = wt.USE_MEGA_DECODE
    try:
        wt.USE_MEGA_DECODE = False
        tr_std = wt.JaxWhisperTranscriber(
            model, params, max_decode_len=MAX_LEN, temperatures=(0.0,),
            compression_ratio_threshold=None, logprob_threshold=None,
            no_speech_threshold=None)
        wt.USE_MEGA_DECODE = True
        wt.MEGA_INTERPRET = True
        tr_mega = wt.JaxWhisperTranscriber(
            model, params, max_decode_len=MAX_LEN, temperatures=(0.0,),
            compression_ratio_threshold=None, logprob_threshold=None,
            no_speech_threshold=None)
    finally:
        wt.USE_MEGA_DECODE = old
        wt.MEGA_INTERPRET = False
    mel = np.zeros((8, 3000), np.float32)[:, :60]
    # _decode_window takes a full 30 s mel normally; the tiny config's
    # encoder accepts 60 frames
    t_std = tr_std._decode_window(mel, 0)
    t_mega = tr_mega._decode_window(mel, 0)
    assert t_std[0] == t_mega[0]  # identical tokens
    assert t_std[3] == t_mega[3] == 0.0


def test_mega_beam_ancestry_matches_standard(setup):
    """A beam loop with the production permutation rules — shared
    per-example cross KV on the standard path, repeated-rows 'cross'
    subtree SKIPPED by the ancestry gather on the mega path (it is
    beam-invariant within an example) — picks identical tokens."""
    cfg, model, params, enc = setup
    K, b = 3, enc.shape[0]
    rows = b * K
    vocab = cfg.vocab_size

    def beam_loop(fns, cache):
        tokens = jnp.full((rows,), 5, jnp.int32)
        sum_lp = jnp.concatenate(
            [jnp.zeros((b, 1)), jnp.full((b, K - 1), -1e9)], axis=1)
        picked = []
        for i in range(6):
            logits, cache = fns.step(tokens, cache, jnp.asarray(i), None)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            flat = (sum_lp[..., None] + logp.reshape(b, K, vocab)
                    ).reshape(b, K * vocab)
            sum_lp, idx = jax.lax.top_k(flat, K)
            parent = (jnp.arange(b)[:, None] * K
                      + idx // vocab).reshape(-1)
            tokens = (idx % vocab).reshape(-1).astype(jnp.int32)

            def perm(x):
                return (jnp.take(x, parent, axis=0)
                        if x.ndim and x.shape[0] == rows else x)

            if fns.reorder_cache is not None:
                # mega beam path: the permutation is DEFERRED into the
                # next step's kernel — a manual tree gather here would
                # double-permute
                cache = fns.reorder_cache(cache, parent)
            elif isinstance(cache, dict) and "cross" in cache:
                cache = {k: (v if k == "cross"
                             else jax.tree_util.tree_map(perm, v))
                         for k, v in cache.items()}
            else:
                cache = jax.tree_util.tree_map(perm, cache)
            picked.append(np.asarray(tokens))
        return np.stack(picked)

    ref = make_decode_fns(model, params, MAX_LEN)
    std_tokens = beam_loop(ref, ref.init_cache(rows, enc))  # shared cross

    # production mega-beam layout (round 4): UNREPEATED enc -> the kernel
    # groups K consecutive rows over one per-example cross block
    mega = make_whisper_mega_fns(cfg, params, MAX_LEN, interpret=True,
                                 quantize=False)
    mega_tokens = beam_loop(mega, mega.init_cache(rows, enc))
    np.testing.assert_array_equal(mega_tokens, std_tokens)

    # legacy per-row layout (repeated enc, group=1) must stay exact too
    mega2 = make_whisper_mega_fns(cfg, params, MAX_LEN, interpret=True,
                                  quantize=False)
    enc_rep = jnp.repeat(enc, K, axis=0)
    mega_rep_tokens = beam_loop(mega2, mega2.init_cache(rows, enc_rep))
    np.testing.assert_array_equal(mega_rep_tokens, std_tokens)


def test_multi_chunk_greedy_and_beam_cross_boundary():
    """Round 4: CACHE_CHUNK(56)-row prefix-skip streaming. A 112-row cache
    runs TWO chunks, so decoding past step 56 exercises the online-softmax
    accumulation across a chunk boundary, the dead-chunk clamp before it,
    and (beam) the deferred permutation write-back per live chunk. Tokens
    must match the standard path on both sides of the boundary."""
    max_len = 112
    K, b = 2, 2
    rows = b * K
    cfg = WhisperConfig(vocab_size=64, num_mel_bins=8, d_model=32,
                        encoder_layers=1, decoder_layers=2, num_heads=2,
                        d_ff=64, max_source_positions=30,
                        max_target_positions=max_len, dtype="float32")
    model = Whisper(cfg)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.normal(size=(b, 8, 60)), jnp.float32)
    toks = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(3), mel[:1], toks)["params"]
    enc = model.apply({"params": params}, mel, method=model.encode)
    enc_mask = jnp.ones(enc.shape[:2], jnp.int32)
    vocab = cfg.vocab_size

    from vidchapters_tpu.ops import whisper_megakernel as wm

    assert max_len % wm.CACHE_CHUNK == 0 and max_len // wm.CACHE_CHUNK == 2

    # greedy: full 112-step identity (boundary at step 56)
    ref = make_decode_fns(model, params, max_len)
    mega = make_whisper_mega_fns(cfg, params, max_len, interpret=True,
                                 quantize=False)
    ref_seqs = np.asarray(greedy_decode(ref, enc, enc_mask, max_len))
    mega_seqs = np.asarray(greedy_decode(mega, enc, enc_mask, max_len))
    np.testing.assert_array_equal(mega_seqs, ref_seqs)

    # beam: ancestry identity across the boundary (steps 50..62)
    def beam_loop(fns, cache):
        tokens = jnp.full((rows,), 5, jnp.int32)
        sum_lp = jnp.concatenate(
            [jnp.zeros((b, 1)), jnp.full((b, K - 1), -1e9)], axis=1)
        picked = []
        for i in range(62):
            logits, cache = fns.step(tokens, cache, jnp.asarray(i), None)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            flat = (sum_lp[..., None] + logp.reshape(b, K, vocab)
                    ).reshape(b, K * vocab)
            sum_lp, idx = jax.lax.top_k(flat, K)
            parent = (jnp.arange(b)[:, None] * K
                      + idx // vocab).reshape(-1)
            tokens = (idx % vocab).reshape(-1).astype(jnp.int32)
            if fns.reorder_cache is not None:
                cache = fns.reorder_cache(cache, parent)
            else:
                # the production skip rules (ops/decoding.py) — not an
                # inline copy that could drift from them
                cache = reorder_beam_cache(cache, parent)
            if i >= 50:  # boundary region only — keep the test fast
                picked.append(np.asarray(tokens))
        return np.stack(picked)

    std_tokens = beam_loop(ref, ref.init_cache(rows, enc))
    mega_b = make_whisper_mega_fns(cfg, params, max_len, interpret=True,
                                   quantize=False)
    mega_tokens = beam_loop(mega_b, mega_b.init_cache(rows, enc))
    np.testing.assert_array_equal(mega_tokens, std_tokens)


def test_skipped_reorder_is_noop_after_applied_permutation(setup):
    """Regression for the round-4 advisor finding: step() consumes
    pending_src by APPLYING it inside the kernel, so the cache it returns
    must carry the identity — a caller that skips reorder_cache on a step
    gets a no-op, not a stale re-permutation of the self caches."""
    cfg, model, params, enc = setup
    K = 2
    b = enc.shape[0]
    rows = b * K
    ref = make_decode_fns(model, params, MAX_LEN)
    mega = make_whisper_mega_fns(cfg, params, MAX_LEN, interpret=True,
                                 quantize=False)
    cache_r = ref.init_cache(rows, enc)   # shared per-example cross
    cache_m = mega.init_cache(rows, enc)  # grouped mega layout

    toks = jnp.asarray(np.arange(rows) % 7 + 3, jnp.int32)
    lr, cache_r = ref.step(toks, cache_r, jnp.asarray(0), None)
    lm, cache_m = mega.step(toks, cache_m, jnp.asarray(0), None)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lr),
                               atol=2e-4, rtol=2e-4)

    # a non-identity within-example permutation (swap each example's beams)
    parent = jnp.asarray(
        [(i // K) * K + (K - 1 - i % K) for i in range(rows)], jnp.int32)
    cache_r = reorder_beam_cache(cache_r, parent)
    cache_m = mega.reorder_cache(cache_m, parent)

    toks2 = jnp.asarray(np.arange(rows) % 5 + 2, jnp.int32)
    lr, cache_r = ref.step(toks2, cache_r, jnp.asarray(1), None)
    lm, cache_m = mega.step(toks2, cache_m, jnp.asarray(1), None)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lr),
                               atol=2e-4, rtol=2e-4)
    # the permutation was applied in-kernel — pending_src must be identity
    np.testing.assert_array_equal(np.asarray(cache_m["pending_src"]),
                                  np.arange(rows))

    # step WITHOUT an intervening reorder_cache: with the old bug the
    # stale permutation re-applies and the self caches diverge
    toks3 = jnp.asarray(np.arange(rows) % 9 + 1, jnp.int32)
    lr, cache_r = ref.step(toks3, cache_r, jnp.asarray(2), None)
    lm, cache_m = mega.step(toks3, cache_m, jnp.asarray(2), None)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lr),
                               atol=2e-4, rtol=2e-4)
