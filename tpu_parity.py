"""Hardware parity harness: run every Pallas kernel compiled on the real TPU
and check it against its pure-XLA reference semantics.

Why this exists: the pytest suite validates all kernels in Pallas interpret
mode on the CPU mesh (tests/conftest.py), but Mosaic lowering on hardware is
a different code path — this repo has already measured silent wrong-data
cases that interpret mode cannot catch (5-D BlockSpecs, see
CLAUDE.md / ops_probe_tpu.py). This script is the on-chip twin of those
tests: small shapes, seconds-to-minutes compiles, one JSON line per check
plus a summary line, exit code 1 on any failure.

Checks
  fused_fwd / fused_bwd / fused_fwd_padded / fused_nobias_rect:
      ops/fused_attention vs the dense softmax reference (f32 exact-ish).
  fused_dropout_hw_vs_interpret:
      in-kernel murmur-hash dropout, compiled Mosaic vs interpret lowering
      on identical inputs — the keep mask must be bit-identical.
  deformable_fwd / deformable_bwd:
      ops/deformable_attention Pallas kernel + custom VJP vs the gather
      oracle (reference semantics: PDVC ms_deform_attn_func.py:44-71).
  mega_greedy / mega_beam:
      ops/decode_megakernel vs the standard per-op decode path, token
      identity at an fp32 toy T5 config (same config as
      tests/test_decode_megakernel.py, compiled instead of interpreted).
  fused_decode_step:
      the opt-in per-layer decode kernels (ops/decode_attention) vs the
      pure-XLA incremental path, greedy token identity.
  whisper_mega:
      ops/whisper_megakernel vs the standard Whisper incremental path,
      greedy token identity at a toy fp32 config.
  auction_vs_scipy:
      ops/matching on-device auction vs scipy linear_sum_assignment cost.

Usage:  python tpu_parity.py [--skip mega] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

RESULTS = []


def record(name: str, ok: bool, detail: str, seconds: float) -> None:
    row = {"check": name, "ok": bool(ok), "detail": detail,
           "seconds": round(seconds, 2)}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def run(name: str):
    """Decorator: time the check, catch exceptions as failures."""
    def wrap(fn):
        def runner():
            t0 = time.time()
            try:
                detail = fn() or ""
                record(name, True, detail, time.time() - t0)
            except Exception as exc:  # noqa: BLE001 - report, don't crash
                record(name, False, f"{type(exc).__name__}: {exc}",
                       time.time() - t0)
        runner.check_name = name
        return runner
    return wrap


# ---------------------------------------------------------------- fused attn

def _dense_reference(q, k, v, bias, key_mask):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    scores = jnp.where(key_mask[:, None, None, :] > 0, scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _attn_inputs(lq, lk=None, b=2, h=4, d=64, seed=0):
    lk = lq if lk is None else lk
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(1, h, lq, lk)), jnp.float32)
    mask = np.ones((b, lk), np.int32)
    mask[0, -lk // 4:] = 0
    return q, k, v, bias, jnp.asarray(mask)


def _seed0():
    return jnp.zeros((1, 1), jnp.uint32)


@run("fused_fwd")
def check_fused_fwd():
    from vidchapters_tpu.ops.fused_attention import fused_attention
    q, k, v, bias, mask = _attn_inputs(512)
    out = jax.jit(lambda *a: fused_attention(*a, _seed0(), False))(
        q, k, v, bias, mask)
    ref = _dense_reference(q, k, v, bias, mask)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-4, f"max_err={err}"
    return f"max_err={err:.2e} L=512"


@run("fused_bwd")
def check_fused_bwd():
    from vidchapters_tpu.ops.fused_attention import fused_attention
    q, k, v, bias, mask = _attn_inputs(256)

    def loss_fused(q, k, v, bias):
        out = fused_attention(q, k, v, bias, mask, _seed0(), False)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    def loss_dense(q, k, v, bias):
        out = _dense_reference(q, k, v, bias, mask)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
    errs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(gf, gd)]
    # grads accumulate over 256 rows; tolerance scales with magnitude
    scale = max(float(jnp.max(jnp.abs(g))) for g in gd)
    assert max(errs) < 1e-3 * max(scale, 1.0), f"errs={errs} scale={scale}"
    return f"max_err={max(errs):.2e} (dq,dk,dv,dbias)"


@run("fused_fwd_padded")
def check_fused_padded():
    from vidchapters_tpu.ops.fused_attention import (
        BLOCK_Q, fused_attention_padded)
    lq = BLOCK_Q + 37
    q, k, v, bias, mask = _attn_inputs(lq)
    out = jax.jit(lambda *a: fused_attention_padded(*a, False))(
        q, k, v, bias, mask)
    ref = _dense_reference(q, k, v, bias, mask)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-4, f"max_err={err}"
    return f"max_err={err:.2e} L={lq}"


@run("fused_nobias_rect")
def check_fused_nobias():
    from vidchapters_tpu.ops.fused_attention import fused_attention_padded
    lq, lk = 267, 1100  # decoder-cross-ish ragged shape, both need padding
    q, k, v, _, mask = _attn_inputs(lq, lk=lk)
    out = jax.jit(lambda a, b, c, m: fused_attention_padded(
        a, b, c, None, m, False))(q, k, v, mask)
    ref = _dense_reference(q, k, v, None, mask)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 2e-4, f"max_err={err}"
    return f"max_err={err:.2e} Lq={lq} Lk={lk}"


@run("fused_dropout_hw_vs_interpret")
def check_fused_dropout():
    """The murmur-hash keep mask must lower identically under Mosaic and
    interpret mode — a mismatch would silently change training dropout."""
    from vidchapters_tpu.ops.fused_attention import fused_attention
    q, k, v, bias, mask = _attn_inputs(256)
    seed = jnp.full((1, 1), 1234, jnp.uint32)
    hw = jax.jit(lambda *a: fused_attention(
        *a, seed, False, 0.1))(q, k, v, bias, mask)
    it = jax.jit(lambda *a: fused_attention(
        *a, seed, True, 0.1))(q, k, v, bias, mask)
    err = float(jnp.max(jnp.abs(hw - it)))
    # identical mask + identical arithmetic order inside the kernel is not
    # guaranteed across lowerings; require the mask to match (zeros align)
    # and values to agree to f32 roundoff
    hw_zero = np.asarray(jnp.abs(hw) < 1e-30)
    it_zero = np.asarray(jnp.abs(it) < 1e-30)
    assert err < 1e-3, f"max_err={err}"
    frac = float(np.mean(hw_zero == it_zero))
    assert frac == 1.0, f"keep-mask agreement={frac}"
    return f"max_err={err:.2e} mask_identical=True"


# ----------------------------------------------------------- deformable attn

def _deform_inputs(seed=0, n=2, m=4, d=32, lq=50,
                   shapes=(100, 50, 25, 13), p=4):
    rng = np.random.default_rng(seed)
    s = sum(shapes)
    L = len(shapes)
    value = jnp.asarray(rng.normal(size=(n, s, m, d)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 1, size=(n, lq, m, L, p)), jnp.float32)
    attn = rng.uniform(size=(n, lq, m, L, p)).astype(np.float32)
    attn = attn / attn.sum(axis=(3, 4), keepdims=True)
    return value, shapes, loc, jnp.asarray(attn)


@run("deformable_fwd")
def check_deform_fwd():
    from vidchapters_tpu.ops.deformable_attention import (
        deformable_attention_1d_pallas, deformable_attention_1d_reference)
    value, shapes, loc, attn = _deform_inputs()
    out = jax.jit(lambda v, l, a: deformable_attention_1d_pallas(
        v, shapes, l, a, False))(value, loc, attn)
    ref = deformable_attention_1d_reference(value, shapes, loc, attn)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-4, f"max_err={err}"
    return f"max_err={err:.2e}"


@run("deformable_bwd")
def check_deform_bwd():
    from vidchapters_tpu.ops.deformable_attention import (
        deformable_attention_1d_pallas, deformable_attention_1d_reference)
    value, shapes, loc, attn = _deform_inputs()

    def loss_pallas(v, l, a):
        out = deformable_attention_1d_pallas(v, shapes, l, a, False)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    def loss_ref(v, l, a):
        out = deformable_attention_1d_reference(v, shapes, l, a)
        return (out.astype(jnp.float32) ** 2).sum() * 0.5

    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(value, loc, attn)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, attn)
    errs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(gp, gr)]
    scale = max(float(jnp.max(jnp.abs(g))) for g in gr)
    assert max(errs) < 1e-3 * max(scale, 1.0), f"errs={errs}"
    return f"max_err={max(errs):.2e} (dvalue,dloc,dattn)"


# ------------------------------------------------------------ mega decode

def _toy_t5():
    from vidchapters_tpu.config import T5Config
    from vidchapters_tpu.models.t5 import T5ForConditionalGeneration
    cfg = T5Config(vocab_size=256, d_model=256, d_kv=64, d_ff=512,
                   num_layers=2, num_decoder_layers=3, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=16,
                   dropout_rate=0.0, encoder_dropout=0.0,
                   decoder_dropout=0.0, dtype="float32")
    model = T5ForConditionalGeneration(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32))["params"]
    rng = np.random.default_rng(0)
    b0, lenc = 8, 32
    enc_out = jnp.asarray(
        rng.normal(size=(b0, lenc, cfg.d_model)).astype(np.float32))
    enc_mask = np.ones((b0, lenc), np.int32)
    enc_mask[0, 15:] = 0
    enc_mask[3, 10:] = 0
    return cfg, model, params, enc_out, jnp.asarray(enc_mask)


def _mega_identity(num_beams: int) -> str:
    from vidchapters_tpu.ops.decode_megakernel import make_mega_decode_fns
    from vidchapters_tpu.ops.decoding import (
        beam_search, greedy_decode, make_decode_fns)
    cfg, model, params, enc_out, enc_mask = _toy_t5()
    max_len = 16
    ref = make_decode_fns(model, params, max_len)
    mega = make_mega_decode_fns(cfg, params, max_len, num_beams=num_beams,
                                interpret=False)
    if num_beams == 1:
        ref_seqs = np.asarray(greedy_decode(ref, enc_out, enc_mask, max_len))
        mega_seqs = np.asarray(greedy_decode(mega, enc_out, enc_mask,
                                             max_len))
    else:
        ref_seqs = np.asarray(beam_search(
            ref, enc_out, enc_mask, max_len, num_beams=num_beams))
        mega_seqs = np.asarray(beam_search(
            mega, enc_out, enc_mask, max_len, num_beams=num_beams))
    diff = int((ref_seqs != mega_seqs).sum())
    assert diff == 0, f"token mismatches: {diff}/{ref_seqs.size}"
    return f"tokens identical ({ref_seqs.size})"


@run("mega_greedy")
def check_mega_greedy():
    return _mega_identity(1)


@run("mega_beam4")
def check_mega_beam():
    return _mega_identity(4)


@run("fused_decode_step")
def check_fused_decode_step():
    """Legacy opt-in per-layer decode kernels (ops/decode_attention:
    decode_self_attention / decode_cross_attention, t5.USE_FUSED_DECODE)
    vs the pure-XLA incremental path: greedy token identity."""
    from vidchapters_tpu.models import t5 as t5_mod
    from vidchapters_tpu.ops.decoding import greedy_decode, make_decode_fns
    cfg, model, params, enc_out, enc_mask = _toy_t5()
    max_len = 16
    ref = make_decode_fns(model, params, max_len)
    ref_seqs = np.asarray(greedy_decode(ref, enc_out, enc_mask, max_len))
    t5_mod.USE_FUSED_DECODE = True
    try:
        fused = make_decode_fns(model, params, max_len)
        fused_seqs = np.asarray(greedy_decode(fused, enc_out, enc_mask,
                                              max_len))
    finally:
        t5_mod.USE_FUSED_DECODE = False
    diff = int((ref_seqs != fused_seqs).sum())
    assert diff == 0, f"token mismatches: {diff}/{ref_seqs.size}"
    return f"tokens identical ({ref_seqs.size})"


@run("whisper_mega")
def check_whisper_mega():
    """Whisper cross-layer decode megakernel vs the standard incremental
    path: greedy token identity at a toy fp32 config (same fixture family
    as tests/test_whisper_megakernel.py, compiled instead of interpreted)."""
    from vidchapters_tpu.models.whisper import Whisper, WhisperConfig
    from vidchapters_tpu.ops.decoding import greedy_decode, make_decode_fns
    from vidchapters_tpu.ops.whisper_megakernel import make_whisper_mega_fns
    max_len = 12
    cfg = WhisperConfig(vocab_size=256, num_mel_bins=8, d_model=64,
                        encoder_layers=1, decoder_layers=2, num_heads=4,
                        d_ff=128, max_source_positions=30,
                        max_target_positions=max_len, dtype="float32")
    model = Whisper(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(4, 8, 60)), jnp.float32)
    toks = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), mel[:1], toks)["params"]
    enc = model.apply({"params": params}, mel, method=model.encode)
    enc_mask = jnp.ones(enc.shape[:2], jnp.int32)
    ref = make_decode_fns(model, params, max_len)
    mega = make_whisper_mega_fns(cfg, params, max_len, interpret=False)
    ref_seqs = np.asarray(greedy_decode(ref, enc, enc_mask, max_len))
    mega_seqs = np.asarray(greedy_decode(mega, enc, enc_mask, max_len))
    diff = int((ref_seqs != mega_seqs).sum())
    assert diff == 0, f"token mismatches: {diff}/{ref_seqs.size}"
    return f"tokens identical ({ref_seqs.size})"


@run("whisper_mega_beam")
def check_whisper_mega_beam():
    """Whisper megakernel BEAM path on chip: deferred in-kernel beam
    permutation (aliased cache write-back + in-kernel row append, round 4)
    vs the standard path's explicit tree gather — token ancestry must be
    identical (same fixture family as
    tests/test_whisper_megakernel.py::test_mega_beam_ancestry_matches_standard,
    compiled instead of interpreted)."""
    from vidchapters_tpu.models.whisper import Whisper, WhisperConfig
    from vidchapters_tpu.ops.decoding import make_decode_fns
    from vidchapters_tpu.ops.whisper_megakernel import make_whisper_mega_fns
    max_len = 10
    K, b = 4, 2
    rows = b * K
    cfg = WhisperConfig(vocab_size=256, num_mel_bins=8, d_model=64,
                        encoder_layers=1, decoder_layers=2, num_heads=4,
                        d_ff=128, max_source_positions=30,
                        max_target_positions=max_len, dtype="float32")
    model = Whisper(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(b, 8, 60)), jnp.float32)
    toks = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), mel[:1], toks)["params"]
    enc = model.apply({"params": params}, mel, method=model.encode)
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
            if fns.reorder_cache is not None:
                cache = fns.reorder_cache(cache, parent)
            else:
                def perm(x):
                    return (jnp.take(x, parent, axis=0)
                            if x.ndim and x.shape[0] == rows else x)
                if isinstance(cache, dict) and "cross" in cache:
                    cache = {k: (v if k == "cross"
                                 else jax.tree_util.tree_map(perm, v))
                             for k, v in cache.items()}
                else:
                    cache = jax.tree_util.tree_map(perm, cache)
            picked.append(np.asarray(tokens))
        return np.stack(picked)

    ref = make_decode_fns(model, params, max_len)
    std_tokens = beam_loop(ref, ref.init_cache(rows, enc))
    mega = make_whisper_mega_fns(cfg, params, max_len, interpret=False,
                                 quantize=False)
    mega_tokens = beam_loop(mega, mega.init_cache(rows, enc))
    diff = int((std_tokens != mega_tokens).sum())
    assert diff == 0, f"token mismatches: {diff}/{std_tokens.size}"
    return f"beam ancestry identical ({std_tokens.size} tokens)"


@run("whisper_mega_beam_chunked")
def check_whisper_mega_beam_chunked():
    """Whisper megakernel BEAM path with CACHE_CHUNK(56) prefix-skip cache
    streaming actually COMPILED on chip: max_target_positions=112 (two
    chunks) and 62 decode steps, so the online-softmax accumulation across
    the chunk boundary, the dead-chunk index-map clamp, and the per-chunk
    deferred-permutation write-back all run through Mosaic — the class of
    block-layout behavior interpret mode cannot catch (advisor round 4;
    CPU twin: tests/test_whisper_megakernel.py::
    test_multi_chunk_greedy_and_beam_cross_boundary). The whole beam loop
    runs under one lax.scan per path (62 eager steps would pay the tunnel
    RPC floor 62 times)."""
    from vidchapters_tpu.models.whisper import Whisper, WhisperConfig
    from vidchapters_tpu.ops.decoding import make_decode_fns
    from vidchapters_tpu.ops import whisper_megakernel as wm
    from vidchapters_tpu.ops.whisper_megakernel import make_whisper_mega_fns
    max_len = 2 * wm.CACHE_CHUNK  # 112 at the default chunk
    steps = wm.CACHE_CHUNK + 6    # crosses the boundary
    K, b = 4, 2
    rows = b * K
    cfg = WhisperConfig(vocab_size=256, num_mel_bins=8, d_model=64,
                        encoder_layers=1, decoder_layers=2, num_heads=4,
                        d_ff=128, max_source_positions=30,
                        max_target_positions=max_len, dtype="float32")
    model = Whisper(cfg)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.normal(size=(b, 8, 60)), jnp.float32)
    toks = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(3), mel[:1], toks)["params"]
    enc = model.apply({"params": params}, mel, method=model.encode)
    vocab = cfg.vocab_size

    def beam_tokens(fns):
        cache0 = fns.init_cache(rows, enc)

        def body(carry, i):
            tokens, sum_lp, cache = carry
            logits, cache = fns.step(tokens, cache, i, None)
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
                def perm(x):
                    return (jnp.take(x, parent, axis=0)
                            if x.ndim and x.shape[0] == rows else x)
                cache = {k: (v if k == "cross"
                             else jax.tree_util.tree_map(perm, v))
                         for k, v in cache.items()}
            return (tokens, sum_lp, cache), tokens

        tokens0 = jnp.full((rows,), 5, jnp.int32)
        sum_lp0 = jnp.concatenate(
            [jnp.zeros((b, 1)), jnp.full((b, K - 1), -1e9)], axis=1)

        def loop(t0, s0, c0):
            (_, _, _), picked = jax.lax.scan(
                body, (t0, s0, c0), jnp.arange(steps))
            return picked

        return np.asarray(jax.jit(loop)(tokens0, sum_lp0, cache0))

    ref = make_decode_fns(model, params, max_len)
    std_tokens = beam_tokens(ref)
    mega = make_whisper_mega_fns(cfg, params, max_len, interpret=False,
                                 quantize=False)
    mega_tokens = beam_tokens(mega)
    diff = int((std_tokens != mega_tokens).sum())
    pre = int((std_tokens[:wm.CACHE_CHUNK]
               != mega_tokens[:wm.CACHE_CHUNK]).sum())
    assert diff == 0, (f"token mismatches: {diff}/{std_tokens.size} "
                       f"({pre} before the chunk boundary)")
    return (f"2-chunk beam ancestry identical "
            f"({std_tokens.size} tokens, {steps} steps)")


@run("topk_vs_lax")
def check_topk():
    """Single-pass Pallas beam top-k vs lax.top_k: exact values AND
    indices (incl. smallest-index tie-break) on a tie-heavy block."""
    from vidchapters_tpu.ops.decoding import _topk_pallas
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 4 * 32128)).astype(np.float32)
    x[:, ::97] = x[:, 1::97][:, : x[:, ::97].shape[1]]  # inject exact ties
    xj = jnp.asarray(x)
    pv, pi = jax.jit(lambda a: _topk_pallas(a, 8, False))(xj)
    lv, li = jax.lax.top_k(xj, 8)
    assert np.array_equal(np.asarray(pv), np.asarray(lv)), "values differ"
    assert np.array_equal(np.asarray(pi), np.asarray(li)), "indices differ"
    return "values+indices identical (k=8, ties)"


# -------------------------------------------------------------- matching

@run("auction_vs_scipy")
def check_auction():
    """cost [Q, T], valid [T] (prefix), result [T] -> assigned query.

    The auction solver is eps-optimal, so compare the achieved assignment
    COST against scipy's exact optimum (same criterion as
    tests/test_span_ops_matching.py::test_auction_agreement_at_pdvc_scale).
    """
    from vidchapters_tpu.ops.matching import hungarian_match, scipy_lsap
    rng = np.random.default_rng(0)
    q_n, t_n = 100, 100
    worst = 0.0
    matcher = jax.jit(lambda c, v: hungarian_match(c, v))
    for n_valid in (5, 37, 75, 100):
        cost = rng.normal(size=(q_n, t_n)).astype(np.float32)
        valid = np.zeros((t_n,), np.int32)
        valid[:n_valid] = 1
        ours = np.asarray(matcher(jnp.asarray(cost), jnp.asarray(valid)))
        ref = scipy_lsap(cost, n_valid)
        c_ours = sum(cost[ours[t], t] for t in range(n_valid)
                     if ours[t] >= 0)
        c_ref = sum(cost[ref[t], t] for t in range(n_valid) if ref[t] >= 0)
        assert sum(ours[t] >= 0 for t in range(n_valid)) == n_valid, \
            f"unassigned valid targets at n={n_valid}"
        assert len(set(ours[:n_valid].tolist())) == n_valid, \
            f"duplicate query assignment at n={n_valid}"
        rel = abs(c_ours - c_ref) / max(abs(c_ref), 1e-6)
        worst = max(worst, rel)
    assert worst < 0.01, f"worst rel cost gap {worst}"
    return f"worst_rel_cost_gap={worst:.2e}"


# ------------------------------------------------------------------- main

ALL = [check_fused_fwd, check_fused_bwd, check_fused_padded,
       check_fused_nobias, check_fused_dropout,
       check_deform_fwd, check_deform_bwd,
       check_mega_greedy, check_mega_beam,
       check_fused_decode_step, check_whisper_mega,
       check_whisper_mega_beam, check_whisper_mega_beam_chunked,
       check_topk, check_auction]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", default=[],
                    help="substring filters of check names to skip")
    ap.add_argument("--only", nargs="*", default=[],
                    help="substring filters; run only matching checks")
    ap.add_argument("--json", default=None, help="also write results here")
    args = ap.parse_args()

    # exact f32 matmuls, same as tests/conftest.py: the dense references
    # otherwise run TPU default-precision (bf16-pass) matmuls and the softmax
    # backward's cancellation amplifies that to ~1% on dq/dk/dbias — measured
    # here; the Pallas kernels' in-kernel dots are f32 regardless
    jax.config.update("jax_default_matmul_precision", "highest")
    backend = jax.default_backend()
    print(json.dumps({"backend": backend,
                      "device": str(jax.devices()[0])}), flush=True)
    for check in ALL:
        name = check.check_name
        if any(s in name for s in args.skip):
            continue
        if args.only and not any(s in name for s in args.only):
            continue
        check()
    n_ok = sum(r["ok"] for r in RESULTS)
    summary = {"summary": True, "backend": backend,
               "passed": n_ok, "total": len(RESULTS),
               "ok": n_ok == len(RESULTS)}
    print(json.dumps(summary), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"results": RESULTS, **summary}, f, indent=1)
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
