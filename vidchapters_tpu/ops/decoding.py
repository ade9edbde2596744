"""Autoregressive decoding under jit: greedy, beam search, nucleus sampling.

The reference relies on HF ``generate`` (model/vid2seq.py:150-162) whose
Python control flow re-traces per step on dynamic shapes; here the whole
decode loop is a single XLA program over a static-shape KV cache
(``lax.while_loop`` / ``lax.scan``), which is the TPU-native formulation.

Beam-search semantics follow HF's beam scorer as configured by the reference
(num_beams=4, length_penalty, early_stopping=False, min_length): scores are
summed log-probs; finished hypotheses are ranked by ``score / len**penalty``;
the loop ends when no running beam can still improve the worst kept
hypothesis or ``max_length`` is reached.

All entry points take a ``model_fns`` pair built by ``make_decode_fns`` so
they work for any encoder-decoder exposing init_cache/decode_step (Vid2Seq
and the raw T5 both do).
"""

from __future__ import annotations


from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1.0e7


class DecodeFns(NamedTuple):
    init_cache: Callable[[int, int, Array], Any]
    step: Callable[[Array, Any, Array, Array], Tuple[Array, Any]]
    # optional override for beam-search cache reordering (e.g. the mega
    # decode path defers the permutation into the next step's kernel,
    # which streams the cache anyway — see ops/decode_megakernel.py)
    reorder_cache: Any = None


def make_decode_fns(model, params, max_length: int) -> DecodeFns:
    """Bind a flax module + params into cache/step closures."""

    def init_cache(batch, enc_out):
        return model.apply({"params": params}, batch, max_length, enc_out,
                           method=model.init_cache)

    def step(tokens, cache, index, enc_mask):
        return model.apply({"params": params}, tokens, cache, index, enc_mask,
                           max_length, method=model.decode_step)

    return DecodeFns(init_cache, step)


def _apply_repetition_penalty(logits: Array, sequences: Array,
                              penalty: float) -> Array:
    """HF RepetitionPenaltyLogitsProcessor: for tokens already generated,
    divide positive logits by ``penalty`` and multiply negative ones."""
    if penalty == 1.0:
        return logits
    vocab = logits.shape[-1]
    seen = jnp.zeros(logits.shape, bool)
    one_hot = jax.nn.one_hot(sequences, vocab, dtype=bool)
    seen = jnp.any(one_hot, axis=-2)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


# ---------------------------------------------------------------------------
# Greedy
# ---------------------------------------------------------------------------


def greedy_decode(fns: DecodeFns, enc_out: Array, enc_mask: Array,
                  max_length: int, eos_token_id: int = 1,
                  decoder_start_token_id: int = 0,
                  min_length: int = 0,
                  repetition_penalty: float = 1.0) -> Array:
    """Returns [batch, max_length] sequences (0-padded after EOS)."""
    batch = enc_out.shape[0]
    cache = fns.init_cache(batch, enc_out)

    def cond(state):
        i, _, _, finished, _ = state
        return (i < max_length) & (~jnp.all(finished))

    def body(state):
        i, tokens, seqs, finished, cache = state
        logits, cache = fns.step(tokens, cache, i, enc_mask)
        logits = _apply_repetition_penalty(logits, seqs, repetition_penalty)
        logits = jnp.where((i + 1 < min_length),
                           logits.at[:, eos_token_id].set(NEG_INF), logits)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, 0, next_tok)
        seqs = seqs.at[:, i].set(next_tok)
        finished = finished | (next_tok == eos_token_id)
        return i + 1, next_tok, seqs, finished, cache

    tokens0 = jnp.full((batch,), decoder_start_token_id, jnp.int32)
    seqs0 = jnp.zeros((batch, max_length), jnp.int32)
    finished0 = jnp.zeros((batch,), bool)
    _, _, seqs, _, _ = jax.lax.while_loop(
        cond, body, (jnp.array(0), tokens0, seqs0, finished0, cache))
    return seqs


# ---------------------------------------------------------------------------
# Nucleus (top-p) sampling  — used when the reference passes num_beams=0
# (dvc.py:177, use_nucleus_sampling)
# ---------------------------------------------------------------------------


def nucleus_sample(fns: DecodeFns, enc_out: Array, enc_mask: Array,
                   max_length: int, rng: Array, top_p: float = 0.9,
                   temperature: float = 1.0, eos_token_id: int = 1,
                   decoder_start_token_id: int = 0,
                   min_length: int = 0) -> Array:
    batch = enc_out.shape[0]
    cache = fns.init_cache(batch, enc_out)

    def topp_filter(logits):
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(sorted_probs, axis=-1)
        # keep the smallest prefix reaching top_p (top-1 always kept):
        # a position stays if the mass BEFORE it is still < top_p
        kept = (cum - sorted_probs) < top_p
        threshold = jnp.min(jnp.where(kept, sorted_logits, jnp.inf), axis=-1)
        return jnp.where(logits < threshold[:, None], NEG_INF, logits)

    def body(state):
        i, tokens, seqs, finished, cache, rng = state
        logits, cache = fns.step(tokens, cache, i, enc_mask)
        logits = logits / jnp.maximum(temperature, 1e-6)
        logits = jnp.where((i + 1 < min_length),
                           logits.at[:, eos_token_id].set(NEG_INF), logits)
        logits = topp_filter(logits)
        rng, sub = jax.random.split(rng)
        next_tok = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, 0, next_tok)
        seqs = seqs.at[:, i].set(next_tok)
        finished = finished | (next_tok == eos_token_id)
        return i + 1, next_tok, seqs, finished, cache, rng

    def cond(state):
        i, _, _, finished, _, _ = state
        return (i < max_length) & (~jnp.all(finished))

    tokens0 = jnp.full((batch,), decoder_start_token_id, jnp.int32)
    seqs0 = jnp.zeros((batch, max_length), jnp.int32)
    finished0 = jnp.zeros((batch,), bool)
    _, _, seqs, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.array(0), tokens0, seqs0, finished0, cache, rng))
    return seqs


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------


def _flatten_beams(x: Array) -> Array:
    return x.reshape((-1,) + x.shape[2:])


def _unflatten_beams(x: Array, batch: int, beams: int) -> Array:
    return x.reshape((batch, beams) + x.shape[1:])


def _gather_beams(tree, indices: Array, batch: int):
    """Select beams by [batch, k] indices along axis 1 of every leaf."""

    def gather(x):
        return jax.vmap(lambda xb, ib: jnp.take(xb, ib, axis=0))(x, indices)

    return jax.tree_util.tree_map(gather, tree)


def _permute_rows(x: Array, src: Array) -> Array:
    """``x[src]`` as a one-hot permutation MATMUL for large buffers.

    XLA:TPU lowers a row gather on a multi-hundred-MB KV cache ~2.3x
    slower than the copy bandwidth floor (measured 6.9 ms vs ~3 ms for
    the 2.4 GB beam reorder, BENCH_NOTES.md round 2); the MXU streams the
    same permutation at bandwidth. Exact for any dtype: each output row
    accumulates exactly one input row scaled by 1.0."""
    b = x.shape[0]
    # measured crossover on v5e: the 604 MB stacked mega caches reorder
    # 2.3x faster as a matmul, while the standard path's 25 MB per-layer
    # leaves are better off with the native gather
    if x.size < (1 << 26):
        return jnp.take(x, src, axis=0)
    onehot = jax.nn.one_hot(src, b, dtype=x.dtype)       # [B, B]
    flat = x.reshape(b, -1)
    out = jax.lax.dot_general(onehot, flat, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(x.dtype).reshape(x.shape)


def reorder_beam_cache(cache, flat_src: Array):
    """Permute a decode cache's per-beam rows to follow surviving beams.

    The ONE place the skip rules live (beam_search, the Whisper
    transcriber's beam loop, and bench_asr all route here): leaves under
    any ``cross`` key are beam-invariant — per-example KV shared by the
    grouped attention path, or mega-path rows repeated per beam — so the
    gather on those multi-hundred-MB buffers would be a semantic no-op;
    every other leaf permutes when its leading dim is the beam-flat row
    count (``_permute_rows`` picks gather vs one-hot matmul by size)."""
    rows = flat_src.shape[0]

    def reorder(path, x):
        if any(getattr(k, "key", None) == "cross" for k in path):
            return x
        if getattr(x, "ndim", 0) and x.shape[0] == rows:
            return _permute_rows(x, flat_src)
        return x

    return jax.tree_util.tree_map_with_path(reorder, cache)


def _topk_iterative(x: Array, k: int) -> Tuple[Array, Array]:
    """``lax.top_k`` for small k via k max/argmax sweeps.

    TPU's sort-based top_k over [batch, beams*vocab] costs ~1.4 ms per
    decode step (BENCH_NOTES.md round 2); k passes of max+mask are ~30x
    cheaper for k <= 16. Matches lax.top_k exactly, including the
    smallest-index tie break."""
    vals, idxs = [], []
    neg = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for _ in range(k):
        top = jnp.argmax(x, axis=-1)
        vals.append(jnp.take_along_axis(x, top[:, None], axis=-1)[:, 0])
        idxs.append(top.astype(jnp.int32))
        x = jnp.where(cols == top[:, None], neg, x)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


def _topk_pallas(x: Array, k: int,
                 interpret: bool = False) -> Tuple[Array, Array]:
    """Single-HBM-pass small-k top-k: one Pallas cell holds the whole
    [batch, beams*vocab] score block in VMEM and runs the k max/mask
    sweeps there, so HBM sees the 8 MB block once instead of ~2k times
    (the XLA sweeps re-materialize the masked array every pass — measured
    0.54 ms/step of the beam body on v5e). Tie-break identical to
    lax.top_k / _topk_iterative: smallest index wins (argmax via
    min-of-iota-at-max)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, n = x.shape
    neg = jnp.finfo(x.dtype).min

    def kernel(x_ref, vals_ref, idx_ref):
        xv = x_ref[...]
        iota = jax.lax.broadcasted_iota(jnp.int32, xv.shape, 1)
        vals, idxs = [], []
        for _ in range(k):
            m = jnp.max(xv, axis=1, keepdims=True)            # [B, 1]
            at = jnp.where(xv == m, iota, n)
            ix = jnp.min(at, axis=1, keepdims=True)           # [B, 1]
            vals.append(m)
            idxs.append(ix)
            xv = jnp.where(iota == ix, neg, xv)
        vals_ref[...] = jnp.concatenate(vals, axis=1)
        idx_ref[...] = jnp.concatenate(idxs, axis=1)

    vals, idxs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((bsz, k), x.dtype),
                   jax.ShapeDtypeStruct((bsz, k), jnp.int32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x)
    return vals, idxs


def _topk_small(x: Array, k: int) -> Tuple[Array, Array]:
    """Route small-k top-k to the Pallas kernel on TPU backends."""
    if jax.default_backend() not in ("cpu", "gpu"):
        return _topk_pallas(x, k)
    return _topk_iterative(x, k)


def beam_search(fns: DecodeFns, enc_out: Array, enc_mask: Array,
                max_length: int, num_beams: int = 4,
                eos_token_id: int = 1, decoder_start_token_id: int = 0,
                length_penalty: float = 1.0, min_length: int = 0,
                repetition_penalty: float = 1.0,
                early_stopping: bool = False) -> Array:
    """Returns [batch, max_length] best sequences."""
    batch, src_len = enc_out.shape[0], enc_out.shape[1]
    K = num_beams

    # self-attention caches live per beam ([B*K, ...]); cross-attention KV is
    # beam-invariant, so it is built once per example and shared via the
    # grouped cross-attention path (no [B*K, H, L, D] duplication)
    cache = fns.init_cache(batch * K, enc_out)
    enc_mask_b = enc_mask

    running_seqs = jnp.zeros((batch, K, max_length), jnp.int32)
    # only beam 0 is live initially; others start at -inf
    running_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32), (batch, 1))
    finished_seqs = jnp.zeros((batch, K, max_length), jnp.int32)
    finished_scores = jnp.full((batch, K), NEG_INF, jnp.float32)
    finished_flags = jnp.zeros((batch, K), bool)
    tokens = jnp.full((batch, K), decoder_start_token_id, jnp.int32)

    def not_done(state):
        (i, _, running_scores, _, finished_scores, finished_flags, _, _) = state
        if early_stopping:
            improvable = ~jnp.all(finished_flags, axis=1)
        else:
            # HF early_stopping=False heuristic: the attainable score of a
            # running beam is bounded by its current sum normalized at the
            # CURRENT length (BeamHypotheses.is_done) — normalizing by
            # max_length would be HF's 'never' semantics and can run extra
            # steps / return a different hypothesis (ADVICE r1)
            cur_len = jnp.maximum(i + 1, 1).astype(jnp.float32)
            best_possible = running_scores / (cur_len ** length_penalty)
            worst_finished = jnp.min(
                jnp.where(finished_flags, finished_scores, NEG_INF), axis=1)
            improvable = jnp.any(best_possible > worst_finished[:, None], axis=1) | (
                ~jnp.any(finished_flags, axis=1))
        return (i < max_length) & jnp.any(improvable)

    def body(state):
        (i, running_seqs, running_scores, finished_seqs, finished_scores,
         finished_flags, tokens, cache) = state
        logits, cache = fns.step(_flatten_beams(tokens), cache, i, enc_mask_b)
        vocab = logits.shape[-1]
        logits = _apply_repetition_penalty(
            logits, _flatten_beams(running_seqs), repetition_penalty)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = jnp.where((i + 1 < min_length),
                         logp.at[:, eos_token_id].set(NEG_INF), logp)
        logp = _unflatten_beams(logp, batch, K)  # [B, K, V]
        cand_scores = running_scores[:, :, None] + logp
        flat = cand_scores.reshape(batch, K * vocab)
        top_scores, top_idx = _topk_small(flat, 2 * K)
        beam_idx = top_idx // vocab
        token_idx = top_idx % vocab

        cand_seqs = _gather_beams(running_seqs, beam_idx, batch)
        cand_seqs = cand_seqs.at[:, :, i].set(token_idx)

        is_eos = token_idx == eos_token_id

        # update finished set with EOS candidates
        eos_norm_scores = jnp.where(
            is_eos, top_scores / ((i + 1).astype(jnp.float32) ** length_penalty),
            NEG_INF)
        merged_seqs = jnp.concatenate([finished_seqs, cand_seqs], axis=1)
        merged_scores = jnp.concatenate([finished_scores, eos_norm_scores], axis=1)
        merged_flags = jnp.concatenate(
            [finished_flags, is_eos], axis=1)
        top_fin_scores, top_fin_idx = jax.lax.top_k(merged_scores, K)
        finished_seqs = _gather_beams(merged_seqs, top_fin_idx, batch)
        finished_scores = top_fin_scores
        finished_flags = _gather_beams(merged_flags, top_fin_idx, batch)

        # pick top-K non-EOS continuations as the new running set
        non_eos_scores = jnp.where(is_eos, NEG_INF, top_scores)
        new_scores, keep_idx = jax.lax.top_k(non_eos_scores, K)
        running_scores = new_scores
        running_seqs = _gather_beams(cand_seqs, keep_idx, batch)
        new_tokens = _gather_beams(token_idx, keep_idx, batch)
        src_beams = _gather_beams(beam_idx, keep_idx, batch)  # [B, K]

        # reorder cache to follow surviving beams. Cross-attention KV is
        # identical across the beams of one example (it only depends on the
        # encoder output), so skip it — reordering those multi-GB buffers
        # every step dominates decode time otherwise.
        flat_src = (jnp.arange(batch)[:, None] * K + src_beams).reshape(-1)

        if fns.reorder_cache is not None:
            cache = fns.reorder_cache(cache, flat_src)
        else:
            cache = reorder_beam_cache(cache, flat_src)

        return (i + 1, running_seqs, running_scores, finished_seqs,
                finished_scores, finished_flags, new_tokens, cache)

    state = (jnp.array(0), running_seqs, running_scores, finished_seqs,
             finished_scores, finished_flags, tokens, cache)
    state = jax.lax.while_loop(not_done, body, state)
    (_, running_seqs, running_scores, finished_seqs, finished_scores,
     finished_flags, _, _) = state

    # fall back to best running beam if nothing finished
    none_finished = ~jnp.any(finished_flags, axis=1)
    norm_running = running_scores / (max_length ** length_penalty)
    best_running = jnp.argmax(norm_running, axis=1)
    best_finished = jnp.argmax(finished_scores, axis=1)
    best_idx = jnp.where(none_finished, best_running, best_finished)
    pick = lambda seqs: jax.vmap(lambda s, k: s[k])(seqs, best_idx)
    out = jnp.where(none_finished[:, None], pick(running_seqs), pick(finished_seqs))
    return out
