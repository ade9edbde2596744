"""Chunked Whisper transcription on TPU -> {text[], start[], end[]} pickles.

The JAX counterpart of asr_extract/whisper_inference.py: 30-second windows
are mel-transformed (factory.audio), batch-encoded, decoded under jit with
the KV cache, and segmented by Whisper's timestamp tokens (``<|t|>`` ids >=
timestamp_begin, 0.02 s per step); the window then seeks to the last closed
timestamp, reproducing openai-whisper's long-form loop.

The reference relies on openai-whisper's default decode options
(asr_extract/whisper_inference.py:48 calls ``model.transcribe`` bare), so
the robustness ladder is reproduced here: greedy first, then temperature
fallback (0.2 .. 1.0) whenever the output compresses too well
(gzip ratio > 2.4, a repetition-loop detector) or scores too low
(avg logprob < -1.0), and silent-window skipping via the ``<|nospeech|>``
probability captured at the SOT step. One jitted program serves every
temperature: sampling vs argmax is a traced select, so the fallback ladder
costs zero recompiles.

Token -> text detokenization needs Whisper's BPE vocab (a data file); pass
any callable (e.g. a HF tokenizer's ``decode``) as ``decode_tokens``. Without
one, segments carry raw token ids (ASR pipelines that only need timing —
e.g. chapter-span alignment — still work).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from vidchapters_tpu.factory.audio import (
    HOP_LENGTH,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
)

# multilingual whisper special token ids
SOT = 50258
TRANSCRIBE = 50359
NO_TIMESTAMPS = 50363
TIMESTAMP_BEGIN = 50364
EOT = 50257
LANG_EN = 50259
NO_SPEECH = 50362
SOT_PREV = 50361  # <|startofprev|>: prefixes the rolling text prompt
TIME_PRECISION = 0.02

# the 99 contiguous language tokens <|en|>..<|su|> of the multilingual v2
# vocab, in token order (published Whisper constants; the reference factory
# relies on openai-whisper's identical table via ``model.transcribe``,
# asr_extract/whisper_inference.py:48, and whisper_align.py:30-41 groups
# the ASR pickles by the detected ``language`` code)
LANG_BEGIN = LANG_EN
WHISPER_LANGUAGES: Tuple[str, ...] = (
    'en', 'zh', 'de', 'es', 'ru', 'ko', 'fr', 'ja', 'pt', 'tr', 'pl', 'ca',
    'nl', 'ar', 'sv', 'it', 'id', 'hi', 'fi', 'vi', 'he', 'uk', 'el', 'ms',
    'cs', 'ro', 'da', 'hu', 'ta', 'no', 'th', 'ur', 'hr', 'bg', 'lt', 'la',
    'mi', 'ml', 'cy', 'sk', 'te', 'fa', 'lv', 'bn', 'sr', 'az', 'sl', 'kn',
    'et', 'mk', 'br', 'eu', 'is', 'hy', 'ne', 'mn', 'bs', 'kk', 'sq', 'sw',
    'gl', 'mr', 'pa', 'si', 'km', 'sn', 'yo', 'so', 'af', 'oc', 'ka', 'be',
    'tg', 'sd', 'gu', 'am', 'yi', 'lo', 'uz', 'fo', 'ht', 'ps', 'tk', 'nn',
    'mt', 'sa', 'lb', 'my', 'bo', 'tl', 'mg', 'as', 'tt', 'haw', 'ln', 'ha',
    'ba', 'jw', 'su')


def language_token_for(code: str) -> int:
    """'en' -> 50259 etc.; raises on unknown codes."""
    try:
        return LANG_BEGIN + WHISPER_LANGUAGES.index(code.lower())
    except ValueError:
        raise ValueError(f"unknown Whisper language code {code!r}") from None


def language_code_for(token: int) -> str:
    """50259 -> 'en' etc.; raises on out-of-range tokens."""
    idx = token - LANG_BEGIN
    if not 0 <= idx < len(WHISPER_LANGUAGES):
        raise ValueError(f"token {token} is not a Whisper language token")
    return WHISPER_LANGUAGES[idx]


# Cross-layer decode megakernel routing: None = auto (TPU backends only).
# MEGA_INTERPRET runs the kernel in interpret mode (tests on CPU).
USE_MEGA_DECODE = None
MEGA_INTERPRET = False


def _mega_enabled() -> bool:
    import jax

    if USE_MEGA_DECODE is not None:
        return USE_MEGA_DECODE
    return jax.default_backend() not in ("cpu", "gpu")


def compression_ratio(text: str) -> float:
    """Repetition detector: raw bytes / zlib bytes (whisper/utils.py)."""
    import zlib

    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def detect_language_from_logits(logits):
    """SOT-step logits [B, V] -> (language token [B], probability [B]):
    softmax restricted to the 99 language tokens, openai-whisper
    ``detect_language`` semantics (the reference factory's behavior via
    ``model.transcribe``, asr_extract/whisper_inference.py:48)."""
    import jax
    import jax.numpy as jnp

    vocab = logits.shape[-1]
    n_lang = max(0, min(LANG_BEGIN + len(WHISPER_LANGUAGES), vocab)
                 - LANG_BEGIN)
    lang = logits[:, LANG_BEGIN:LANG_BEGIN + n_lang].astype(jnp.float32)
    probs = jax.nn.softmax(lang, axis=-1)
    tok = (jnp.argmax(lang, axis=-1) + LANG_BEGIN).astype(jnp.int32)
    return tok, jnp.max(probs, axis=-1)


def apply_timestamp_rules(logits, state, is_first: bool,
                          max_initial_idx: Optional[int] = 50):
    """openai-whisper ``ApplyTimestampRules`` as a pure [N, V] f32 logits
    filter (whisper/decoding.py; the reference inherits these constraints
    through the bare ``model.transcribe``, whisper_inference.py:48):

    1. timestamps come in pairs — after a lone timestamp only a timestamp
       or EOT may follow; after a completed pair, no timestamp may;
    2. timestamps never decrease;
    3. the first sampled token is a timestamp, at most ``max_initial_idx``
       steps (0.02 s each) into the window;
    4. when the summed timestamp probability beats every text token, a
       timestamp is forced.

    ``state`` is ``(prev, prevprev, ts_last)`` int32 [N] vectors — see
    ``init_timestamp_state``/``update_timestamp_state``."""
    import jax
    import jax.numpy as jnp

    vocab = logits.shape[-1]
    ids = jnp.arange(vocab)
    is_ts = ids >= TIMESTAMP_BEGIN
    neg = jnp.float32(-1e9)
    prev, prevprev, ts_last = state
    last_ts = prev >= TIMESTAMP_BEGIN
    pen_ts = prevprev >= TIMESTAMP_BEGIN
    m = jnp.where((last_ts & pen_ts)[:, None] & is_ts[None], neg, 0.0)
    m += jnp.where((last_ts & ~pen_ts)[:, None] & ~is_ts[None]
                   & (ids[None] != EOT), neg, 0.0)
    floor = jnp.where(last_ts & ~pen_ts, ts_last, ts_last + 1)
    m += jnp.where(is_ts[None] & (ids[None] < floor[:, None]), neg, 0.0)
    if is_first:
        bad = ~is_ts
        if max_initial_idx is not None:
            bad = bad | (ids > TIMESTAMP_BEGIN + max_initial_idx)
        m += jnp.where(bad[None], neg, 0.0)
    logits = logits + m
    lp = jax.nn.log_softmax(logits, axis=-1)
    ts_lp = jax.nn.logsumexp(jnp.where(is_ts[None], lp, neg), axis=-1)
    txt_max = jnp.max(jnp.where(is_ts[None], neg, lp), axis=-1)
    force = ts_lp > txt_max
    return jnp.where(force[:, None] & ~is_ts[None], neg, logits)


def init_timestamp_state(n: int):
    """prev starts at the -1 sentinel (no token sampled yet: last_was_
    timestamp=False) and prevprev timestamp-like — openai-whisper treats a
    sampled sequence shorter than 2 as penultimate_was_timestamp=True, so
    the forced opening timestamp is followed by TEXT, not a pair-mate."""
    import jax.numpy as jnp

    return (jnp.full((n,), -1, jnp.int32),
            jnp.full((n,), TIMESTAMP_BEGIN, jnp.int32),
            jnp.full((n,), TIMESTAMP_BEGIN - 1, jnp.int32))


def update_timestamp_state(state, nxt):
    import jax.numpy as jnp

    prev, _, ts_last = state
    # a -1 sentinel prev means ``nxt`` is the FIRST sampled token: the next
    # step's penultimate check must still see len<2 => timestamp-like
    prevprev = jnp.where(prev < 0, TIMESTAMP_BEGIN, prev)
    return (nxt, prevprev, jnp.where(nxt >= TIMESTAMP_BEGIN, nxt, ts_last))


class JaxWhisperTranscriber:
    """``language=None`` (the default) auto-detects the spoken language per
    video from the first 30 s window — one decoder step at SOT restricted to
    the 99 language tokens, openai-whisper ``detect_language`` semantics —
    and every result dict carries the resolved ``language`` code, matching
    the reference's ASR pickle schema (whisper_align.py:30-41 groups on it).
    Pass ``language="en"`` (or ``language_token=<id>``) to pin it."""

    def __init__(self, model, params, max_decode_len: int = 224,
                 language: Optional[str] = None,
                 language_token: Optional[int] = None,
                 decode_tokens: Optional[Callable[[List[int]], str]] = None,
                 temperatures: Tuple[float, ...] = (0.0, 0.2, 0.4, 0.6,
                                                    0.8, 1.0),
                 compression_ratio_threshold: Optional[float] = 2.4,
                 logprob_threshold: Optional[float] = -1.0,
                 no_speech_threshold: Optional[float] = 0.6,
                 condition_on_previous_text: bool = False,
                 prompt_len: int = 64,
                 prompt_reset_on_temperature: float = 0.5,
                 seed: int = 0,
                 param_dtype: Optional[str] = None,
                 beam_size: Optional[int] = None,
                 vad: bool = False,
                 timestamp_rules: bool = True,
                 max_initial_timestamp: Optional[float] = 1.0):
        import jax
        import jax.numpy as jnp

        from vidchapters_tpu.ops.decoding import (
            make_decode_fns,
            reorder_beam_cache,
        )

        if param_dtype is not None:
            # bf16 params halve the dominant cost of large-v2 decode: the
            # ~3.6 GB/step stream of f32 decoder weights (BENCH_NOTES.md
            # "ASR factory").  Flax Dense without an explicit dtype
            # computes in the promoted params/input dtype, so this casts
            # the whole model's compute.  Standard inference practice;
            # openai-whisper itself defaults to fp16 on GPU
            # (whisper/transcribe.py decode_options fp16=True).
            dt = jnp.dtype(param_dtype)
            params = jax.tree_util.tree_map(
                lambda x: x.astype(dt)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
        self.model = model
        self.params = params
        self.max_decode_len = max_decode_len
        # VAD pre-pass (factory/vad.py): skip windows with no speech, the
        # role whisperx's pyannote segmentation plays in the reference's
        # --faster path (asr_extract/whisper_inference.py:28,43)
        self.use_vad = vad
        self.decode_tokens = decode_tokens
        self.temperatures = temperatures
        self.compression_ratio_threshold = compression_ratio_threshold
        self.logprob_threshold = logprob_threshold
        self.no_speech_threshold = no_speech_threshold
        # opt-in (openai-whisper defaults to True with a VARIABLE-length
        # prompt; here the window is STATIC — exactly 1 + prompt_len slots
        # left-filled with <|startofprev|> — so only two programs compile).
        # Early windows therefore see repeated <|startofprev|> padding the
        # real whisper never sees: a documented deviation, off by default.
        self.condition_on_previous_text = condition_on_previous_text
        self.prompt_len = prompt_len
        self.prompt_reset_on_temperature = prompt_reset_on_temperature
        self._rng = jax.random.PRNGKey(seed)
        if language is not None:
            language_token = language_token_for(language)
        # None -> auto-detect per video (openai-whisper transcribe.py:
        # language unset => detect_language on the first 30 s window)
        self.language_token = language_token
        # default SOT sequence for callers that poke it directly; the
        # decode paths build per-video sequences from the resolved token
        self.sot_sequence = [SOT, language_token if language_token is not None
                             else LANG_EN, TRANSCRIBE]

        self._encode = jax.jit(
            lambda p, mel: model.apply({"params": p}, mel, method=model.encode))

        if _mega_enabled():
            # cross-layer decode megakernel (ops/whisper_megakernel.py):
            # one Pallas program per step over all decoder layers instead
            # of the ~1000-HLO-op unrolled graph
            from vidchapters_tpu.ops.whisper_megakernel import (
                make_whisper_mega_fns,
            )

            fns = make_whisper_mega_fns(model.cfg, params, max_decode_len,
                                        interpret=MEGA_INTERPRET)
        else:
            fns = make_decode_fns(model, params, max_decode_len)
        # exposed so tests/benches can pin which decode route was built
        # (mega fns carry an in-kernel reorder_cache; standard fns None)
        self.decode_fns = fns

        # openai-whisper style suppression: never emit task/language/sot
        # control tokens or <|notimestamps|> mid-transcription
        vocab = getattr(model.cfg, "vocab_size", 51865)
        suppress = np.zeros(vocab, np.float32)
        for t in range(SOT, min(NO_TIMESTAMPS + 1, vocab)):
            suppress[t] = -1e9
        suppress_j = jnp.asarray(suppress)

        # language-ID program: one decoder step at SOT, softmax restricted
        # to the 99 language tokens — openai-whisper ``detect_language``,
        # the behavior the reference factory gets from ``model.transcribe``
        # (asr_extract/whisper_inference.py:48)
        n_lang = max(0, min(LANG_BEGIN + len(WHISPER_LANGUAGES), vocab)
                     - LANG_BEGIN)

        def _detect_fn(params, enc):
            b = enc.shape[0]
            cache = fns.init_cache(b, enc)
            logits, _ = fns.step(jnp.full((b,), SOT, jnp.int32), cache,
                                 jnp.asarray(0), None)
            return detect_language_from_logits(logits)

        self._detect = jax.jit(_detect_fn) if n_lang > 0 else None

        # decode-time timestamp rules (openai-whisper decoding.py
        # ApplyTimestampRules — inherited by the reference through the bare
        # ``model.transcribe``): a traced logits filter applied OUTSIDE the
        # step kernel, so greedy, beam, and both megakernel routes share it
        use_rules = bool(timestamp_rules) and vocab > TIMESTAMP_BEGIN
        self.timestamp_rules = use_rules
        max_initial_idx = (None if max_initial_timestamp is None
                           else int(round(max_initial_timestamp
                                          / TIME_PRECISION)))

        def _ts_rules(logits, state, is_first):
            return apply_timestamp_rules(logits, state, is_first,
                                         max_initial_idx)

        _ts_init = init_timestamp_state
        _ts_step = update_timestamp_state

        def _pick(logits, key, temperature, ts_state=None, is_first=False):
            """Greedy where temperature == 0, categorical otherwise — the
            temperature is a per-element [B] vector and the choice a traced
            select, so one compiled program serves the whole fallback ladder
            even when only some batch elements are retrying."""
            logits = logits + suppress_j
            if ts_state is not None:
                logits = _ts_rules(logits.astype(jnp.float32), ts_state,
                                   is_first)
            greedy = jnp.argmax(logits, axis=-1)
            sampled = jax.random.categorical(
                key, logits / jnp.maximum(temperature, 1e-6)[:, None],
                axis=-1)
            nxt = jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)
            logp = jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), nxt[:, None], -1)[:, 0]
            return nxt, logp

        def _prefix_scan(cache, tokens):
            # feed the forced prefix through the cache as a lax.scan: ONE
            # step-kernel instance in the program instead of p_len unrolled
            # copies (each unrolled megakernel instance is a separate
            # Mosaic compile at large-v2 scale; the unrolled form pushed
            # transcriber compiles past the remote-compile tunnel's
            # patience). Returns (cache, last-step logits f32, no_speech).
            batch, p_len = tokens.shape

            def body(carry, i):
                cache, no_speech, _ = carry
                logits, cache = fns.step(tokens[:, i], cache, i, None)
                logits = logits.astype(jnp.float32)
                # whisper DecodingTask: P(<|nospeech|>) at the SOT step —
                # SOT sits 3 from the end of the prefix ([..prompt..],
                # SOT, lang, task), with or without conditioning
                if NO_SPEECH < vocab:
                    ns = jax.nn.softmax(logits, axis=-1)[:, NO_SPEECH]
                    no_speech = jnp.where(i == p_len - 3, ns, no_speech)
                return (cache, no_speech, logits), ()

            init = (cache, jnp.zeros((batch,), jnp.float32),
                    jnp.zeros((batch, vocab), jnp.float32))
            (cache, no_speech, logits), _ = jax.lax.scan(
                body, init, jnp.arange(p_len))
            return cache, logits, no_speech

        def _decode(params, enc, prefix, temperature, rng):
            # run the forced prefix through the cache, then continue decoding;
            # returns (sequence, sum_logprob, n_generated, no_speech_prob)
            batch = enc.shape[0]
            cache = fns.init_cache(batch, enc)
            tokens = prefix  # [B, P]
            p_len = tokens.shape[1]
            cache, logits, no_speech = _prefix_scan(cache, tokens)
            ts0 = _ts_init(batch)
            cur, logp0 = _pick(logits, rng, temperature,
                               ts0 if use_rules else None, is_first=True)
            ts_state = _ts_step(ts0, cur)
            sum_lp = logp0
            n_tok = jnp.ones((batch,), jnp.float32)
            done0 = cur == EOT

            def body(carry, i):
                cur, cache, done, sum_lp, n_tok, ts_state = carry
                logits, cache = fns.step(cur, cache, p_len + i, None)
                nxt, logp = _pick(logits, jax.random.fold_in(rng, i),
                                  temperature,
                                  ts_state if use_rules else None)
                nxt = jnp.where(done, EOT, nxt)
                sum_lp = sum_lp + jnp.where(done, 0.0, logp)
                n_tok = n_tok + jnp.where(done, 0.0, 1.0)
                done = done | (nxt == EOT)
                ts_state = _ts_step(ts_state, nxt)
                return (nxt, cache, done, sum_lp, n_tok, ts_state), cur

            (last, _, _, sum_lp, n_tok, _), outs = jax.lax.scan(
                body, (cur, cache, done0, sum_lp, n_tok, ts_state),
                jnp.arange(max_decode_len - p_len - 1))
            gen = jnp.concatenate(
                [jnp.swapaxes(outs, 0, 1), last[:, None]], axis=1)
            seq = jnp.concatenate([tokens, gen], axis=1)
            return seq, sum_lp, n_tok, no_speech

        self._decode = jax.jit(_decode)
        self._jnp = jnp

        # static-shape beam search for the temperature-0 rung, matching the
        # faster-whisper default decode the reference's --faster factory
        # path runs (asr_extract/whisper_inference.py:28-29,40-43:
        # beam_size=5); higher-temperature retries stay on sampling, like
        # faster-whisper. Final beam ranking = average log-prob per token
        # (openai-whisper MaximumLikelihoodRanker with length_penalty=None).
        self.beam_size = beam_size
        NEG = -1e30

        def _beam_decode(params, enc, prefix):
            K = self.beam_size
            b = enc.shape[0]
            # both paths keep cross KV per-example: the standard path's
            # beams group over it in-layer (models/whisper.py
            # WhisperAttention grouped branch); the megakernel shares one
            # cross block per example inside the kernel (group=K), so the
            # multi-GB int8 cross streams once per example per step
            cache = fns.init_cache(b * K, enc)
            tok_k = jnp.repeat(prefix, K, axis=0)
            p_len = prefix.shape[1]
            cache, logits, ns_k = _prefix_scan(cache, tok_k)
            no_speech = ns_k.reshape(b, K)[:, 0]
            lg = (logits + suppress_j).astype(jnp.float32)
            if use_rules:
                lg = _ts_rules(lg, _ts_init(b * K), True)
            logp = jax.nn.log_softmax(lg, -1)
            first = logp.reshape(b, K, vocab)[:, 0]  # beams identical so far
            sum_lp, cur = jax.lax.top_k(first, K)  # [B, K]
            cur = cur.astype(jnp.int32)
            max_gen = max_decode_len - p_len
            seqbuf = jnp.zeros((b, K, max_gen), jnp.int32)
            seqbuf = seqbuf.at[:, :, 0].set(cur)
            done = cur == EOT
            n_tok = jnp.ones((b, K), jnp.float32)
            # per-beam timestamp-rule state ([B, K]; permuted with parents)
            ts_prev = cur
            ts_pen = jnp.full((b, K), TIMESTAMP_BEGIN, jnp.int32)
            ts_last = jnp.where(cur >= TIMESTAMP_BEGIN, cur,
                                TIMESTAMP_BEGIN - 1)
            # a finished beam persists as its own single EOT candidate
            eot_only = jnp.full((vocab,), NEG).at[EOT].set(0.0)

            def body(carry, i):
                (cur, cache, seqbuf, sum_lp, n_tok, done,
                 ts_prev, ts_pen, ts_last) = carry
                logits, cache = fns.step(cur.reshape(-1), cache,
                                         p_len + i, None)
                lg = (logits + suppress_j).astype(jnp.float32)
                if use_rules:
                    lg = _ts_rules(lg, (ts_prev.reshape(-1),
                                        ts_pen.reshape(-1),
                                        ts_last.reshape(-1)), False)
                logp = jax.nn.log_softmax(lg, -1).reshape(b, K, vocab)
                cand = jnp.where(done[..., None], eot_only[None, None], logp)
                flat = (sum_lp[..., None] + cand).reshape(b, K * vocab)
                top, idx = jax.lax.top_k(flat, K)
                parent = idx // vocab
                tok = (idx % vocab).astype(jnp.int32)
                flatsel = (jnp.arange(b)[:, None] * K + parent).reshape(-1)
                # beam-invariant leaves (the shared/repeated cross KV)
                # skip the gather — rules live in ops.decoding; the mega
                # path instead DEFERS the permutation into the next
                # step's kernel (fns.reorder_cache)
                cache = (fns.reorder_cache or reorder_beam_cache)(
                    cache, flatsel)
                seqbuf = jnp.take_along_axis(seqbuf, parent[..., None],
                                             axis=1)
                pdone = jnp.take_along_axis(done, parent, axis=1)
                pn = jnp.take_along_axis(n_tok, parent, axis=1)
                stored = jnp.where(pdone, EOT, tok)
                seqbuf = seqbuf.at[:, :, i + 1].set(stored)
                n_tok = pn + jnp.where(pdone, 0.0, 1.0)
                done = pdone | (tok == EOT)
                ts_pen = jnp.take_along_axis(ts_prev, parent, axis=1)
                ts_lastp = jnp.take_along_axis(ts_last, parent, axis=1)
                ts_prev = stored
                ts_last = jnp.where(stored >= TIMESTAMP_BEGIN, stored,
                                    ts_lastp)
                return (tok, cache, seqbuf, top, n_tok, done,
                        ts_prev, ts_pen, ts_last), ()

            (cur, cache, seqbuf, sum_lp, n_tok, done,
             *_ts), _ = jax.lax.scan(
                body, (cur, cache, seqbuf, sum_lp, n_tok, done,
                       ts_prev, ts_pen, ts_last),
                jnp.arange(max_gen - 1))
            score = sum_lp / jnp.maximum(n_tok, 1.0)
            best = jnp.argmax(score, axis=1)
            best_seq = jnp.take_along_axis(
                seqbuf, best[:, None, None], axis=1)[:, 0]
            seq = jnp.concatenate([tok_k.reshape(b, K, -1)[:, 0], best_seq],
                                  axis=1)
            bl = jnp.take_along_axis(sum_lp, best[:, None], 1)[:, 0]
            bn = jnp.take_along_axis(n_tok, best[:, None], 1)[:, 0]
            return seq, bl, bn, no_speech

        self._beam_decode = (jax.jit(_beam_decode)
                             if beam_size and beam_size > 1 else None)

    def _tokens_to_text(self, tokens: List[int]) -> str:
        text_toks = [t for t in tokens if t < TIMESTAMP_BEGIN]
        if self.decode_tokens is not None:
            return self.decode_tokens(text_toks)
        return " ".join(str(t) for t in text_toks)

    def _sot_sequence(self, lang_token: Optional[int]) -> List[int]:
        return [SOT, lang_token if lang_token is not None else LANG_EN,
                TRANSCRIBE]

    def detect_language(self, audio: np.ndarray) -> Tuple[str, float]:
        """Language of the first 30 s window -> (code, probability) —
        openai-whisper ``detect_language`` semantics (one decoder step at
        SOT, softmax over the 99 language tokens)."""
        code, prob, _ = self._detect_first_window(audio)
        return code, prob

    def _detect_first_window(self, audio: np.ndarray
                             ) -> Tuple[str, float, object]:
        """(code, probability, window-0 encoding) — the encoding is handed
        back so the first decode window can reuse it instead of running the
        encoder twice on the same audio."""
        if self._detect is None:
            raise ValueError(
                "model vocab has no language tokens (vocab_size <= "
                f"{LANG_BEGIN}); pin language=/language_token= instead")
        jnp = self._jnp
        mel = log_mel_spectrogram(np.asarray(audio)[:N_SAMPLES])
        enc = self._encode(self.params, jnp.asarray(mel[None]))
        tok, prob = self._detect(self.params, enc)
        return (language_code_for(int(np.asarray(tok)[0])),
                float(np.asarray(prob)[0]), enc)

    def _resolve_language(self, audio: np.ndarray) -> Tuple[int, object]:
        """(configured-or-detected language token, window-0 encoding).

        The encoding is non-None only when detection ran; callers reuse it
        for the first decode window (detection already paid that encoder
        pass)."""
        if self.language_token is not None:
            return self.language_token, None
        if self._detect is None:  # tiny test vocab without language tokens
            return LANG_EN, None
        code, _, enc = self._detect_first_window(audio)
        return language_token_for(code), enc

    def _prompt_prefix(self, prompt_tokens: Optional[List[int]],
                       lang_token: Optional[int] = None) -> List[int]:
        """Static-length decode prefix: without conditioning just the SOT
        sequence; with it, exactly ``1 + prompt_len`` <|startofprev|>-filled
        slots holding the most recent transcript tokens, then the SOT
        sequence (two compiled programs total)."""
        sot = self._sot_sequence(lang_token if lang_token is not None
                                 else self.language_token)
        if not self.condition_on_previous_text:
            return sot
        slots = [SOT_PREV] * (1 + self.prompt_len)
        tail = list(prompt_tokens or [])[-self.prompt_len:]
        if tail:
            slots[-len(tail):] = tail
        return slots + sot

    def _decode_window(self, mel: Optional[np.ndarray], window_index: int = 0,
                       prompt_tokens: Optional[List[int]] = None,
                       lang_token: Optional[int] = None,
                       enc: Optional[object] = None
                       ) -> Tuple[List[int], float, float, float]:
        """Temperature-fallback decode of one 30 s window
        (openai-whisper ``transcribe`` decode_with_fallback).

        ``enc`` short-circuits the encoder (language detection already
        encoded window 0). Returns (tokens, avg_logprob, no_speech_prob,
        accepted_temp)."""
        import jax

        jnp = self._jnp
        if enc is None:
            enc = self._encode(self.params, jnp.asarray(mel[None]))
        prefix_list = self._prompt_prefix(prompt_tokens, lang_token)
        prefix = jnp.asarray(np.asarray([prefix_list], np.int32))
        toks: List[int] = []
        avg_lp, no_speech = 0.0, 0.0
        temp = 0.0
        for ti, temp in enumerate(self.temperatures):
            key = jax.random.fold_in(self._rng, window_index * 131 + ti)
            if temp == 0.0 and self._beam_decode is not None:
                seq, sum_lp, n_tok, nsp = self._beam_decode(
                    self.params, enc, prefix)
            else:
                seq, sum_lp, n_tok, nsp = self._decode(
                    self.params, enc, prefix,
                    jnp.full((1,), temp, jnp.float32), key)
            seq = np.asarray(seq)[0]
            toks = []
            for t in seq[len(prefix_list):]:
                if t == EOT:
                    break
                toks.append(int(t))
            avg_lp = float(sum_lp[0]) / float(n_tok[0])
            no_speech = float(nsp[0])
            needs_fallback = False
            if (self.compression_ratio_threshold is not None
                    and compression_ratio(self._tokens_to_text(toks))
                    > self.compression_ratio_threshold):
                needs_fallback = True  # repetition loop
            if (self.logprob_threshold is not None
                    and avg_lp < self.logprob_threshold):
                needs_fallback = True  # low confidence
            if not needs_fallback:
                break
        return toks, avg_lp, no_speech, temp

    def _segments_from_tokens(self, tokens: List[int], offset: float
                              ) -> Tuple[List[dict], float]:
        """Split on timestamp-token pairs; returns (segments, seek_advance)."""
        segments = []
        cur_start = None
        cur_tokens: List[int] = []
        last_ts = 0.0
        for t in tokens:
            if t >= TIMESTAMP_BEGIN:
                ts = (t - TIMESTAMP_BEGIN) * TIME_PRECISION
                if cur_start is None:
                    cur_start = ts
                else:
                    if cur_tokens:
                        segments.append({
                            "tokens": cur_tokens,
                            "start": offset + cur_start,
                            "end": offset + ts,
                        })
                    last_ts = ts
                    cur_start = None
                    cur_tokens = []
            elif cur_start is not None:
                cur_tokens.append(t)
        if cur_start is not None and cur_tokens:  # unclosed final segment
            segments.append({"tokens": cur_tokens,
                             "start": offset + cur_start,
                             "end": offset + 30.0})
            last_ts = 30.0
        advance = last_ts if last_ts > 0 else 30.0
        return segments, advance

    def transcribe(self, audio: np.ndarray) -> Dict[str, list]:
        """mono float32 16 kHz audio ->
        ``{text[], start[], end[], language}`` — the ``language`` code is
        detected from the first window when the transcriber was built with
        ``language=None``, matching the reference's per-video ASR pickle
        schema (whisper_inference.py:48 stores ``model.transcribe``'s
        result, whose ``language`` key whisper_align.py:30-41 groups on)."""
        lang_token, enc0 = self._resolve_language(audio)
        segments: List[dict] = []
        seek = 0
        window_index = 0
        prompt: List[int] = []  # rolling committed text (conditioning only)
        vad_segs = None
        if self.use_vad:
            from vidchapters_tpu.factory.vad import (
                next_voiced_seek,
                speech_segments,
            )

            vad_segs = speech_segments(audio)
        while seek < len(audio):
            if vad_segs is not None:
                seek = next_voiced_seek(vad_segs, seek, N_SAMPLES,
                                        len(audio))
                if seek >= len(audio):
                    break
            window = audio[seek: seek + N_SAMPLES]
            if len(window) < SAMPLE_RATE // 2:
                break
            # window 0 was already encoded by language detection
            reuse = enc0 if seek == 0 else None
            mel = log_mel_spectrogram(window) if reuse is None else None
            tokens, avg_lp, no_speech, temp = self._decode_window(
                mel, window_index, prompt_tokens=prompt,
                lang_token=lang_token, enc=reuse)
            window_index += 1
            # whisper transcribe.py: silent window unless the logprob says
            # there is actually confident content
            if (self.no_speech_threshold is not None
                    and no_speech > self.no_speech_threshold
                    and not (self.logprob_threshold is not None
                             and avg_lp > self.logprob_threshold)):
                seek += N_SAMPLES
                continue
            segs, advance = self._segments_from_tokens(
                tokens, offset=seek / SAMPLE_RATE)
            segments.extend(segs)
            if self.condition_on_previous_text:
                if temp > self.prompt_reset_on_temperature:
                    prompt = []  # whisper: high-temp output is not trusted
                else:
                    for seg in segs:
                        prompt.extend(seg["tokens"])
                    prompt = prompt[-self.prompt_len:]
            seek += int(advance * SAMPLE_RATE)
            if advance <= 0:
                break
        out = {"text": [], "start": [], "end": [],
               "language": self._lang_code(lang_token)}
        for seg in segments:
            text = (self.decode_tokens(seg["tokens"])
                    if self.decode_tokens is not None
                    else " ".join(str(t) for t in seg["tokens"]))
            out["text"].append(text.strip())
            out["start"].append(float(seg["start"]))
            out["end"].append(float(seg["end"]))
        return out

    @staticmethod
    def _lang_code(lang_token: int) -> str:
        try:
            return language_code_for(lang_token)
        except ValueError:  # non-standard token pinned by the caller
            return "en"


    # -- batched multi-video transcription -----------------------------------

    def _gate(self, toks: List[int], avg_lp: float) -> bool:
        """True when the decode needs a higher-temperature retry."""
        if (self.compression_ratio_threshold is not None
                and compression_ratio(self._tokens_to_text(toks))
                > self.compression_ratio_threshold):
            return True
        return (self.logprob_threshold is not None
                and avg_lp < self.logprob_threshold)

    def transcribe_batch(self, audios: List[np.ndarray]) -> List[Dict[str, list]]:
        """Lockstep batched long-form transcription of several videos.

        All unfinished videos' current 30 s windows decode as ONE batch on
        the chip each iteration (the production-throughput path for the
        900k-video ASR sweep the reference shards per GPU,
        asr_extract/whisper_inference.py). Per-element temperatures mean a
        fallback retry for one video re-decodes the batch but only raises
        that video's temperature; accepted elements keep their first
        passing result. Per-video seek/skip semantics match ``transcribe``.
        """
        import jax

        jnp = self._jnp
        n = len(audios)
        if n == 0:
            return []
        seeks = [0] * n
        all_segments: List[List[dict]] = [[] for _ in range(n)]
        window_index = 0
        # per-video language: configured, or ONE batched detect call over
        # every video's first window (whisper_inference.py:48 semantics)
        enc0 = None
        if self.language_token is not None or self._detect is None:
            lang_tokens = [self.language_token
                           if self.language_token is not None else LANG_EN
                           ] * n
        else:
            first_mels = np.stack([
                log_mel_spectrogram(np.asarray(a)[:N_SAMPLES])
                for a in audios])
            enc0 = self._encode(self.params, jnp.asarray(first_mels))
            toks, _ = self._detect(self.params, enc0)
            lang_tokens = [int(t) for t in np.asarray(toks)]
        prefix = jnp.asarray(np.asarray(
            [self._sot_sequence(lt) for lt in lang_tokens], np.int32))
        vad_segs = None
        if self.use_vad:
            from vidchapters_tpu.factory.vad import (
                next_voiced_seek,
                speech_segments,
            )

            vad_segs = [speech_segments(a) for a in audios]

        def active(i):
            return (seeks[i] < len(audios[i])
                    and len(audios[i]) - seeks[i] >= SAMPLE_RATE // 2)

        while True:
            if vad_segs is not None:
                for i in range(n):
                    if seeks[i] < len(audios[i]):
                        seeks[i] = next_voiced_seek(
                            vad_segs[i], seeks[i], N_SAMPLES,
                            len(audios[i]))
            if not any(active(i) for i in range(n)):
                break
            if enc0 is not None and window_index == 0 and not any(seeks):
                # detection already encoded every video's window 0 (rows
                # for inactive too-short videos differ but are never read)
                enc = enc0
            else:
                mels = np.stack([
                    log_mel_spectrogram(
                        audios[i][seeks[i]:seeks[i] + N_SAMPLES])
                    if active(i) else np.zeros(
                        (80, N_SAMPLES // HOP_LENGTH), np.float32)
                    for i in range(n)])
                enc = self._encode(self.params, jnp.asarray(mels))
            temps = np.zeros(n, np.float32)
            accepted: List[Optional[tuple]] = [None] * n
            for ti in range(len(self.temperatures)):
                key = jax.random.fold_in(self._rng, window_index * 131 + ti)
                if (self._beam_decode is not None
                        and not np.any(temps > 0)):  # first (temp-0) rung
                    seq, sum_lp, n_tok, nsp = self._beam_decode(
                        self.params, enc, prefix)
                else:
                    seq, sum_lp, n_tok, nsp = self._decode(
                        self.params, enc, prefix, jnp.asarray(temps), key)
                seq = np.asarray(seq)
                sum_lp, n_tok, nsp = (np.asarray(sum_lp), np.asarray(n_tok),
                                      np.asarray(nsp))
                retry = False
                for i in range(n):
                    if accepted[i] is not None or not active(i):
                        continue
                    toks = []
                    for t in seq[i, prefix.shape[1]:]:
                        if t == EOT:
                            break
                        toks.append(int(t))
                    avg = float(sum_lp[i]) / float(n_tok[i])
                    if (not self._gate(toks, avg)
                            or self.temperatures[ti] == self.temperatures[-1]):
                        accepted[i] = (toks, avg, float(nsp[i]))
                    else:
                        nxt = self.temperatures[
                            min(ti + 1, len(self.temperatures) - 1)]
                        temps[i] = nxt
                        retry = True
                if not retry:
                    break
            window_index += 1
            for i in range(n):
                if not active(i):
                    continue
                toks, avg_lp, no_speech = accepted[i]
                if (self.no_speech_threshold is not None
                        and no_speech > self.no_speech_threshold
                        and not (self.logprob_threshold is not None
                                 and avg_lp > self.logprob_threshold)):
                    seeks[i] += N_SAMPLES
                    continue
                segs, advance = self._segments_from_tokens(
                    toks, offset=seeks[i] / SAMPLE_RATE)
                all_segments[i].extend(segs)
                seeks[i] += int(advance * SAMPLE_RATE) if advance > 0 \
                    else N_SAMPLES

        outs = []
        for i, segments in enumerate(all_segments):
            out = {"text": [], "start": [], "end": [],
                   "language": self._lang_code(lang_tokens[i])}
            for seg in segments:
                out["text"].append(self._tokens_to_text(seg["tokens"]).strip())
                out["start"].append(float(seg["start"]))
                out["end"].append(float(seg["end"]))
            outs.append(out)
        return outs
