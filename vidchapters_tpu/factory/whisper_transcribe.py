"""Chunked Whisper transcription on TPU -> {text[], start[], end[]} pickles.

The JAX counterpart of asr_extract/whisper_inference.py: 30-second windows
are mel-transformed (factory.audio), batch-encoded, greedily decoded under
jit with the KV cache, and segmented by Whisper's timestamp tokens
(``<|t|>`` ids >= timestamp_begin, 0.02 s per step); the window then seeks
to the last closed timestamp, reproducing openai-whisper's long-form loop.

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
TIME_PRECISION = 0.02


class JaxWhisperTranscriber:
    def __init__(self, model, params, max_decode_len: int = 224,
                 language_token: int = LANG_EN,
                 decode_tokens: Optional[Callable[[List[int]], str]] = None):
        import jax
        import jax.numpy as jnp

        from vidchapters_tpu.ops.decoding import make_decode_fns

        self.model = model
        self.params = params
        self.max_decode_len = max_decode_len
        self.decode_tokens = decode_tokens
        self.sot_sequence = [SOT, language_token, TRANSCRIBE]

        self._encode = jax.jit(
            lambda p, mel: model.apply({"params": p}, mel, method=model.encode))

        fns = make_decode_fns(model, params, max_decode_len)

        # openai-whisper style suppression: never emit task/language/sot
        # control tokens or <|notimestamps|> mid-transcription
        vocab = getattr(model.cfg, "vocab_size", 51865)
        suppress = np.zeros(vocab, np.float32)
        for t in range(SOT, min(NO_TIMESTAMPS + 1, vocab)):
            suppress[t] = -1e9
        suppress_j = jnp.asarray(suppress)

        def _decode(params, enc, prefix):
            # run the forced prefix through the cache, then greedy-continue
            batch = enc.shape[0]
            cache = fns.init_cache(batch, enc)
            tokens = prefix  # [B, P]
            p_len = tokens.shape[1]
            for i in range(p_len):
                logits, cache = fns.step(tokens[:, i], cache, jnp.asarray(i),
                                         None)
            seqs = [tokens]
            cur = jnp.argmax(logits + suppress_j, axis=-1).astype(jnp.int32)

            def body(carry, i):
                cur, cache, done = carry
                logits, cache = fns.step(cur, cache, p_len + i, None)
                logits = logits + suppress_j
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                nxt = jnp.where(done, EOT, nxt)
                done = done | (nxt == EOT)
                return (nxt, cache, done), cur

            (last, _, _), outs = jax.lax.scan(
                body, (cur, cache, cur == EOT),
                jnp.arange(max_decode_len - p_len - 1))
            gen = jnp.concatenate(
                [jnp.swapaxes(outs, 0, 1), last[:, None]], axis=1)
            return jnp.concatenate([tokens, gen], axis=1)

        self._decode = jax.jit(_decode)
        self._jnp = jnp

    def _decode_window(self, mel: np.ndarray) -> List[int]:
        jnp = self._jnp
        enc = self._encode(self.params, jnp.asarray(mel[None]))
        prefix = jnp.asarray(np.asarray([self.sot_sequence], np.int32))
        seq = np.asarray(self._decode(self.params, enc, prefix))[0]
        toks = []
        for t in seq[len(self.sot_sequence):]:
            if t == EOT:
                break
            toks.append(int(t))
        return toks

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
        """mono float32 16 kHz audio -> ``{text[], start[], end[]}``."""
        segments: List[dict] = []
        seek = 0
        while seek < len(audio):
            window = audio[seek: seek + N_SAMPLES]
            if len(window) < SAMPLE_RATE // 2:
                break
            mel = log_mel_spectrogram(window)
            tokens = self._decode_window(mel)
            segs, advance = self._segments_from_tokens(
                tokens, offset=seek / SAMPLE_RATE)
            segments.extend(segs)
            seek += int(advance * SAMPLE_RATE)
            if advance <= 0:
                break
        out = {"text": [], "start": [], "end": []}
        for seg in segments:
            text = (self.decode_tokens(seg["tokens"])
                    if self.decode_tokens is not None
                    else " ".join(str(t) for t in seg["tokens"]))
            out["text"].append(text.strip())
            out["start"].append(float(seg["start"]))
            out["end"].append(float(seg["end"]))
        return out
