"""Word-level timestamp alignment from Whisper cross-attention (DTW).

The reference aligns ASR with whisperx's wav2vec2 forced aligner
(asr_extract/whisper_align.py:33-55). The TPU-native path here follows
openai-whisper's ``word_timestamps`` method instead: teacher-force the
transcription through the decoder, pool the decoder cross-attention maps
(``intermediates`` collection of models.whisper), median-filter along audio
time, run monotonic DTW over -attention, and read each token's audio frame
from the alignment path (0.02 s per encoder frame).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

TIME_PER_FRAME = 0.02


def median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis (odd width, edge padded)."""
    if width <= 1:
        return x
    pad = width // 2
    padded = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(padded, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW through a [T_tokens, T_audio] cost matrix; returns the
    (token_idx, audio_idx) path arrays."""
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    trace = np.zeros((n + 1, m + 1), np.int8)
    for i in range(1, n + 1):
        c_row = cost[i - 1]
        for j in range(1, m + 1):
            c0 = acc[i - 1, j - 1]
            c1 = acc[i - 1, j]
            c2 = acc[i, j - 1]
            if c0 <= c1 and c0 <= c2:
                acc[i, j] = c0 + c_row[j - 1]
                trace[i, j] = 0
            elif c1 <= c2:
                acc[i, j] = c1 + c_row[j - 1]
                trace[i, j] = 1
            else:
                acc[i, j] = c2 + c_row[j - 1]
                trace[i, j] = 2
    ti, ai = [], []
    i, j = n, m
    while i > 0 and j > 0:
        ti.append(i - 1)
        ai.append(j - 1)
        step = trace[i, j]
        if step == 0:
            i, j = i - 1, j - 1
        elif step == 1:
            i -= 1
        else:
            j -= 1
    return np.array(ti[::-1]), np.array(ai[::-1])


def token_times_from_attention(cross_attn: np.ndarray,
                               n_audio_frames: int,
                               filter_width: int = 7
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """cross_attn [layers, heads, T_tokens, T_audio] -> per-token
    (start_seconds, end_seconds)."""
    # pool heads/layers, normalize per token, smooth along audio time
    w = cross_attn[..., :n_audio_frames].mean(axis=(0, 1))  # [T_tok, T_aud]
    std = w.std(axis=-1, keepdims=True) + 1e-6
    w = (w - w.mean(axis=-1, keepdims=True)) / std
    w = median_filter(w, filter_width)
    ti, ai = dtw_path(-w)
    n_tok = cross_attn.shape[2]
    starts = np.zeros(n_tok)
    ends = np.zeros(n_tok)
    for t in range(n_tok):
        frames = ai[ti == t]
        if len(frames):
            starts[t] = frames.min() * TIME_PER_FRAME
            ends[t] = (frames.max() + 1) * TIME_PER_FRAME
        elif t > 0:
            starts[t] = ends[t - 1]
            ends[t] = ends[t - 1]
    # enforce monotonicity
    for t in range(1, n_tok):
        starts[t] = max(starts[t], starts[t - 1])
        ends[t] = max(ends[t], starts[t])
    return starts, ends


def align_words(model, params, mel: np.ndarray, token_ids: Sequence[int],
                token_words: Sequence[str], audio_seconds: float
                ) -> List[Dict]:
    """Teacher-force ``token_ids`` and produce word-level timings.

    ``token_words[i]`` is the text of token i ("" merges it with the previous
    word, e.g. BPE continuations). Returns [{word, start, end}].
    """
    import jax.numpy as jnp

    tokens = jnp.asarray(np.asarray(token_ids, np.int32)[None])
    enc = model.apply({"params": params}, jnp.asarray(mel[None]),
                      method=model.encode)
    _, inter = model.apply({"params": params}, tokens, enc,
                           method=lambda m, t, e: m.decoder(t, e),
                           mutable=["intermediates"])
    # collect decoder cross-attention maps: decoder/layer_i/cross_attn
    maps = []
    dec = inter["intermediates"]["decoder"]
    for key in sorted(dec, key=lambda k: int(k.split("_")[1])):
        if "cross_attn" in dec[key]:
            maps.append(np.asarray(dec[key]["cross_attn"]["attn_probs"][0][0]))
    cross = np.stack(maps)  # [layers, heads, T_tok, T_audio]
    n_frames = int(min(cross.shape[-1], audio_seconds / TIME_PER_FRAME))
    starts, ends = token_times_from_attention(cross, n_frames)

    words: List[Dict] = []
    for i, word in enumerate(token_words):
        if word == "" and words:  # continuation token extends previous word
            words[-1]["end"] = float(ends[i])
        elif word:
            words.append({"word": word, "start": float(starts[i]),
                          "end": float(ends[i])})
    return words
