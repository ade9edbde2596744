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


def _words_from_times(token_words: Sequence[str], starts: np.ndarray,
                      ends: np.ndarray) -> List[Dict]:
    words: List[Dict] = []
    for i, word in enumerate(token_words):
        if word == "" and words:  # continuation token extends previous word
            words[-1]["end"] = float(ends[i])
        elif word:
            words.append({"word": word, "start": float(starts[i]),
                          "end": float(ends[i])})
    return words


def align_words_batch(model, params, mels: Sequence[np.ndarray],
                      token_ids_list: Sequence[Sequence[int]],
                      token_words_list: Sequence[Sequence[str]],
                      audio_seconds_list: Sequence[float],
                      prefix_ids: Sequence[int] = (),
                      ) -> List[List[Dict]]:
    """Teacher-force every segment in ONE encoder + ONE decoder call.

    Mels are zero-padded to a common frame count and token sequences to a
    common length (trailing pad rows and frames beyond each segment's real
    audio are sliced off the attention maps before the DTW), so aligning a
    long video costs one batched forward instead of one per segment.
    ``prefix_ids`` (e.g. Whisper's [SOT, lang, task, <|notimestamps|>])
    are teacher-forced ahead of the text so a pretrained decoder sees its
    training-time input distribution — openai-whisper's find_alignment
    does the same and strips the prefix rows; without it the decoder runs
    out-of-distribution and the cross-attention maps degrade.
    ``token_words[i]`` is the text of token i ("" merges it with the
    previous word, e.g. BPE continuations). Returns one [{word, start,
    end}] list per segment.
    """
    import jax.numpy as jnp

    assert len(mels) == len(token_ids_list) == len(audio_seconds_list)
    if not mels:
        return []
    p = len(prefix_ids)
    lens = [len(ids) for ids in token_ids_list]
    max_tok = p + max(lens)
    tok_rows = []
    for ids in token_ids_list:
        row = list(prefix_ids) + list(ids)
        tok_rows.append(row + [0] * (max_tok - len(row)))
    max_frames = max(m.shape[-1] for m in mels)
    mel_rows = [np.pad(m, ((0, 0), (0, max_frames - m.shape[-1])))
                for m in mels]
    tokens = jnp.asarray(np.asarray(tok_rows, np.int32))
    enc = model.apply({"params": params},
                      jnp.asarray(np.stack(mel_rows)), method=model.encode)
    _, inter = model.apply({"params": params}, tokens, enc,
                           method=lambda m, t, e: m.decoder(t, e),
                           mutable=["intermediates"])
    # collect decoder cross-attention maps: decoder/layer_i/cross_attn
    maps = []
    dec = inter["intermediates"]["decoder"]
    for key in sorted(dec, key=lambda k: int(k.split("_")[1])):
        if "cross_attn" in dec[key]:
            maps.append(np.asarray(dec[key]["cross_attn"]["attn_probs"][0]))
    cross_all = np.stack(maps, axis=1)  # [B, layers, heads, T_tok, T_aud]

    out: List[List[Dict]] = []
    for b, (n_tok, words, secs) in enumerate(
            zip(lens, token_words_list, audio_seconds_list)):
        cross = cross_all[b][:, :, p:p + n_tok]  # strip prefix + pad rows
        n_frames = int(min(cross.shape[-1], secs / TIME_PER_FRAME))
        if n_tok == 0 or n_frames < 1:  # empty text or no real audio
            out.append([])
            continue
        starts, ends = token_times_from_attention(cross, n_frames)
        out.append(_words_from_times(words, starts, ends))
    return out


def align_words(model, params, mel: np.ndarray, token_ids: Sequence[int],
                token_words: Sequence[str], audio_seconds: float,
                prefix_ids: Sequence[int] = ()) -> List[Dict]:
    """Single-segment wrapper over align_words_batch."""
    return align_words_batch(model, params, [mel], [token_ids],
                             [token_words], [audio_seconds],
                             prefix_ids=prefix_ids)[0]
