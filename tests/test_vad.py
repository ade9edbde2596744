"""Energy VAD (factory/vad.py) + the transcriber's silent-window skipping.

The VAD plays the role whisperx's pyannote segmentation plays in the
reference's --faster ASR path (asr_extract/whisper_inference.py:28,43):
find speech so long silence is never mel-transformed or decoded.
"""

import numpy as np
import pytest

from vidchapters_tpu.factory.vad import (
    SAMPLE_RATE,
    next_voiced_seek,
    speech_segments,
)


def tone(seconds, freq=440.0, amp=0.3):
    t = np.arange(int(seconds * SAMPLE_RATE)) / SAMPLE_RATE
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def silence(seconds, noise=1e-5):
    n = int(seconds * SAMPLE_RATE)
    return (noise * np.random.default_rng(0).standard_normal(n)
            ).astype(np.float32)


def test_finds_speech_regions():
    audio = np.concatenate([silence(5), tone(3), silence(10), tone(2),
                            silence(4)])
    segs = speech_segments(audio)
    assert len(segs) == 2
    (a0, b0), (a1, b1) = segs
    assert abs(a0 / SAMPLE_RATE - 5.0) < 0.3
    assert abs(b0 / SAMPLE_RATE - 8.0) < 0.3
    assert abs(a1 / SAMPLE_RATE - 18.0) < 0.3
    assert abs(b1 / SAMPLE_RATE - 20.0) < 0.3


def test_wall_to_wall_speech_is_one_segment():
    """Fully-voiced audio (no silence for the adaptive floor to anchor on)
    must be ONE speech segment, not skipped — the threshold ceiling."""
    audio = tone(20)
    segs = speech_segments(audio)
    assert len(segs) == 1
    a, b = segs[0]
    assert a == 0 and b >= len(audio) - SAMPLE_RATE // 2


def test_all_silence_and_empty():
    assert speech_segments(silence(8)) == []
    assert speech_segments(np.zeros(0, np.float32)) == []
    assert speech_segments(np.zeros(1000, np.float32)) == []


def test_short_blips_dropped_gaps_bridged():
    audio = np.concatenate([
        silence(2), tone(0.05), silence(2),          # 50 ms blip: dropped
        tone(1), silence(0.2), tone(1), silence(2),  # 200 ms gap: bridged
    ])
    segs = speech_segments(audio)
    assert len(segs) == 1
    a, b = segs[0]
    assert abs(a / SAMPLE_RATE - 4.05) < 0.3
    assert abs(b / SAMPLE_RATE - 6.25) < 0.35


def test_next_voiced_seek():
    segs = [(100, 200), (1000, 1200)]
    w = 50
    assert next_voiced_seek(segs, 0, w, 2000) == 100   # skip to speech
    assert next_voiced_seek(segs, 120, w, 2000) == 120  # inside speech
    assert next_voiced_seek(segs, 190, w, 2000) == 190  # overlaps tail
    assert next_voiced_seek(segs, 300, w, 2000) == 1000
    assert next_voiced_seek(segs, 1500, w, 2000) == 2000  # no more speech
    assert next_voiced_seek([], 0, w, 2000) == 2000


@pytest.mark.slow
def test_transcriber_vad_skips_silent_windows(monkeypatch):
    """With VAD on, long silent stretches are never decoded: count the
    windows each mode processes on 5 s speech + 90 s silence + 5 s speech."""
    from tests.test_whisper_transcribe import _tiny_transcriber

    audio = np.concatenate([tone(5), silence(90), tone(5)])

    counts = {}
    for vad in (False, True):
        tr = _tiny_transcriber(temperatures=(0.0,), vad=vad)
        n_calls = 0
        orig = tr._decode_window

        def counting(mel, window_index=0, prompt_tokens=None, **kw):
            nonlocal n_calls
            n_calls += 1
            return orig(mel, window_index, prompt_tokens, **kw)

        tr._decode_window = counting
        tr.transcribe(audio)
        counts[vad] = n_calls
    # plain path walks all four 30 s windows; VAD decodes only the two
    # speech regions
    assert counts[False] >= 4
    assert counts[True] == 2


@pytest.mark.slow
def test_transcribe_batch_vad_skips_silence():
    """Batched lockstep transcription with VAD: device iterations cover
    only voiced windows (2 per video) instead of all four."""
    from tests.test_whisper_transcribe import _tiny_transcriber

    audio = np.concatenate([tone(5), silence(90), tone(5)])
    iters = {}
    for vad in (False, True):
        tr = _tiny_transcriber(temperatures=(0.0,), vad=vad)
        n_calls = 0
        orig = tr._encode

        def counting(params, mels):
            nonlocal n_calls
            n_calls += 1
            return orig(params, mels)

        tr._encode = counting
        outs = tr.transcribe_batch([audio, audio.copy()])
        assert len(outs) == 2
        iters[vad] = n_calls
    assert iters[False] >= 4
    assert iters[True] == 2
