"""Whisper transcription driver: timestamp segmentation + end-to-end on a
tiny random model (timing plumbing, not ASR quality)."""

import numpy as np
import pytest

import jax

from vidchapters_tpu.factory.whisper_transcribe import (
    EOT,
    TIMESTAMP_BEGIN,
    JaxWhisperTranscriber,
)
from vidchapters_tpu.models.whisper import Whisper, WhisperConfig


class _Dummy:
    """Segmentation-only harness (no model needed)."""

    _segments_from_tokens = JaxWhisperTranscriber._segments_from_tokens
    decode_tokens = None


def ts(seconds):
    return TIMESTAMP_BEGIN + int(round(seconds / 0.02))


def test_segments_from_tokens_pairs():
    d = _Dummy()
    tokens = [ts(0.0), 11, 12, ts(2.0), ts(2.0), 13, ts(5.0)]
    segs, advance = d._segments_from_tokens(tokens, offset=30.0)
    assert len(segs) == 2
    assert segs[0]["tokens"] == [11, 12]
    assert segs[0]["start"] == pytest.approx(30.0)
    assert segs[0]["end"] == pytest.approx(32.0)
    assert segs[1]["start"] == pytest.approx(32.0)
    assert segs[1]["end"] == pytest.approx(35.0)
    assert advance == pytest.approx(5.0)


def test_segments_unclosed_final():
    d = _Dummy()
    segs, advance = d._segments_from_tokens([ts(1.0), 7, 8], offset=0.0)
    assert len(segs) == 1
    assert segs[0]["end"] == pytest.approx(30.0)
    assert advance == pytest.approx(30.0)


def test_segments_empty():
    d = _Dummy()
    segs, advance = d._segments_from_tokens([], offset=0.0)
    assert segs == []
    assert advance == pytest.approx(30.0)


@pytest.mark.slow
def test_transcribe_end_to_end_tiny():
    cfg = WhisperConfig(vocab_size=TIMESTAMP_BEGIN + 1501, num_mel_bins=80,
                        d_model=32, encoder_layers=1, decoder_layers=1,
                        num_heads=4, d_ff=64, max_source_positions=1500,
                        max_target_positions=64, dtype="float32")
    model = Whisper(cfg)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    mel = jnp.zeros((1, 80, 3000), jnp.float32)
    toks = jnp.zeros((1, 4), jnp.int32)
    params = model.init({"params": rng}, mel, toks)["params"]

    tr = JaxWhisperTranscriber(model, params, max_decode_len=16)
    audio = np.zeros(16000 * 31, np.float32)  # ~1 chunk + a tail
    out = tr.transcribe(audio)
    assert set(out) == {"text", "start", "end"}
    # random model may emit no timestamp pairs; just require consistency
    assert len(out["text"]) == len(out["start"]) == len(out["end"])
