"""Cross-attention DTW word alignment."""

import numpy as np
import pytest

from vidchapters_tpu.factory.align import (
    align_words,
    dtw_path,
    median_filter,
    token_times_from_attention,
)


def test_median_filter():
    x = np.array([[0.0, 10.0, 0.0, 0.0, 0.0]])
    out = median_filter(x, 3)
    assert out[0, 1] == 0.0  # spike removed
    np.testing.assert_array_equal(median_filter(x, 1), x)


def test_dtw_diagonal():
    cost = np.ones((4, 4)) - np.eye(4)
    ti, ai = dtw_path(cost)
    # path visits every (i, i)
    diag = set(zip(ti.tolist(), ai.tolist()))
    assert all((i, i) in diag for i in range(4))


def test_dtw_monotonic():
    rng = np.random.default_rng(0)
    cost = rng.random((5, 12))
    ti, ai = dtw_path(cost)
    assert (np.diff(ti) >= 0).all()
    assert (np.diff(ai) >= 0).all()
    assert ti[0] == 0 and ti[-1] == 4
    assert ai[-1] == 11


def test_token_times_from_synthetic_attention():
    # 3 tokens attending to frames [0-9], [10-19], [20-29]
    layers, heads, n_tok, n_aud = 2, 2, 3, 30
    attn = np.full((layers, heads, n_tok, n_aud), 0.01)
    for t in range(3):
        attn[:, :, t, t * 10:(t + 1) * 10] = 1.0
    starts, ends = token_times_from_attention(attn, n_aud, filter_width=1)
    assert starts[0] == pytest.approx(0.0, abs=0.05)
    assert 0.15 <= starts[1] <= 0.25  # ~frame 10 * 0.02
    assert (np.diff(starts) >= 0).all()
    assert (ends >= starts).all()


@pytest.mark.slow
def test_align_words_end_to_end():
    import jax
    import jax.numpy as jnp

    from vidchapters_tpu.models.whisper import Whisper, WhisperConfig

    cfg = WhisperConfig(vocab_size=100, num_mel_bins=8, d_model=32,
                        encoder_layers=1, decoder_layers=2, num_heads=4,
                        d_ff=64, max_source_positions=50,
                        max_target_positions=16, dtype="float32")
    model = Whisper(cfg)
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(8, 100)).astype(np.float32)
    tokens = [5, 11, 12, 13, 1]
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(mel[None]),
                        jnp.asarray([tokens], jnp.int32))["params"]
    words = align_words(model, params, mel, tokens,
                        ["", "hello", "wor", "", "ld"], audio_seconds=1.0)
    assert [w["word"] for w in words] == ["hello", "wor", "ld"]
    for w in words:
        assert 0 <= w["start"] <= w["end"] <= 1.0 + 1e-6

    # teacher-forced prefix rows (whisper SOT sequence role) are stripped
    # before the DTW: same words, same bounds
    words_p = align_words(model, params, mel, tokens,
                          ["", "hello", "wor", "", "ld"], audio_seconds=1.0,
                          prefix_ids=(7, 8))
    assert [w["word"] for w in words_p] == ["hello", "wor", "ld"]
    for w in words_p:
        assert 0 <= w["start"] <= w["end"] <= 1.0 + 1e-6

    # zero real audio frames must not crash (whisper's trailing window can
    # place a segment start at/past the end of the audio)
    assert align_words(model, params, mel, tokens,
                       ["", "hello", "wor", "", "ld"],
                       audio_seconds=0.0) == []


@pytest.mark.slow
def test_demo_align_segments_schema():
    """demo_asr.align_segments: word timings per segment in the whisperx
    output schema (words per segment + flat word_segments), offsets
    anchored at each segment's start."""
    import jax
    import jax.numpy as jnp

    from vidchapters_tpu.demo.demo_asr import align_segments
    from vidchapters_tpu.factory.audio import SAMPLE_RATE
    from vidchapters_tpu.models.whisper import Whisper, WhisperConfig

    cfg = WhisperConfig(vocab_size=100, num_mel_bins=80, d_model=32,
                        encoder_layers=1, decoder_layers=2, num_heads=4,
                        d_ff=64, max_source_positions=1500,
                        max_target_positions=16, dtype="float32")
    model = Whisper(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 80, 3000), jnp.float32),
                        jnp.ones((1, 4), jnp.int32))["params"]

    class FakeTok:
        def encode(self, text, add_special_tokens=False):
            return [10 + i for i, _ in enumerate(text.split())]

        def decode(self, ids):
            return f" w{ids[0] - 10}"  # every token starts a word

    audio = np.random.default_rng(0).normal(
        size=(SAMPLE_RATE * 40,)).astype(np.float32) * 0.1
    segments = [{"text": "hello there world", "start": 2.0, "end": 6.0},
                {"text": "", "start": 31.0, "end": 33.0},
                {"text": "ghost words", "start": 45.0, "end": 47.0}]
    out = align_segments(model, params, FakeTok(), audio, segments)
    assert set(out) == {"segments", "word_segments"}
    words = out["segments"][0]["words"]
    assert [w["word"] for w in words] == ["w0", "w1", "w2"]
    # the alignment window is trimmed to the segment: every word timing
    # (incl. the LAST word, which complete DTW pins to the window's final
    # frame) stays inside [start, end], not [start, start + 30 s]
    for w in words:
        assert 2.0 <= w["start"] <= w["end"] <= 6.0 + 1e-6
    assert out["segments"][1]["words"] == []  # empty text
    # start past the end of the audio: skipped, not a crash
    assert out["segments"][2]["words"] == []
    assert out["word_segments"] == words
