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
    assert set(out) == {"text", "start", "end", "language"}
    # random model may emit no timestamp pairs; just require consistency
    assert len(out["text"]) == len(out["start"]) == len(out["end"])


def test_compression_ratio_flags_repetition():
    from vidchapters_tpu.factory.whisper_transcribe import compression_ratio

    assert compression_ratio("") == 0.0
    loopy = "the cat sat " * 60
    normal = "chapters are segments of a longer video with titles"
    assert compression_ratio(loopy) > 2.4
    assert compression_ratio(normal) < 2.4


def _tiny_transcriber(**kw):
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
    return JaxWhisperTranscriber(model, params, max_decode_len=12, **kw)


@pytest.mark.slow
def test_greedy_decode_deterministic_and_scored():
    tr = _tiny_transcriber(temperatures=(0.0,),
                           compression_ratio_threshold=None,
                           logprob_threshold=None)
    mel = np.zeros((80, 3000), np.float32)
    t1, lp1, nsp1, _ = tr._decode_window(mel, 0)
    t2, lp2, nsp2, _ = tr._decode_window(mel, 1)  # different rng, temp=0
    assert t1 == t2  # greedy ignores the key
    assert lp1 == pytest.approx(lp2)
    assert lp1 < 0.0  # a valid average logprob
    assert 0.0 <= nsp1 <= 1.0


@pytest.mark.slow
def test_temperature_fallback_runs_sampled_path():
    tr = _tiny_transcriber(temperatures=(1.0,),
                           compression_ratio_threshold=None,
                           logprob_threshold=None)
    mel = np.zeros((80, 3000), np.float32)
    ta, _, _, _ = tr._decode_window(mel, 0)
    tb, _, _, _ = tr._decode_window(mel, 0)  # same window index -> same key
    tc, _, _, _ = tr._decode_window(mel, 7)  # different key
    assert ta == tb  # sampling is keyed, hence reproducible
    assert isinstance(tc, list)


@pytest.mark.slow
def test_no_speech_windows_skipped():
    tr = _tiny_transcriber(temperatures=(0.0,),
                           compression_ratio_threshold=None,
                           logprob_threshold=None,
                           no_speech_threshold=-1.0)  # everything "silent"
    audio = np.zeros(16000 * 31, np.float32)
    out = tr.transcribe(audio)
    assert isinstance(out.pop("language"), str)  # random-weight detection
    assert out == {"text": [], "start": [], "end": []}


@pytest.mark.slow
def test_transcribe_batch_matches_single():
    tr = _tiny_transcriber(temperatures=(0.0,),
                           compression_ratio_threshold=None,
                           logprob_threshold=None,
                           no_speech_threshold=None)
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=16000 * 31) * 0.05).astype(np.float32)
    single = tr.transcribe(audio)
    [batched] = tr.transcribe_batch([audio])
    assert batched == single


@pytest.mark.slow
def test_transcribe_batch_multiple_lengths():
    tr = _tiny_transcriber(temperatures=(0.0, 1.0),
                           no_speech_threshold=None)
    rng = np.random.default_rng(1)
    audios = [(rng.normal(size=16000 * s) * 0.05).astype(np.float32)
              for s in (8, 35, 61)]
    outs = tr.transcribe_batch(audios)
    assert len(outs) == 3
    for out in outs:
        assert set(out) == {"text", "start", "end", "language"}
        assert len(out["text"]) == len(out["start"]) == len(out["end"])
    assert tr.transcribe_batch([]) == []


@pytest.mark.slow
def test_run_batched_asr(tmp_path):
    import pickle
    import wave

    from vidchapters_tpu.factory.asr import run_batched_asr

    tr = _tiny_transcriber(temperatures=(0.0,),
                           compression_ratio_threshold=None,
                           logprob_threshold=None, no_speech_threshold=None)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"vid{i}.wav"
        sig = (rng.normal(size=16000 * 4) * 0.05).astype(np.float32)
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((sig * 32767).astype(np.int16).tobytes())
        paths.append(str(p))
    out_dir = tmp_path / "asr"
    n = run_batched_asr(paths, str(out_dir), tr, batch_size=2)
    assert n == 3
    for i in range(3):
        result = pickle.load(open(out_dir / f"vid{i}.pkl", "rb"))
        assert set(result) == {"text", "start", "end", "language"}
    # idempotent: second sweep skips everything
    assert run_batched_asr(paths, str(out_dir), tr, batch_size=2) == 0


@pytest.mark.slow
def test_condition_on_previous_text():
    tr = _tiny_transcriber(temperatures=(0.0,),
                           compression_ratio_threshold=None,
                           logprob_threshold=None, no_speech_threshold=None,
                           condition_on_previous_text=True, prompt_len=8)
    # static prefix layout: 1 + prompt_len <|startofprev|> slots + SOT seq
    from vidchapters_tpu.factory.whisper_transcribe import SOT_PREV

    empty = tr._prompt_prefix(None)
    assert empty[:9] == [SOT_PREV] * 9 and empty[9:] == tr.sot_sequence
    filled = tr._prompt_prefix([101, 102, 103])
    assert filled[:6] == [SOT_PREV] * 6
    assert filled[6:9] == [101, 102, 103]
    assert filled[9:] == tr.sot_sequence
    long = tr._prompt_prefix(list(range(200, 220)))  # truncates to last 8
    assert long[1:9] == list(range(212, 220))
    # end-to-end: both programs compile and the result is well-formed
    audio = (np.random.default_rng(0).normal(size=16000 * 35) * 0.05
             ).astype(np.float32)
    out = tr.transcribe(audio)
    assert set(out) == {"text", "start", "end", "language"}


@pytest.mark.slow
def test_conditioning_off_is_default_and_unchanged():
    tr = _tiny_transcriber(temperatures=(0.0,),
                           compression_ratio_threshold=None,
                           logprob_threshold=None, no_speech_threshold=None)
    assert not tr.condition_on_previous_text
    audio = (np.random.default_rng(0).normal(size=16000 * 5) * 0.05
             ).astype(np.float32)
    out = tr.transcribe(audio)
    assert set(out) == {"text", "start", "end", "language"}


def test_transcribe_param_dtype_bfloat16():
    """param_dtype="bfloat16" (the throughput/memory option) transcribes
    end-to-end with the whole tree cast."""
    import jax.numpy as jnp

    cfg = WhisperConfig(vocab_size=TIMESTAMP_BEGIN + 1501, num_mel_bins=80,
                        d_model=32, encoder_layers=1, decoder_layers=1,
                        num_heads=4, d_ff=64, max_source_positions=1500,
                        max_target_positions=64, dtype="float32")
    model = Whisper(cfg)
    rng = jax.random.PRNGKey(0)
    mel = jnp.zeros((1, 80, 3000), jnp.float32)
    params = model.init({"params": rng}, mel,
                        jnp.zeros((1, 4), jnp.int32))["params"]
    tr = JaxWhisperTranscriber(model, params, max_decode_len=8,
                               param_dtype="bfloat16")
    leaves = jax.tree_util.tree_leaves(tr.params)
    assert all(leaf.dtype == jnp.bfloat16 for leaf in leaves)
    out = tr.transcribe(np.zeros(16000 * 5, np.float32))
    assert set(out) == {"text", "start", "end", "language"}


# ---------------------------------------------------------------------------
# beam decode (VERDICT r2 #6: the faster-whisper default path)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_beam_decode_finds_higher_likelihood_than_greedy():
    """Beam-5 must select a sequence whose average log-prob is >= greedy's
    on the same (random-weight) model — the defining property of beam
    search; also deterministic across calls."""
    import jax.numpy as jnp

    # timestamp rules off: this is a pure beam-search property test, and
    # the rules' length-dependent masking (avg-lp selection over forced
    # timestamp structure) breaks the unconstrained sum-lp dominance the
    # property relies on (rules-on decode structure is covered by
    # test_whisper_langid_rules.py)
    greedy = _tiny_transcriber(temperatures=(0.0,),
                               compression_ratio_threshold=None,
                               logprob_threshold=None,
                               timestamp_rules=False)
    beam = _tiny_transcriber(temperatures=(0.0,),
                             compression_ratio_threshold=None,
                             logprob_threshold=None, beam_size=5,
                             timestamp_rules=False)
    assert beam._beam_decode is not None and greedy._beam_decode is None
    mel = np.zeros((80, 3000), np.float32)
    enc = beam._encode(beam.params, jnp.asarray(mel[None]))
    prefix = jnp.asarray(np.asarray([beam.sot_sequence], np.int32))

    g_seq, g_lp, g_n, g_nsp = greedy._decode(
        greedy.params, enc, prefix, jnp.zeros((1,), jnp.float32),
        jax.random.PRNGKey(0))
    b_seq, b_lp, b_n, b_nsp = beam._beam_decode(beam.params, enc, prefix)
    g_avg = float(g_lp[0]) / float(g_n[0])
    b_avg = float(b_lp[0]) / float(b_n[0])
    assert b_avg >= g_avg - 1e-5, (b_avg, g_avg)
    # no_speech probe agrees between the two decoders (same prefix pass)
    np.testing.assert_allclose(np.asarray(b_nsp), np.asarray(g_nsp),
                               atol=1e-5)
    # deterministic
    b_seq2, b_lp2, _, _ = beam._beam_decode(beam.params, enc, prefix)
    np.testing.assert_array_equal(np.asarray(b_seq), np.asarray(b_seq2))
    # shapes line up with the greedy contract (prefix + generated)
    assert b_seq.shape[1] == g_seq.shape[1] == beam.max_decode_len


@pytest.mark.slow
def test_beam_transcribe_window_and_batch_paths():
    """The temperature-0 rung routes through beam in both the per-window
    and the lockstep batched APIs, and produces a well-formed result."""
    tr = _tiny_transcriber(temperatures=(0.0, 0.5),
                           compression_ratio_threshold=None,
                           logprob_threshold=None,
                           no_speech_threshold=None, beam_size=3)
    mel = np.zeros((80, 3000), np.float32)
    toks, avg_lp, nsp, temp = tr._decode_window(mel, 0)
    assert temp == 0.0  # accepted on the beam rung
    assert np.isfinite(avg_lp)
    audio = np.zeros(16000 * 2, np.float32)
    outs = tr.transcribe_batch([audio, audio])
    assert len(outs) == 2
    for o in outs:
        assert set(o) == {"text", "start", "end", "language"}
    # batched beam equals the single-window beam per element (lockstep
    # batching must not change the decode)
    single = tr.transcribe(audio)
    assert outs[0] == single and outs[1] == single
