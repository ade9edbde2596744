"""Whisper language identification + decode-time timestamp rules.

Mechanism-level tests (random weights cannot detect real languages):
injected SOT-step logits must select the right language token, the
``language`` key must plumb through transcribe/transcribe_batch/ASR
pickles (the schema whisper_align.py:30-41 groups videos on), and
random-weight decodes under the timestamp rules must always emit
well-formed non-decreasing timestamp streams — openai-whisper
``detect_language``/``ApplyTimestampRules`` semantics, which the
reference factory inherits through the bare ``model.transcribe``
(asr_extract/whisper_inference.py:48)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.factory.whisper_transcribe import (
    EOT,
    LANG_BEGIN,
    TIMESTAMP_BEGIN,
    WHISPER_LANGUAGES,
    JaxWhisperTranscriber,
    apply_timestamp_rules,
    detect_language_from_logits,
    init_timestamp_state,
    language_code_for,
    language_token_for,
    update_timestamp_state,
)
from vidchapters_tpu.models.whisper import Whisper, WhisperConfig

VOCAB = TIMESTAMP_BEGIN + 1501  # = 51865, the multilingual v2 vocab


def _tiny_transcriber(**kw):
    cfg = WhisperConfig(vocab_size=VOCAB, num_mel_bins=80,
                        d_model=32, encoder_layers=1, decoder_layers=1,
                        num_heads=4, d_ff=64, max_source_positions=1500,
                        max_target_positions=64, dtype="float32")
    model = Whisper(cfg)
    mel = jnp.zeros((1, 80, 3000), jnp.float32)
    toks = jnp.zeros((1, 4), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, mel, toks)[
        "params"]
    kw.setdefault("max_decode_len", 12)
    return JaxWhisperTranscriber(model, params, **kw)


# ---------------------------------------------------------------------------
# language identification
# ---------------------------------------------------------------------------


def test_language_table_matches_transformers():
    """Our embedded 99-code table must equal the published Whisper table
    (first 99 entries of the HF tokenizer's LANGUAGES dict; the 100th,
    'yue', is large-v3-only and outside the v2 vocab)."""
    from transformers.models.whisper.tokenization_whisper import LANGUAGES

    assert tuple(list(LANGUAGES.keys())[:99]) == WHISPER_LANGUAGES
    assert language_token_for("en") == 50259
    assert language_code_for(50259) == "en"
    assert language_code_for(language_token_for("ja")) == "ja"
    with pytest.raises(ValueError):
        language_token_for("xx")
    with pytest.raises(ValueError):
        language_code_for(50258)  # SOT is not a language token


def test_detect_language_from_logits_injected():
    """Injected SOT-step logits: the selection must be restricted to the
    99 language tokens — a dominant text/timestamp logit is ignored."""
    logits = np.full((2, VOCAB), -5.0, np.float32)
    logits[0, language_token_for("fr")] = 4.0
    logits[0, 123] = 50.0  # dominant TEXT token: must not be selected
    logits[0, TIMESTAMP_BEGIN + 3] = 60.0  # dominant timestamp: ditto
    logits[1, language_token_for("zh")] = 2.0
    logits[1, language_token_for("de")] = 1.0
    tok, prob = detect_language_from_logits(jnp.asarray(logits))
    tok, prob = np.asarray(tok), np.asarray(prob)
    assert language_code_for(int(tok[0])) == "fr"
    assert language_code_for(int(tok[1])) == "zh"
    assert 0.0 < prob[1] < 1.0
    # probabilities renormalize over languages only
    assert prob[0] > 0.9


@pytest.mark.slow
def test_transcribe_emits_language_key():
    tr = _tiny_transcriber()  # language=None -> auto-detect
    audio = np.zeros(16000 * 5, np.float32)
    out = tr.transcribe(audio)
    assert set(out) == {"text", "start", "end", "language"}
    assert out["language"] in WHISPER_LANGUAGES
    # detection is deterministic for the same audio
    assert tr.transcribe(audio)["language"] == out["language"]
    code, p = tr.detect_language(audio)
    assert code == out["language"] and 0.0 < p <= 1.0
    # pinned language bypasses detection and is echoed in the schema
    tr_fr = _tiny_transcriber(language="fr")
    assert tr_fr.transcribe(audio)["language"] == "fr"
    assert tr_fr.sot_sequence[1] == language_token_for("fr")


@pytest.mark.slow
def test_batch_language_matches_single():
    tr = _tiny_transcriber()
    rng = np.random.default_rng(0)
    audios = [rng.normal(0, 0.1, 16000 * 4).astype(np.float32),
              np.zeros(16000 * 3, np.float32)]
    outs = tr.transcribe_batch(audios)
    for audio, out in zip(audios, outs):
        assert out["language"] == tr.transcribe(audio)["language"]


def test_proc_asr_keeps_language():
    from vidchapters_tpu.factory.asr import proc_asr

    raw = {"segments": [{"text": "hi", "start": 0.0, "end": 1.0}],
           "language": "de"}
    out = proc_asr(raw)
    assert out["language"] == "de"
    assert out["text"] == ["hi"]
    # absent stays absent (old pickles unchanged)
    assert "language" not in proc_asr({"segments": []})


@pytest.mark.slow
def test_run_batched_asr_pickles_have_language(tmp_path):
    """The per-video pickle written by the batched factory sweep carries
    the detected language, like the reference's ``model.transcribe``
    result pickles (whisper_inference.py:48-50)."""
    import wave

    from vidchapters_tpu.factory.asr import run_batched_asr
    from vidchapters_tpu.utils.io import load_pickle

    tr = _tiny_transcriber()
    paths = []
    rng = np.random.default_rng(1)
    for i in range(2):
        p = tmp_path / f"vid_{i}.wav"
        data = (rng.normal(0, 0.05, 16000 * 2) * 32767).astype(np.int16)
        with wave.open(str(p), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(data.tobytes())
        paths.append(str(p))
    out_dir = tmp_path / "asr"
    n = run_batched_asr(paths, str(out_dir), tr, batch_size=2)
    assert n == 2
    for i in range(2):
        result = load_pickle(out_dir / f"vid_{i}.pkl")
        assert result["language"] in WHISPER_LANGUAGES


@pytest.mark.slow
def test_detection_encode_is_reused():
    """Auto-detect must not add an encoder pass: detection's window-0
    encoding is reused by the first decode window, so encoder calls equal
    decode calls (not decode + 1) in both single and batched paths."""
    rng = np.random.default_rng(3)
    audio = rng.normal(0, 0.05, 16000 * 5).astype(np.float32)

    def instrument(tr):
        enc_calls, dec_calls = [], []
        orig_enc, orig_dec = tr._encode, tr._decode

        def counting_enc(params, mels):
            enc_calls.append(1)
            return orig_enc(params, mels)

        def counting_dec(*args):
            dec_calls.append(1)
            return orig_dec(*args)

        tr._encode, tr._decode = counting_enc, counting_dec
        return enc_calls, dec_calls

    tr = _tiny_transcriber(temperatures=(0.0,))  # one decode per window
    enc_calls, dec_calls = instrument(tr)
    out = tr.transcribe(audio)
    assert out["language"] in WHISPER_LANGUAGES  # detection really ran
    assert len(dec_calls) >= 1
    assert len(enc_calls) == len(dec_calls)

    tr2 = _tiny_transcriber(temperatures=(0.0,))
    enc_calls2, dec_calls2 = instrument(tr2)
    outs = tr2.transcribe_batch([audio, np.zeros(16000 * 4, np.float32)])
    assert all(o["language"] in WHISPER_LANGUAGES for o in outs)
    assert len(enc_calls2) == len(dec_calls2)


def test_detect_language_without_language_tokens_raises():
    """Tiny/custom vocabs below LANG_BEGIN have no language tokens; the
    public API must say so instead of crashing with a bare TypeError."""
    from vidchapters_tpu.models.whisper import Whisper, WhisperConfig

    cfg = WhisperConfig(vocab_size=256, num_mel_bins=80, d_model=32,
                        encoder_layers=1, decoder_layers=1, num_heads=4,
                        d_ff=64, max_source_positions=1500,
                        max_target_positions=16, dtype="float32")
    model = Whisper(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 80, 3000), jnp.float32),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    tr = JaxWhisperTranscriber(model, params, max_decode_len=8)
    with pytest.raises(ValueError, match="language tokens"):
        tr.detect_language(np.zeros(16000, np.float32))


# ---------------------------------------------------------------------------
# timestamp rules
# ---------------------------------------------------------------------------


def _state(prev, prevprev, ts_last):
    return (jnp.asarray([prev], jnp.int32),
            jnp.asarray([prevprev], jnp.int32),
            jnp.asarray([ts_last], jnp.int32))


def test_rules_first_token_is_capped_timestamp():
    logits = np.zeros((1, VOCAB), np.float32)
    logits[0, 777] = 10.0  # dominant text token
    logits[0, TIMESTAMP_BEGIN + 200] = 9.0  # timestamp beyond max_initial
    logits[0, TIMESTAMP_BEGIN + 7] = 1.0
    out = np.asarray(apply_timestamp_rules(
        jnp.asarray(logits), init_timestamp_state(1), True,
        max_initial_idx=50))
    assert int(out.argmax()) == TIMESTAMP_BEGIN + 7


def test_rules_after_lone_timestamp_blocks_timestamps():
    """seq = [<|t|>] with nothing sampled before it (segment opening):
    penultimate counts as timestamp -> next token must be TEXT."""
    logits = np.zeros((1, VOCAB), np.float32)
    logits[0, TIMESTAMP_BEGIN + 9] = 10.0
    logits[0, 555] = 1.0
    st = update_timestamp_state(init_timestamp_state(1),
                                jnp.asarray([TIMESTAMP_BEGIN + 5]))
    out = np.asarray(apply_timestamp_rules(jnp.asarray(logits), st, False))
    assert int(out.argmax()) == 555


def test_rules_after_text_then_timestamp_forces_pair():
    """seq = [..., text, <|t|>]: the segment just closed — the next token
    must be a timestamp (the pair partner / next opening) or EOT."""
    logits = np.zeros((1, VOCAB), np.float32)
    logits[0, 555] = 10.0  # dominant text: must be masked
    logits[0, TIMESTAMP_BEGIN + 12] = 1.0
    st = _state(prev=TIMESTAMP_BEGIN + 10, prevprev=333,
                ts_last=TIMESTAMP_BEGIN + 10)
    out = np.asarray(apply_timestamp_rules(jnp.asarray(logits), st, False))
    best = int(out.argmax())
    assert best >= TIMESTAMP_BEGIN or best == EOT
    # the same lone-timestamp state allows repeating the SAME timestamp
    assert out[0, TIMESTAMP_BEGIN + 10] > -1e8


def test_rules_timestamps_never_decrease():
    logits = np.zeros((1, VOCAB), np.float32)
    logits[0, TIMESTAMP_BEGIN + 3] = 10.0  # earlier than the last one
    logits[0, TIMESTAMP_BEGIN + 30] = 1.0
    # after a PAIR (prev and prevprev timestamps) text is forced, so use a
    # post-text state: prev=text, ts_last=+20 -> floor is +21
    st = _state(prev=444, prevprev=TIMESTAMP_BEGIN + 20,
                ts_last=TIMESTAMP_BEGIN + 20)
    out = np.asarray(apply_timestamp_rules(jnp.asarray(logits), st, False))
    assert out[0, TIMESTAMP_BEGIN + 3] < -1e8
    assert out[0, TIMESTAMP_BEGIN + 20] < -1e8  # strictly greater required
    assert out[0, TIMESTAMP_BEGIN + 30] > -1e8


def test_rules_force_timestamp_when_mass_dominates():
    """Rule 4: summed timestamp probability beats the best text token ->
    text is masked even though each individual timestamp logit is lower."""
    logits = np.full((1, VOCAB), -30.0, np.float32)
    logits[0, 555] = 2.0  # best text token
    logits[0, TIMESTAMP_BEGIN:] = 0.0  # 1501 timestamps, logsumexp ~ 7.3
    st = _state(prev=444, prevprev=TIMESTAMP_BEGIN + 1,
                ts_last=TIMESTAMP_BEGIN + 1)
    out = np.asarray(apply_timestamp_rules(jnp.asarray(logits), st, False))
    assert out[0, 555] < -1e8
    assert int(out.argmax()) >= TIMESTAMP_BEGIN


def test_rules_no_force_when_text_dominates():
    logits = np.full((1, VOCAB), -30.0, np.float32)
    logits[0, 555] = 20.0
    logits[0, TIMESTAMP_BEGIN:] = 0.0
    st = _state(prev=444, prevprev=TIMESTAMP_BEGIN + 1,
                ts_last=TIMESTAMP_BEGIN + 1)
    out = np.asarray(apply_timestamp_rules(jnp.asarray(logits), st, False))
    assert int(out.argmax()) == 555


def _assert_wellformed(tokens, max_initial_idx=50):
    """Independent oracle for the emitted stream structure: opening
    timestamp first (capped), text after a segment opening, timestamp/EOT
    after a closing, non-decreasing timestamps."""
    TB = TIMESTAMP_BEGIN
    assert tokens, "rules must force at least an opening timestamp"
    assert TB <= tokens[0] <= TB + max_initial_idx, tokens[0]
    ts_last = TB - 1
    for i, t in enumerate(tokens):
        # openai-whisper decoding.py: last = sampled[-1] is a timestamp;
        # penultimate counts as a timestamp while len(sampled) < 2 — so
        # the forced opening timestamp is followed by TEXT
        last_ts = i >= 1 and tokens[i - 1] >= TB
        pen_ts = i < 2 or tokens[i - 2] >= TB
        if last_ts and pen_ts:
            assert t < TB, f"timestamp after a completed pair: {tokens}"
        if last_ts and not pen_ts:
            assert t >= TB, f"text after a lone closing ts: {tokens}"
        if t >= TB:
            floor = ts_last if (last_ts and not pen_ts) else ts_last + 1
            assert t >= floor, f"decreasing timestamp: {tokens}"
            ts_last = t


@pytest.mark.slow
@pytest.mark.parametrize("kw", [
    {},                                    # greedy
    {"temperatures": (0.8,)},              # sampled
    {"beam_size": 3},                      # beam
])
def test_random_decode_streams_wellformed(kw):
    tr = _tiny_transcriber(language="en", compression_ratio_threshold=None,
                           logprob_threshold=None, no_speech_threshold=None,
                           **kw)
    assert tr.timestamp_rules
    rng = np.random.default_rng(3)
    for seed in range(3):
        mel = rng.normal(0, 1, (80, 3000)).astype(np.float32)
        toks, _, _, _ = tr._decode_window(mel, seed)
        _assert_wellformed(toks)


@pytest.mark.slow
def test_rules_off_streams_violate():
    """Sanity that the property is non-trivial: with the filter off, a
    random-weight greedy decode essentially never starts with a capped
    opening timestamp (P ~ 50/51865 per window)."""
    tr = _tiny_transcriber(language="en", timestamp_rules=False,
                           compression_ratio_threshold=None,
                           logprob_threshold=None, no_speech_threshold=None)
    assert not tr.timestamp_rules
    rng = np.random.default_rng(4)
    violations = 0
    for seed in range(3):
        mel = rng.normal(0, 1, (80, 3000)).astype(np.float32)
        toks, _, _, _ = tr._decode_window(mel, seed)
        try:
            _assert_wellformed(toks)
        except AssertionError:
            violations += 1
    assert violations > 0


@pytest.mark.slow
@pytest.mark.parametrize("kw", [
    {},                                    # greedy megakernel route
    {"beam_size": 3},                      # beam megakernel route
])
def test_random_mega_decode_streams_wellformed(kw):
    """The rules filter sits OUTSIDE the step kernel, so the megakernel
    routes (fused greedy step and grouped beam) must emit the same
    well-formed timestamp structure as the standard path — asserted
    directly here rather than inferred from token-identity tests."""
    from vidchapters_tpu.factory import whisper_transcribe as wt

    old, oldi = wt.USE_MEGA_DECODE, wt.MEGA_INTERPRET
    try:
        wt.USE_MEGA_DECODE = True
        wt.MEGA_INTERPRET = True
        tr = _tiny_transcriber(language="en",
                               compression_ratio_threshold=None,
                               logprob_threshold=None,
                               no_speech_threshold=None, **kw)
    finally:
        wt.USE_MEGA_DECODE, wt.MEGA_INTERPRET = old, oldi
    # pin the route: mega fns carry an in-kernel reorder_cache, the
    # standard path's is None — without this the test could silently
    # degrade to re-testing the standard path if fns construction ever
    # moves past the flag-restore above
    assert tr.decode_fns.reorder_cache is not None
    assert tr.timestamp_rules
    rng = np.random.default_rng(5)
    for seed in range(2):
        mel = rng.normal(0, 1, (80, 3000)).astype(np.float32)
        toks, _, _, _ = tr._decode_window(mel, seed)
        _assert_wellformed(toks)
