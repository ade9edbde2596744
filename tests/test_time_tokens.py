import pytest

from vidchapters_tpu.data.time_tokens import (
    build_time_text_sequence,
    decode_chapter_sequence,
    normalize_caption,
    time_to_token,
    token_to_time,
)
from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer


def test_quantization_roundtrip():
    num_bins, num_text = 100, 32100
    duration = 330.0
    for t in [0.0, 10.0, 150.5, 330.0]:
        tid = time_to_token(t, duration, num_bins, num_text)
        assert num_text <= tid <= num_text + num_bins
        recovered = token_to_time(tid - num_text, duration, num_bins)
        # quantization error bounded by one bin width
        assert abs(recovered - t) <= duration / (num_bins - 1) + 1e-6


def test_normalize_caption():
    assert normalize_caption(" intro section ") == "Intro section."
    assert normalize_caption("Already done.") == "Already done."


def test_build_sequence_structure():
    tok = ByteLevelTokenizer()
    ids = build_time_text_sequence(
        starts=[0.0, 100.0], ends=[100.0, 200.0], texts=["intro", "body"],
        duration=200.0, tokenizer=tok, num_bins=100, max_tokens=1000)
    assert ids[-1] == tok.eos_token_id
    assert tok.is_time_token(ids[0]) and tok.is_time_token(ids[1])
    # second event's time tokens appear later
    time_positions = [i for i, t in enumerate(ids) if tok.is_time_token(t)]
    assert len(time_positions) == 4


def test_build_sequence_truncation_keeps_eos():
    tok = ByteLevelTokenizer()
    ids = build_time_text_sequence(
        starts=[0.0], ends=[50.0], texts=["x" * 500], duration=100.0,
        tokenizer=tok, num_bins=100, max_tokens=64)
    assert len(ids) == 64
    assert ids[-1] == tok.eos_token_id


def test_filter_to_duration_empty():
    tok = ByteLevelTokenizer()
    ids = build_time_text_sequence(
        starts=[-5.0], ends=[500.0], texts=["bad"], duration=100.0,
        tokenizer=tok, num_bins=100, max_tokens=64, filter_to_duration=True)
    assert ids == [tok.eos_token_id]


def test_decode_chapter_sequence_basic():
    events = decode_chapter_sequence(
        "<time=5> <time=7> Blablabla <time=7> <time=9> Blobloblo <time=2>",
        duration=99.0, num_bins=100)
    assert len(events) == 2
    assert events[0]["sentence"] == "Blablabla"
    assert events[0]["timestamp"] == [5.0, 7.0]
    # the reference keeps a dangling trailing time token inside the caption
    # (dvc.py:194 only filters the literal '<time=' fragment)
    assert events[1]["sentence"] == "Blobloblo <time=2>"
    assert events[1]["timestamp"] == [7.0, 9.0]


def test_decode_skips_triple_time_tokens():
    events = decode_chapter_sequence(
        "<time=1> <time=2> <time=3> hello", duration=99.0, num_bins=100)
    # pair (1,2) has no text between it and pair (2,3) so it is dropped
    # without claiming last_processed; pair (2,3) then takes "hello"
    # (dvc.py:191-212 control flow)
    assert len(events) == 1
    assert events[0]["timestamp"] == [2.0, 3.0]
    assert events[0]["sentence"] == "hello"


def test_decode_drops_invalid_and_empty():
    # end <= start dropped
    assert decode_chapter_sequence("<time=7> <time=5> x", 99.0, 100) == []
    # no text dropped
    assert decode_chapter_sequence("<time=5> <time=7>", 99.0, 100) == []


def test_decode_empty_string():
    assert decode_chapter_sequence("", 99.0, 100) == []
