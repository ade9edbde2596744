import numpy as np
import pytest

from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer, build_tokenizer


def test_vocab_layout():
    tok = ByteLevelTokenizer()
    assert len(tok) == 32200
    assert tok.pad_token_id == 0
    assert tok.eos_token_id == 1
    assert tok.time_token_id(0) == 32100
    assert tok.time_token_id(99) == 32199
    assert tok.sentinel_id(0) == 32099  # <extra_id_0> = top of text vocab


def test_roundtrip_plain_text():
    tok = ByteLevelTokenizer()
    text = "Hello world."
    ids = tok.encode(text)
    assert all(3 <= i < 3 + 256 for i in ids)
    assert tok.decode(ids) == text


def test_time_tokens_atomic_and_decoded_as_text():
    tok = ByteLevelTokenizer()
    text = "<time=5> <time=7> Intro."
    ids = tok.encode(text)
    assert ids[0] == tok.time_token_id(5)
    assert ids[1] == tok.time_token_id(7)
    out = tok.decode(ids)
    assert out.startswith("<time=5> <time=7>")
    assert "Intro." in out


def test_eos_and_truncation():
    tok = ByteLevelTokenizer()
    ids = tok.encode("abcdef", add_special_tokens=True)
    assert ids[-1] == tok.eos_token_id
    ids = tok.encode("abcdef", max_length=3, truncation=True)
    assert len(ids) == 3


def test_call_interface_matches_hf_shape():
    tok = ByteLevelTokenizer()
    out = tok("hi there", add_special_tokens=False, max_length=10,
              padding="do_not_pad", truncation=True)
    assert out["input_ids"] == tok.encode("hi there")
    assert out["attention_mask"] == [1] * len(out["input_ids"])


def test_skip_special_tokens():
    tok = ByteLevelTokenizer()
    ids = tok.encode("ok") + [tok.eos_token_id, tok.pad_token_id]
    assert tok.decode(ids, skip_special_tokens=True) == "ok"


def test_build_tokenizer_fallback():
    tok = build_tokenizer("")
    assert isinstance(tok, ByteLevelTokenizer)
