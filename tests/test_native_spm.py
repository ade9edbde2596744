"""Native C++ unigram-SPM encoder vs the pure-Python Viterbi: exact ids.

The native path (native/spm_encoder.cpp via data/native_spm.py) must be a
drop-in twin — same segmentation, same tie-breaks, same unk fallback —
on ASCII, multibyte UTF-8, and unk-heavy inputs.
"""

import pytest

from vidchapters_tpu.data.tokenizer import SentencePieceUnigramTokenizer
from tests.test_spm_tokenizer import PIECES, make_spm_model


@pytest.fixture
def model_path(tmp_path):
    p = tmp_path / "spiece.model"
    make_spm_model(p, PIECES)
    return p


TEXTS = [
    "the cat",
    "the cats",
    "cat dog cat",
    "  the   dog ",
    "unknownwords here",          # unk fallback chars
    "naïve café ☃ snowman",       # multibyte codepoints -> unk paths
    "a" * 500,                     # long repeated input
    "t",
    "",
    "▁the",                        # literal metasymbol in input
]


def test_native_matches_python_ids(model_path):
    from vidchapters_tpu.data import native_spm

    if not native_spm.is_available():
        pytest.skip("no g++ toolchain")
    py = SentencePieceUnigramTokenizer(str(model_path), num_bins=100,
                                       extra_ids=4, use_native=False)
    nat = SentencePieceUnigramTokenizer(str(model_path), num_bins=100,
                                        extra_ids=4, use_native=True)
    assert py._native is None and nat._native is not None
    for text in TEXTS:
        assert nat._encode_text(text) == py._encode_text(text), text
        # whole pipeline (special tokens, truncation) agrees too
        assert (nat.encode(text, add_special_tokens=True)
                == py.encode(text, add_special_tokens=True)), text


def test_native_matches_python_fuzz(model_path):
    """200 random strings over a mixed alphabet (vocab chars, unknown
    ASCII, multibyte codepoints, metasymbol, whitespace runs) — ids must
    match exactly."""
    import random

    from vidchapters_tpu.data import native_spm

    if not native_spm.is_available():
        pytest.skip("no g++ toolchain")
    py = SentencePieceUnigramTokenizer(str(model_path), num_bins=100,
                                       extra_ids=4, use_native=False)
    nat = SentencePieceUnigramTokenizer(str(model_path), num_bins=100,
                                        extra_ids=4, use_native=True)
    rng = random.Random(0)
    alphabet = list("the cats dog") + ["▁", "é", "☃", "日", "  ", "\t", "x"]
    for _ in range(200):
        text = "".join(rng.choice(alphabet)
                       for _ in range(rng.randrange(0, 60)))
        assert nat._encode_text(text) == py._encode_text(text), repr(text)


def test_native_roundtrip_decode(model_path):
    from vidchapters_tpu.data import native_spm

    if not native_spm.is_available():
        pytest.skip("no g++ toolchain")
    tok = SentencePieceUnigramTokenizer(str(model_path), num_bins=100,
                                        extra_ids=4, use_native=True)
    ids = tok.encode("the cat")
    assert tok.decode(ids) == "the cat"


def test_native_is_actually_faster(model_path):
    """Sanity: the native path beats Python by a wide margin on a long
    transcript (the motivation for the C++ twin)."""
    import time

    from vidchapters_tpu.data import native_spm

    if not native_spm.is_available():
        pytest.skip("no g++ toolchain")
    py = SentencePieceUnigramTokenizer(str(model_path), num_bins=100,
                                       extra_ids=4, use_native=False)
    nat = SentencePieceUnigramTokenizer(str(model_path), num_bins=100,
                                        extra_ids=4, use_native=True)
    text = "the cat sat on the dog mat " * 400
    for _ in range(2):  # warm both
        nat._encode_text(text), py._encode_text(text)
    t0 = time.perf_counter()
    for _ in range(5):
        nat._encode_text(text)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        py._encode_text(text)
    t_py = time.perf_counter() - t0
    assert t_nat * 3 < t_py, (t_nat, t_py)
