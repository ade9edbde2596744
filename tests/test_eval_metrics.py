import numpy as np
import pytest

from vidchapters_tpu.evals.bleu import Bleu
from vidchapters_tpu.evals.cider import Cider
from vidchapters_tpu.evals.meteor import Meteor, meteor_score
from vidchapters_tpu.evals.ptb import PTBTokenizer, ptb_tokenize_sentence
from vidchapters_tpu.evals.rouge import Rouge


# ---------------------------------------------------------------- PTB

def test_ptb_lowercase_and_punct_removal():
    assert ptb_tokenize_sentence("Hello, World!") == "hello world"
    assert ptb_tokenize_sentence("A dog.") == "a dog"


def test_ptb_contractions():
    assert ptb_tokenize_sentence("don't stop") == "do n't stop"
    assert ptb_tokenize_sentence("the dog's bone") == "the dog 's bone"


def test_ptb_dict_interface():
    tok = PTBTokenizer()
    out = tok.tokenize({0: [{"caption": "Hello, World!"}], 1: [{"caption": "Hi."}]})
    assert out == {0: ["hello world"], 1: ["hi"]}


# ---------------------------------------------------------------- BLEU

def test_bleu_perfect_match():
    b = Bleu(4)
    gts = {0: ["the cat sat on the mat"]}
    res = {0: ["the cat sat on the mat"]}
    score, _ = b.compute_score(gts, res)
    for s in score:
        assert s == pytest.approx(1.0, abs=1e-6)


def test_bleu_no_match():
    b = Bleu(4)
    score, _ = b.compute_score({0: ["aa bb cc"]}, {0: ["xx yy zz"]})
    assert score[0] < 1e-3


def test_bleu_partial_and_monotone():
    b = Bleu(4)
    gts = {0: ["the cat sat on the mat"]}
    s_close, _ = b.compute_score(gts, {0: ["the cat sat on a mat"]})
    s_far, _ = b.compute_score(gts, {0: ["the dog ran in a park"]})
    assert s_close[0] > s_far[0]
    assert 0 < s_close[3] < 1


def test_bleu_brevity_penalty():
    b = Bleu(1)
    gts = {0: ["the cat sat on the mat"]}
    full, _ = b.compute_score(gts, {0: ["the cat sat on the mat"]})
    short, _ = b.compute_score(gts, {0: ["the cat"]})
    assert short[0] < full[0]  # short but precise is penalized


# ---------------------------------------------------------------- ROUGE

def test_rouge_perfect_and_zero():
    r = Rouge()
    score, _ = r.compute_score({0: ["a b c d"]}, {0: ["a b c d"]})
    assert score == pytest.approx(1.0)
    score, _ = r.compute_score({0: ["a b c d"]}, {0: ["x y z w"]})
    assert score == pytest.approx(0.0)


def test_rouge_subsequence():
    r = Rouge()
    score, _ = r.compute_score({0: ["a b c d e f"]}, {0: ["a c e"]})
    # LCS = 3; P = 1.0, R = 0.5
    beta = 1.2
    expected = (1 + beta**2) * 1.0 * 0.5 / (0.5 + beta**2 * 1.0)
    assert score == pytest.approx(expected)


# ---------------------------------------------------------------- CIDEr

def test_cider_identical_corpus():
    c = Cider()
    gts = {i: [s] for i, s in enumerate(["a cat on a mat", "a dog in a park", "sun in the sky"])}
    res = {i: [gts[i][0]] for i in gts}
    score, scores = c.compute_score(gts, res)
    assert score > 0  # identical captions score positively
    assert np.all(scores >= 0)


def test_cider_ranks_better_match_higher():
    c = Cider()
    gts = {0: ["the cat sat on the mat"], 1: ["a big red apple on the table"],
           2: ["two dogs play in the snow"]}
    res_good = {0: ["the cat sat on the mat"], 1: ["a big red apple"], 2: ["dogs play in snow"]}
    res_bad = {0: ["airplane"], 1: ["submarine"], 2: ["qwerty"]}
    good, _ = c.compute_score(gts, res_good)
    bad, _ = c.compute_score(gts, res_bad)
    assert good > bad
    assert bad == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------- METEOR

def test_meteor_identical_beats_partial_beats_disjoint():
    ident = meteor_score("the cat sat on the mat", ["the cat sat on the mat"])
    partial = meteor_score("the cat sat on a rug", ["the cat sat on the mat"])
    disjoint = meteor_score("xyzzy quux", ["the cat sat on the mat"])
    assert ident > partial > disjoint
    assert disjoint == 0.0
    assert ident > 0.5


def test_meteor_stem_matching():
    # "running" vs "run" should match through the Porter stem stage
    with_stem = meteor_score("he is running", ["he is run"])
    without = meteor_score("he is jumping", ["he is run"])
    assert with_stem > without


def test_meteor_word_order_penalty():
    ordered = meteor_score("a b c d e f", ["a b c d e f"])
    shuffled = meteor_score("f e d c b a", ["a b c d e f"])
    assert ordered > shuffled


def test_meteor_compute_score_interface():
    m = Meteor()
    gts = {0: ["the cat sat"], 1: ["a dog"]}
    res = {0: ["the cat sat"], 1: ["a dog"]}
    corpus, segs = m.compute_score(gts, res)
    assert len(segs) == 2
    # METEOR 1.5-en fragmentation penalty caps very short perfect matches
    # near 0.5 (gamma=0.6, beta=0.2)
    assert corpus > 0.4
    assert all(s > 0.4 for s in segs)


def test_meteor_multi_reference_takes_best():
    m = Meteor()
    gts = {0: ["completely unrelated words here", "the cat sat on the mat"]}
    res = {0: ["the cat sat on the mat"]}
    corpus, segs = m.compute_score(gts, res)
    assert segs[0] > 0.5
