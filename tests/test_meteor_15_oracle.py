"""Hand-derived METEOR-1.5-mode oracle values (VERDICT r3 missing #2).

The nltk anchor (test_meteor_anchor.py) pins only the 1.0-style
configuration; the 1.5-specific machinery — content/function delta
weighting, per-module weights, the jar's English parameters
(alpha .85, beta .2, gamma .6, delta .75), phrase-level paraphrase
matches, and summed-stat corpus aggregation — had no absolute anchor.
Each case below is worked BY HAND from the meteor-1.5 scoring spec
(dvc_eval/pycocoevalcap/meteor/meteor.py:16-60 drives the jar with
exactly these English task parameters); the expected value is written
as explicit literal arithmetic, never by calling the implementation,
so any regression in weighting, alignment, chunking, or the penalty
formula breaks these equalities.

Scoring spec used for the derivations (meteor-1.5 paper, §2):
  weight(w)   = 1-delta = .25 if w is a function word else delta = .75
  P           = sum_m w_mod * weight(matched hyp words) / sum weight(hyp)
  R           = likewise over ref
  Fmean       = P*R / (alpha*P + (1-alpha)*R)
  frag        = chunks / mean(hyp_matched, ref_matched)
  score       = (1 - gamma * frag**beta) * Fmean
"""

import pytest

from vidchapters_tpu.evals.meteor import (
    DEFAULT_PARAMS,
    Meteor,
    _segment_stats,
    _score_from_stats,
    meteor_score,
)

A, B, G, D = 0.85, 0.2, 0.6, 0.75  # meteor-1.5 English task parameters


def _score(hyp, ref, **kw):
    return _score_from_stats(_segment_stats(hyp, ref, **kw), None)


def _fmean(p, r):
    return p * r / (A * p + (1 - A) * r)


def test_identical_sentence_exact_only():
    # "the cat sat on the mat": P = R = 1 whatever the word weights; one
    # contiguous chunk over m = 6 matched words.
    got = _score("the cat sat on the mat", "the cat sat on the mat")
    expect = (1.0 - G * (1.0 / 6.0) ** B) * 1.0
    assert got == pytest.approx(expect, abs=1e-12)


def test_partial_exact_with_delta_weighting():
    # hyp = "the cat sat"  ref = "the cat ate fish"
    # Matches: the(fn, .25), cat(content, .75) — exact, contiguous, 1 chunk.
    # wp_num = 1.0*(.25+.75) = 1.0   wp_den = .25+.75+.75      = 1.75
    # wr_num = 1.0                  wr_den = .25+.75+.75+.75  = 2.50
    p, r = 1.0 / 1.75, 1.0 / 2.5
    expect = (1.0 - G * (1.0 / 2.0) ** B) * _fmean(p, r)
    got = _score("the cat sat", "the cat ate fish")
    assert got == pytest.approx(expect, abs=1e-12)


def test_stem_module_weight():
    # "running" vs "runs": Porter stems both to "run" -> stem module,
    # weight .6, single content word. P = R = .6*.75/.75 = .6; m = 1,
    # chunks = 1, penalty = gamma * 1**beta = .6.
    got = _score("running", "runs")
    expect = (1.0 - G) * _fmean(0.6, 0.6)
    assert got == pytest.approx(expect, abs=1e-12)
    assert got == pytest.approx(0.24, abs=1e-12)


def test_synonym_table_module_weight():
    # table: sofa <-> couch (module weight .8).
    # hyp "the sofa" / ref "the couch": matches the(exact,.25) +
    # sofa~couch(syn,.75); contiguous -> 1 chunk over m = 2.
    # wp_num = 1.0*.25 + .8*.75 = .85; wp_den = 1.0 (same for ref).
    got = _score("the sofa", "the couch",
                 synonym_table={"sofa": frozenset({"couch"}),
                                "couch": frozenset({"sofa"})})
    expect = (1.0 - G * (1.0 / 2.0) ** B) * _fmean(0.85, 0.85)
    assert got == pytest.approx(expect, abs=1e-12)


def test_full_fragmentation_penalty():
    # Fully reversed content words: every match its own chunk.
    # chunks = 4, m = 4 -> frag = 1 -> penalty = gamma; P = R = 1.
    got = _score("cats dogs birds fish", "fish birds dogs cats")
    assert got == pytest.approx(1.0 - G, abs=1e-12)


def test_paraphrase_phrase_match():
    # table: "big cat" <-> "lion" (module weight .6).
    # hyp "the big cat" / ref "the lion".
    # Matches: the-the exact; phrase ["big","cat"] ~ ["lion"].
    # hyp_matched = 3, ref_matched = 2 -> m = 2.5; both contiguous -> 1 chunk.
    # wp_num = 1.0*.25 + .6*(.75+.75) = 1.15    wp_den = .25+.75+.75 = 1.75
    # wr_num = 1.0*.25 + .6*.75       = 0.70    wr_den = .25+.75     = 1.00
    table = {"big cat": frozenset({"lion"}), "lion": frozenset({"big cat"})}
    got = _score("the big cat", "the lion", paraphrases=table)
    p, r = 1.15 / 1.75, 0.70 / 1.00
    expect = (1.0 - G * (1.0 / 2.5) ** B) * _fmean(p, r)
    assert got == pytest.approx(expect, abs=1e-12)


def test_corpus_aggregation_is_summed_stats_not_mean():
    # Two segments; the corpus score must come from SUMMED statistics
    # (jar convention), not the mean of segment scores.
    # seg 1: "the cat sat" vs "the cat ate fish" (stats from the partial
    #        test: wp 1.0/1.75, wr 1.0/2.5, chunks 1, m 2)
    # seg 2: "running" vs "runs" (wp .45/.75, wr .45/.75, chunks 1, m 1)
    m = Meteor()
    corpus, segs = m.compute_score(
        {"a": ["the cat ate fish"], "b": ["runs"]},
        {"a": ["the cat sat"], "b": ["running"]})
    p = (1.0 + 0.45) / (1.75 + 0.75)
    r = (1.0 + 0.45) / (2.5 + 0.75)
    expect = (1.0 - G * (2.0 / 3.0) ** B) * _fmean(p, r)
    assert corpus == pytest.approx(expect, abs=1e-12)
    assert segs[0] == pytest.approx(
        (1.0 - G * 0.5 ** B) * _fmean(1.0 / 1.75, 1.0 / 2.5), abs=1e-12)
    assert segs[1] == pytest.approx(0.24, abs=1e-12)
    # and it is NOT the segment mean (the two differ on these fixtures)
    assert corpus != pytest.approx((segs[0] + segs[1]) / 2.0, abs=1e-6)


def test_multi_reference_takes_best():
    # Against ["the cat sat on the mat", "dogs bark"] the identical first
    # reference must win with the identical-sentence score.
    expect = 1.0 - G * (1.0 / 6.0) ** B
    got = meteor_score("the cat sat on the mat",
                       ["dogs bark", "the cat sat on the mat"])
    assert got == pytest.approx(expect, abs=1e-12)


def test_default_params_are_the_15_english_task():
    assert (DEFAULT_PARAMS.alpha, DEFAULT_PARAMS.beta, DEFAULT_PARAMS.gamma,
            DEFAULT_PARAMS.delta) == (A, B, G, D)
    assert (DEFAULT_PARAMS.w_exact, DEFAULT_PARAMS.w_stem,
            DEFAULT_PARAMS.w_syn, DEFAULT_PARAMS.w_para) == (1.0, .6, .8, .6)
