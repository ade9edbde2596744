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


def test_empty_hypothesis_and_reference_are_zero():
    # Jar convention: no alignment is possible, the segment scores 0 —
    # for an empty hypothesis, an empty reference, and both.
    assert _score("", "the cat sat") == 0.0
    assert _score("the cat sat", "") == 0.0
    assert _score("", "") == 0.0
    assert _score("   ", "the cat") == 0.0  # whitespace-only
    assert meteor_score("", ["the cat sat", "dogs bark"]) == 0.0


def test_corpus_sum_includes_empty_hypothesis_reference_mass():
    # Summed-stats aggregation with one EMPTY-hypothesis segment: the
    # segment scores 0, but its reference still adds weight to the summed
    # recall denominator (the jar sums per-segment statistics, so an
    # unanswered segment drags corpus recall, unlike a mean of scores).
    # seg a: hyp = ref = "the cat sat on the mat"
    #   weights: the .25, cat .75, sat .75, on .25, the .25, mat .75
    #   wp = wr = 3.0/3.0, chunks 1, m 6
    # seg b: hyp = "" vs ref "dogs bark"
    #   wp = 0/0, wr = 0/(.75+.75) = 0/1.5, chunks 0, m 0
    # corpus: P = 3.0/3.0 = 1, R = 3.0/(3.0+1.5) = 2/3, frag = 1/6
    m = Meteor()
    corpus, segs = m.compute_score(
        {"a": ["the cat sat on the mat"], "b": ["dogs bark"]},
        {"a": ["the cat sat on the mat"], "b": [""]})
    assert segs[0] == pytest.approx(1.0 - G * (1.0 / 6.0) ** B, abs=1e-12)
    assert segs[1] == 0.0
    expect = (1.0 - G * (1.0 / 6.0) ** B) * _fmean(1.0, 3.0 / 4.5)
    assert corpus == pytest.approx(expect, abs=1e-12)


def test_multi_reference_best_by_score_not_first():
    # Two NON-identical references; the winner must be selected by score.
    # hyp "the cat sat":
    #   vs "the cat ate fish" (first): the+cat match, 1 chunk, m 2
    #     s1 = (1-.6*.5^.2) * fmean(1/1.75, 1/2.5)
    #   vs "a cat sat" (second): cat+sat match (the~a never matches),
    #     1 chunk, m 2; wp = 1.5/(.25+.75+.75), wr = 1.5/(.25+.75+.75)
    #     s2 = (1-.6*.5^.2) * fmean(6/7, 6/7)   [fmean(p,p) = p]
    s1 = (1.0 - G * 0.5 ** B) * _fmean(1.0 / 1.75, 1.0 / 2.5)
    s2 = (1.0 - G * 0.5 ** B) * (6.0 / 7.0)
    assert s2 > s1  # the second reference wins
    got = meteor_score("the cat sat", ["the cat ate fish", "a cat sat"])
    assert got == pytest.approx(s2, abs=1e-12)
    # order independence
    got = meteor_score("the cat sat", ["a cat sat", "the cat ate fish"])
    assert got == pytest.approx(s2, abs=1e-12)


def test_norm_splits_trailing_punctuation():
    # The reference drives the jar with ``-norm`` (meteor.py:17-19), which
    # tokenizes punctuation: "mat." becomes ["mat", "."].
    # hyp "The cat sat on the mat." vs ref "the cat sat on the mat":
    #   hyp tokens: the cat sat on the mat .   (7; "." is content, .75)
    #   6 exact matches, contiguous -> 1 chunk, m 6
    #   wp = 3.0/(3.0+.75) = .8    wr = 3.0/3.0 = 1
    got = _score("The cat sat on the mat.", "the cat sat on the mat")
    expect = (1.0 - G * (1.0 / 6.0) ** B) * _fmean(0.8, 1.0)
    assert got == pytest.approx(expect, abs=1e-12)


def test_norm_keeps_intraword_apostrophe_and_hyphen():
    # Contractions and compounds stay single tokens under -norm: if
    # "don't" / "ice-cream" were split, both sides would still match
    # perfectly but m would be 8, not 4 — the fragmentation penalty
    # pins the tokenization.
    got = _score("Don't STOP the ice-cream", "don't stop the ice-cream")
    expect = 1.0 - G * (1.0 / 4.0) ** B
    assert got == pytest.approx(expect, abs=1e-12)


def test_norm_comma_breaks_chunk_contiguity():
    # "cats, dogs" vs "cats dogs": the comma becomes its own (unmatched)
    # token BETWEEN the matches, so hyp positions 0 and 2 are no longer
    # adjacent -> 2 chunks over m = 2 -> frag 1 -> full gamma penalty.
    # wp = 1.5/(.75+.75+.75) = 2/3   wr = 1.5/1.5 = 1
    got = _score("cats, dogs", "cats dogs")
    expect = (1.0 - G) * _fmean(2.0 / 3.0, 1.0)
    assert got == pytest.approx(expect, abs=1e-12)


def test_align_fewer_chunks_beats_module_weight():
    # hyp "running runs" vs ref "runs running". Two max-coverage
    # alignments exist: crossed EXACT matches (running<->running,
    # runs<->runs -> 2 chunks) or in-place STEM matches
    # (running~runs, runs~running -> 1 contiguous chunk). The aligner
    # objective orders chunk minimization BEFORE module weight, so the
    # stem alignment must win despite its lower weight (.6 < 1.0):
    #   wp_num = .6*(.75+.75) = .9   wp_den = 1.5   P = R = .6
    #   chunks = 1, m = 2 -> frag = 1/2
    got = _score("running runs", "runs running")
    expect = (1.0 - G * 0.5 ** B) * _fmean(0.6, 0.6)
    assert got == pytest.approx(expect, abs=1e-12)
    # the crossed-exact alternative scores differently — the equality
    # above really does pin the aligner's choice
    crossed = (1.0 - G * 1.0 ** B) * _fmean(1.0, 1.0)
    assert abs(expect - crossed) > 1e-3


def test_align_duplicate_word_picks_contiguous_occurrence():
    # hyp "the the cat" vs ref "the cat": ref's single "the" can match
    # either hyp occurrence (both exact). Matching hyp[1] keeps the
    # alignment contiguous with cat (1 chunk); matching hyp[0] leaves a
    # gap (2 chunks). Chunk minimization picks hyp[1]:
    #   wp_num = .25 + .75 = 1.0   wp_den = .25+.25+.75 = 1.25  P = .8
    #   wr_num = 1.0               wr_den = 1.0                 R = 1
    #   chunks = 1, m = 2
    got = _score("the the cat", "the cat")
    expect = (1.0 - G * 0.5 ** B) * _fmean(0.8, 1.0)
    assert got == pytest.approx(expect, abs=1e-12)


def test_chunk_breaks_on_reference_side_gap():
    # hyp "cats dogs" vs ref "cats sleep dogs": the matches are adjacent
    # on the HYP side but straddle an unmatched ref word — contiguity
    # requires adjacency on BOTH sides, so this is 2 chunks over m = 2
    # (frag 1 -> full gamma penalty).
    #   wp = 1.5/1.5 = 1        wr = 1.5/(.75*3) = 2/3
    got = _score("cats dogs", "cats sleep dogs")
    expect = (1.0 - G) * _fmean(1.0, 2.0 / 3.0)
    assert got == pytest.approx(expect, abs=1e-12)


def test_align_coverage_beats_exact_module():
    # table: "big cat" <-> "lion".  hyp "big cat" vs ref "lion cat".
    # Option A: phrase match ["big","cat"]~["lion"] covers 3 words but
    # consumes hyp "cat", forfeiting the exact cat<->cat match (cov 2).
    # Coverage maximization is the FIRST objective, so A wins even
    # though B uses the higher-weight exact module:
    #   wp_num = .6*(.75+.75) = .9    wp_den = 1.5    P = .6
    #   wr_num = .6*.75 = .45         wr_den = 1.5    R = .3
    #   hyp_matched 2, ref_matched 1 -> m = 1.5; chunks = 1
    table = {"big cat": frozenset({"lion"}), "lion": frozenset({"big cat"})}
    got = _score("big cat", "lion cat", paraphrases=table)
    expect = (1.0 - G * (1.0 / 1.5) ** B) * _fmean(0.6, 0.3)
    assert got == pytest.approx(expect, abs=1e-12)


def test_default_params_are_the_15_english_task():
    assert (DEFAULT_PARAMS.alpha, DEFAULT_PARAMS.beta, DEFAULT_PARAMS.gamma,
            DEFAULT_PARAMS.delta) == (A, B, G, D)
    assert (DEFAULT_PARAMS.w_exact, DEFAULT_PARAMS.w_stem,
            DEFAULT_PARAMS.w_syn, DEFAULT_PARAMS.w_para) == (1.0, .6, .8, .6)
