"""Pure-Python METEOR (1.5-style), replacing the Java jar dependency.

The reference drives a (stripped) ``meteor-1.5.jar`` over stdin/stdout
(dvc_eval/pycocoevalcap/meteor/meteor.py:16-60). This module reimplements the
metric natively: staged word alignment (exact -> Porter stem -> WordNet
synonym when corpus data is present), METEOR 1.5 English parameters
(alpha=0.85, beta=0.2, gamma=0.6, delta=0.75; module weights 1.0/0.6/0.8),
content/function-word weighting, fragmentation chunk penalty, and
jar-compatible aggregation (the corpus score is computed from summed segment
statistics, not the mean of segment scores).

Known deviation: the jar's paraphrase-table module is omitted (its data blob
is not redistributable); scores therefore run slightly lower than the jar on
paraphrase-heavy text but preserve ranking. The interface matches
pycocoevalcap: ``compute_score(gts, res) -> (corpus_score, [segment_scores])``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

try:
    from nltk.stem.porter import PorterStemmer

    _STEMMER = PorterStemmer()
except Exception:  # pragma: no cover
    _STEMMER = None

try:  # synonym stage only if wordnet corpus data is locally available
    from nltk.corpus import wordnet as _wn

    _wn.synsets("test")
    _WORDNET = _wn
except Exception:  # pragma: no cover
    _WORDNET = None

ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
WEIGHT_EXACT, WEIGHT_STEM, WEIGHT_SYN = 1.0, 0.6, 0.8

# METEOR English function-word list (approximation of the jar's data file)
FUNCTION_WORDS = frozenset("""
a an the this that these those some any each every no all both half many much
few little other another such what which who whom whose i you he she it we
they me him her us them my your his its our their mine yours hers ours theirs
myself yourself himself herself itself ourselves yourselves themselves am is
are was were be been being have has had having do does did doing will would
shall should may might must can could ought to of in on at by for with about
against between into through during before after above below from up down out
off over under again further then once here there when where why how and but
or nor so yet if because as until while not only own same than too very s t
don now
""".split())


def _stem(word: str) -> str:
    return _STEMMER.stem(word) if _STEMMER is not None else word


def _synonyms(word: str) -> frozenset:
    if _WORDNET is None:
        return frozenset((word,))
    syns = {word}
    for ss in _WORDNET.synsets(word):
        for lemma in ss.lemmas():
            syns.add(lemma.name().lower())
    return frozenset(syns)


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int, float]]:
    """Stage-ordered alignment: (hyp_idx, ref_idx, module_weight) triples.

    Within a stage each unmatched hyp word takes the closest unmatched ref
    occurrence (minimizes crossings, approximating the jar's beam search).
    """
    matches: List[Tuple[int, int, float]] = []
    hyp_used = [False] * len(hyp)
    ref_used = [False] * len(ref)

    def run_stage(key_h: List, key_r: List, weight: float) -> None:
        for i, kh in enumerate(key_h):
            if hyp_used[i]:
                continue
            best_j = -1
            best_d = None
            for j, kr in enumerate(key_r):
                if ref_used[j]:
                    continue
                hit = (kh & kr) if isinstance(kh, frozenset) else (kh == kr)
                if hit:
                    d = abs(i - j)
                    if best_d is None or d < best_d:
                        best_d, best_j = d, j
            if best_j >= 0:
                hyp_used[i] = True
                ref_used[best_j] = True
                matches.append((i, best_j, weight))

    run_stage(list(hyp), list(ref), WEIGHT_EXACT)
    if _STEMMER is not None:
        run_stage([_stem(w) for w in hyp], [_stem(w) for w in ref], WEIGHT_STEM)
    if _WORDNET is not None:
        run_stage([_synonyms(w) for w in hyp], [_synonyms(w) for w in ref], WEIGHT_SYN)
    return sorted(matches)


def _count_chunks(matches: List[Tuple[int, int, float]]) -> int:
    if not matches:
        return 0
    chunks = 1
    for (h0, r0, _), (h1, r1, _) in zip(matches, matches[1:]):
        if h1 != h0 + 1 or r1 != r0 + 1:
            chunks += 1
    return chunks


def _word_weight(word: str) -> float:
    return 1.0 - DELTA if word in FUNCTION_WORDS else DELTA


class _Stats:
    __slots__ = ("wp_num", "wr_num", "wp_den", "wr_den", "chunks", "match_count")

    def __init__(self):
        self.wp_num = self.wr_num = self.wp_den = self.wr_den = 0.0
        self.chunks = 0
        self.match_count = 0.0

    def add(self, other: "_Stats") -> None:
        self.wp_num += other.wp_num
        self.wr_num += other.wr_num
        self.wp_den += other.wp_den
        self.wr_den += other.wr_den
        self.chunks += other.chunks
        self.match_count += other.match_count


def _segment_stats(hyp_str: str, ref_str: str) -> _Stats:
    hyp = hyp_str.lower().split()
    ref = ref_str.lower().split()
    st = _Stats()
    st.wp_den = sum(_word_weight(w) for w in hyp)
    st.wr_den = sum(_word_weight(w) for w in ref)
    matches = _align(hyp, ref)
    st.wp_num = sum(w * _word_weight(hyp[i]) for i, _, w in matches)
    st.wr_num = sum(w * _word_weight(ref[j]) for _, j, w in matches)
    # fragmentation uses the average unweighted match count (jar convention)
    st.match_count = len(matches)
    st.chunks = _count_chunks(matches)
    return st


def _score_from_stats(st: _Stats) -> float:
    if st.match_count == 0 or st.wp_den == 0 or st.wr_den == 0:
        return 0.0
    p = st.wp_num / st.wp_den
    r = st.wr_num / st.wr_den
    if p + r == 0:
        return 0.0
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    frag = st.chunks / st.match_count
    pen = GAMMA * (frag ** BETA)
    return (1.0 - pen) * fmean


def meteor_score(hyp: str, refs: Sequence[str]) -> float:
    """Best score of ``hyp`` against each reference."""
    if not refs:
        return 0.0
    return max(_score_from_stats(_segment_stats(hyp, r)) for r in refs)


class Meteor:
    """pycocoevalcap-compatible scorer.

    ``gts[id]`` is the reference list and ``res[id]`` the single-element
    hypothesis list (note: the reference's SODA and eval_vc call this with
    swapped roles — that asymmetry is preserved by honoring argument order).
    """

    def method(self) -> str:
        return "METEOR"

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        assert gts.keys() == res.keys()
        ids = sorted(gts.keys(), key=str)
        totals = _Stats()
        seg_scores: List[float] = []
        for i in ids:
            hyp = res[i][0] if isinstance(res[i], (list, tuple)) else res[i]
            refs = gts[i] if isinstance(gts[i], (list, tuple)) else [gts[i]]
            best_stats, best = None, -1.0
            for r in refs:
                st = _segment_stats(hyp, r)
                sc = _score_from_stats(st)
                if sc > best:
                    best, best_stats = sc, st
            seg_scores.append(best)
            if best_stats is not None:
                totals.add(best_stats)
        return _score_from_stats(totals), seg_scores
