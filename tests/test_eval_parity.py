"""Anchor the eval stack to the reference's own artifacts (VERDICT r1 #3).

Round 1's eval tests were self-referential fixtures; these tests fail if any
scorer drifts from an independent implementation:

- moment retrieval: our evals/moment.py vs the reference's own evaluator
  (/root/reference/moment_detr/standalone_eval/eval.py, pure numpy,
  importable) run on the reference's shipped sample predictions
  (sample_val_preds.jsonl) against deterministic synthetic GT (the real
  QVHighlights GT jsonl is not in the tree);
- CIDEr: our evals/cider.py vs the reference's vendored pure-Python
  CiderScorer (/root/reference/dvc_eval/pycocoevalcap/cider/);
- BLEU: vs sacrebleu (tokenize='none', no smoothing) — pycocoevalcap's
  bleu math modulo its tiny/small stabilizers;
- ROUGE-L: LCS precision/recall vs Google's rouge_score, recombined with
  the COCO beta=1.2 f-measure.
"""

import importlib.util
import json
import sys

import numpy as np
import pytest

REF = "/root/reference"
SAMPLE_PREDS = f"{REF}/moment_detr/standalone_eval/sample_val_preds.jsonl"


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_eval():
    if REF + "/moment_detr" not in sys.path:
        sys.path.insert(0, REF + "/moment_detr")
    import standalone_eval.eval as ref_eval_mod
    return ref_eval_mod


@pytest.fixture(scope="module")
def sample_submission():
    with open(SAMPLE_PREDS) as f:
        return [json.loads(line) for line in f]


def _synth_gt(submission, clip_len=2.0, duration=None, seed=0):
    """Deterministic GT for the shipped sample predictions.

    With ``duration=None`` the per-query duration and window lengths span
    the chapter-style length-breakdown ranges ((0,60], (60,180],
    (180,3600]) so every range of eval_moment_retrieval is non-empty —
    the reference evaluator crashes on an empty range (eval.py:63-65,
    np.array([]).mean(0)). A fixed ``duration`` (e.g. 150, matching the
    sample predictions' ~75 saliency clips) is used for highlight parity."""
    rng = np.random.default_rng(seed)
    gt = []
    for d in submission:
        dur = duration if duration is not None else float(
            rng.choice([120.0, 400.0, 1200.0, 2400.0]))
        n_windows = int(rng.integers(1, 4))
        windows = []
        preds = d["pred_relevant_windows"]
        for i in range(n_windows):
            base = preds[min(i, len(preds) - 1)]
            jitter = float(rng.uniform(-20, 20))
            st = float(np.clip(base[0] + jitter, 0, dur - clip_len))
            max_len = min(dur - st, 600.0)
            length = float(rng.choice([6.0, 40.0, 90.0, 300.0])) + float(
                rng.uniform(0, 10))
            length = min(length, max_len)
            ed = float(np.clip(st + length, st + clip_len, dur))
            # QVHighlights GT windows are multiples of the clip length
            st = round(st / clip_len) * clip_len
            ed = max(round(ed / clip_len) * clip_len, st + clip_len)
            windows.append([st, min(ed, dur)])
        n_clips = int(dur / clip_len)
        first = windows[0]
        ids = list(range(int(first[0] / clip_len),
                         max(min(int(first[1] / clip_len), n_clips),
                             int(first[0] / clip_len) + 1)))
        gt.append({
            "qid": d["qid"],
            "query": d["query"],
            "vid": d["vid"],
            "duration": dur,
            "relevant_windows": windows,
            "relevant_clip_ids": ids,
            "saliency_scores": [[int(rng.integers(0, 5)) for _ in range(3)]
                                for _ in ids],
        })
    return gt


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = v
    return out


def test_moment_eval_matches_reference_evaluator(ref_eval, sample_submission):
    from vidchapters_tpu.evals.moment import eval_submission

    # MR only: strip saliency so both evaluators skip the HL branch (the
    # sample predictions' saliency vectors assume 150 s videos, while the
    # MR length breakdown needs chapter-scale durations)
    submission = [{k: v for k, v in d.items() if k != "pred_saliency_scores"}
                  for d in sample_submission]
    gt = _synth_gt(submission)
    ref = ref_eval.eval_submission(submission, gt, verbose=False,
                                   dataset="hl")
    ours = eval_submission(submission, gt, dataset="hl")

    ref_flat = _flatten(ref)
    ours_flat = _flatten(ours)
    missing = set(ref_flat) - set(ours_flat)
    assert not missing, f"metrics missing from our evaluator: {missing}"
    for k, v in ref_flat.items():
        assert ours_flat[k] == pytest.approx(v, abs=0.011), (
            f"{k}: ours={ours_flat[k]} ref={v}")
    # the headline keys (incl. R@10s, the VidChapters grounding metric)
    # exist under the reference's exact names
    for k in ("MR-full-mAP", "MR-full-R1@0.5", "MR-full-R1@10s",
              "MR-long-mAP", "MR-short-mAP"):
        assert k in ours["brief"] and k in ref["brief"]


def test_highlight_eval_matches_reference_evaluator(ref_eval,
                                                    sample_submission):
    from vidchapters_tpu.evals.moment import eval_highlight

    gt = _synth_gt(sample_submission, duration=150.0, seed=1)
    ref = ref_eval.eval_highlight(sample_submission, gt, verbose=False)
    ours = eval_highlight(sample_submission, gt)
    ref_flat = _flatten(ref)
    ours_flat = _flatten(ours)
    assert set(ref_flat) <= set(ours_flat)
    for k, v in ref_flat.items():
        assert ours_flat[k] == pytest.approx(v, abs=0.011), (
            f"{k}: ours={ours_flat[k]} ref={v}")


def _random_captions(rng, n_pairs=120):
    vocab = ("the a cat dog man woman runs jumps cooking kitchen video "
             "chapter shows how to make bread slowly quickly red blue "
             "first then finally intro outro recipe mix bake").split()
    gts, res = {}, {}
    for i in range(n_pairs):
        key = f"v{i}"
        n_refs = int(rng.integers(1, 4))
        gts[key] = [" ".join(rng.choice(vocab, size=rng.integers(3, 18)))
                    for _ in range(n_refs)]
        res[key] = [" ".join(rng.choice(vocab, size=rng.integers(2, 16)))]
    # a few exact matches and an empty-ish hypothesis
    res["v0"] = [gts["v0"][0]]
    res["v1"] = ["the"]
    return gts, res


def test_cider_matches_reference_vendored_scorer():
    from vidchapters_tpu.evals.cider import Cider

    scorer_mod = _load_module(
        "ref_cider_scorer",
        f"{REF}/dvc_eval/pycocoevalcap/cider/cider_scorer.py")
    rng = np.random.default_rng(7)
    gts, res = _random_captions(rng)

    ref_scorer = scorer_mod.CiderScorer(n=4, sigma=6.0)
    # our scorer iterates ids str-sorted; feed the reference in that order
    # so the per-item score vectors align
    for k in sorted(gts.keys(), key=str):
        ref_scorer += (res[k][0], gts[k])
    ref_score, ref_scores = ref_scorer.compute_score()

    our_score, our_scores = Cider().compute_score(gts, res)
    assert our_score == pytest.approx(ref_score, rel=1e-9, abs=1e-12)
    # per-item scores align too (order: insertion order of gts)
    np.testing.assert_allclose(
        np.asarray(our_scores, dtype=float),
        np.asarray(ref_scores, dtype=float), rtol=1e-9, atol=1e-12)


def test_bleu_matches_sacrebleu():
    import sacrebleu

    from vidchapters_tpu.evals.bleu import Bleu

    rng = np.random.default_rng(11)
    gts, res = _random_captions(rng)
    corpus, _ = Bleu(4).compute_score(gts, res)

    ids = sorted(gts.keys(), key=str)
    hyps = [res[i][0] for i in ids]
    max_refs = max(len(gts[i]) for i in ids)
    # sacrebleu wants rectangular refs: pad with None
    ref_streams = [[gts[i][j] if j < len(gts[i]) else None for i in ids]
                   for j in range(max_refs)]
    bleu = sacrebleu.corpus_bleu(hyps, ref_streams, smooth_method="none",
                                 tokenize="none", use_effective_order=False)
    assert corpus[3] * 100 == pytest.approx(bleu.score, abs=0.05), (
        f"BLEU-4 ours={corpus[3]*100:.4f} sacrebleu={bleu.score:.4f}")


def test_rouge_matches_google_rouge_score():
    from rouge_score import rouge_scorer

    from vidchapters_tpu.evals.rouge import Rouge

    rng = np.random.default_rng(13)
    gts, res = _random_captions(rng, n_pairs=60)
    ours = Rouge(beta=1.2)
    g = rouge_scorer.RougeScorer(["rougeL"], use_stemmer=False)

    for k in gts:
        mine = ours.calc_score(res[k], gts[k])
        # COCO ROUGE-L: max precision and max recall over refs, then
        # beta=1.2 f-measure; recombine Google's per-ref P/R the same way
        precs, recs = [], []
        for ref in gts[k]:
            s = g.score(ref, res[k][0])["rougeL"]
            precs.append(s.precision)
            recs.append(s.recall)
        p, r = max(precs), max(recs)
        beta2 = 1.2 ** 2
        expected = ((1 + beta2) * p * r / (r + beta2 * p)
                    if (r + beta2 * p) > 0 else 0.0)
        assert mine == pytest.approx(expected, abs=1e-9), (
            f"{k}: ours={mine} expected={expected}")


# ---------------------------------------------------------------------------
# METEOR aligner: beam search vs exhaustive ground truth
# ---------------------------------------------------------------------------


def _brute_best(hyp, ref, by_start):
    """Exhaustive search over all one-to-one non-overlapping match sets;
    returns the optimal (−coverage, chunks, dist, −weight) key."""
    best = [None]

    def rec(i, mask, cov, chunks, dist, wsum, last):
        if i == len(hyp):
            key = (-cov, chunks, dist, -wsum)
            if best[0] is None or key < best[0]:
                best[0] = key
            return
        rec(i + 1, mask, cov, chunks, dist, wsum, last)
        for (s, j, ilen, jlen, w) in by_start[i]:
            span = ((1 << jlen) - 1) << j
            if mask & span:
                continue
            cont = last == (i, j)
            rec(i + ilen, mask | span, cov + ilen + jlen,
                chunks + (0 if cont else 1), dist + abs(i - j),
                wsum + w * (ilen + jlen), (i + ilen, j + jlen))

    rec(0, 0, 0, 0, 0, 0.0, None)
    return best[0]


def test_meteor_beam_alignment_is_optimal_on_short_pairs():
    """The beam aligner must reproduce the exhaustive optimum of the
    meteor-1.5 objective (max coverage, min chunks, min distance, max
    weight) on every short random pair."""
    from vidchapters_tpu.evals import meteor as M

    rng = np.random.default_rng(5)
    vocab = ["the", "cat", "dog", "sat", "ran", "a", "big"]
    for _ in range(300):
        hyp = [vocab[k] for k in rng.integers(0, len(vocab), rng.integers(1, 7))]
        ref = [vocab[k] for k in rng.integers(0, len(vocab), rng.integers(1, 7))]
        by_start = M._candidate_matches(hyp, ref, None)
        matches, chunks = M._align(hyp, ref)
        cov = sum(m[2] + m[3] for m in matches)
        dist = sum(abs(m[0] - m[1]) for m in matches)
        wsum = sum(m[4] * (m[2] + m[3]) for m in matches)
        got = (-cov, chunks, dist, -wsum)
        want = _brute_best(hyp, ref, by_start)
        assert got == want, (hyp, ref, got, want)


def test_meteor_alignment_minimizes_chunks_not_distance():
    """Fixture where greedy closest-position matching yields 4 chunks but
    the chunk-minimal alignment has 2 (the round-1 aligner got this
    wrong)."""
    from vidchapters_tpu.evals.meteor import _align

    matches, chunks = _align("the cat the dog".split(),
                             "the dog the cat".split())
    assert sum(m[2] + m[3] for m in matches) == 8  # full coverage
    assert chunks == 2


def test_meteor_paraphrase_table():
    from vidchapters_tpu.evals.meteor import Meteor, meteor_score

    table = {"film": ["movie"], "great": ["fantastic"],
             "new york city": ["nyc"]}
    m = Meteor(paraphrase_table=table)
    base = Meteor()
    gts = {"a": ["the movie was fantastic"], "b": ["i visited nyc"]}
    res = {"a": ["the film was great"], "b": ["i visited new york city"]}
    with_para, seg_p = m.compute_score(gts, res)
    without, seg_n = base.compute_score(gts, res)
    assert with_para > without
    assert all(p >= n for p, n in zip(seg_p, seg_n))
    # file form round-trips
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for k, vs in table.items():
            for v in vs:
                f.write(f"{k} ||| {v}\n")
        path = f.name
    try:
        m2 = Meteor(paraphrase_table=path)
        again, _ = m2.compute_score(gts, res)
        assert again == pytest.approx(with_para)
    finally:
        os.unlink(path)
