"""Anchor evals/dvc.py + evals/soda.py to the reference's own machinery.

VERDICT r2 next-round item #1: `evals/dvc.py` and `evals/soda.py` produce
every number the project is judged on, yet were only self-tested. Here the
reference's importable implementations run LIVE against ours:

- /root/reference/dvc_eval/eval_dvc.py (ANETcaptions, the Vid2Seq evaluator)
- /root/reference/PDVC/densevid_eval3/evaluate2018.py + evaluate2021.py
  (the PDVC evaluator generations; 2018 = fixed garbage string, no
  F1/navigation; 2021 = random garbage + navigation metrics)
- /root/reference/dvc_eval/SODA/soda.py (SODA types a/b/c/d and the
  `chased_dp_assignment` DP itself)

The reference modules import `pycocoevalcap` (Java-backed; not installed
here). We register stub modules in sys.modules backed by OUR pure-Python
scorers/tokenizer, so both stacks share identical scorer implementations and
any mismatch isolates the matching/averaging machinery being anchored —
exactly the "inject our scorers" strategy the round-2 VERDICT prescribed.

Garbage-string note: both evaluators score unmatched predictions against
random lowercase gibberish. The gibberish never n-gram/stem-overlaps real
captions, so every scorer gives those pairs 0 regardless of the exact string
drawn, and the anchor tolerances can stay tight (1e-7) even though the two
stacks consume different RNG streams.
"""

import importlib.util
import json
import random
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


# ---------------------------------------------------------------------------
# pycocoevalcap stubs backed by our scorers
# ---------------------------------------------------------------------------


def _normalize(d):
    return {k: [v] if isinstance(v, str) else v for k, v in d.items()}


def _adapter(cls):
    """Wrap one of our scorers so bare-string values (the SODA calling
    convention, SODA/soda.py:63-68) are accepted like the jar wrapper's."""

    class Adapter:
        def __init__(self, *args, **kwargs):
            self._inner = cls(*args, **kwargs)

        def compute_score(self, gts, res):
            return self._inner.compute_score(_normalize(gts), _normalize(res))

        def method(self):
            return self._inner.method()

    return Adapter


@pytest.fixture(scope="module")
def ref_modules():
    """Install pycocoevalcap stubs, then import the reference evaluators."""
    from vidchapters_tpu.evals.bleu import Bleu
    from vidchapters_tpu.evals.cider import Cider
    from vidchapters_tpu.evals.meteor import Meteor
    from vidchapters_tpu.evals.ptb import PTBTokenizer
    from vidchapters_tpu.evals.rouge import Rouge

    stubs = {
        "pycocoevalcap": {},
        "pycocoevalcap.tokenizer": {},
        "pycocoevalcap.tokenizer.ptbtokenizer": {"PTBTokenizer": PTBTokenizer},
        "pycocoevalcap.meteor": {},
        "pycocoevalcap.meteor.meteor": {"Meteor": _adapter(Meteor)},
        "pycocoevalcap.cider": {},
        "pycocoevalcap.cider.cider": {"Cider": _adapter(Cider)},
        "pycocoevalcap.bleu": {},
        "pycocoevalcap.bleu.bleu": {"Bleu": _adapter(Bleu)},
        "pycocoevalcap.rouge": {},
        "pycocoevalcap.rouge.rouge": {"Rouge": _adapter(Rouge)},
    }
    installed = []
    for name, attrs in stubs.items():
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package so submodule imports resolve
        for attr, val in attrs.items():
            setattr(mod, attr, val)
        sys.modules[name] = mod
        installed.append(name)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import dvc_eval as ref_dvc_eval  # noqa: E402  (namespace SODA subpackage)

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    ref_2018 = _load("ref_evaluate2018",
                     f"{REF}/PDVC/densevid_eval3/evaluate2018.py")
    ref_2021 = _load("ref_evaluate2021",
                     f"{REF}/PDVC/densevid_eval3/evaluate2021.py")
    # dvc_eval.SODA resolves to the namespace subpackage, shadowing the
    # class binding from __init__; fetch the class from its module directly
    ref_soda_cls = sys.modules["dvc_eval.SODA.soda"].SODA
    yield {"dvc_eval": ref_dvc_eval, "e2018": ref_2018, "e2021": ref_2021,
           "SODA": ref_soda_cls}


# ---------------------------------------------------------------------------
# shared fixture: synthetic chapters with overlapping / disjoint predictions
# ---------------------------------------------------------------------------

VOCAB = ("intro the a cat dog man woman runs jumps cooking kitchen video "
         "chapter shows how to make bread slowly quickly red blue first "
         "then finally outro recipe mix bake cut serve fry boil").split()


def _sentence(rng, lo=2, hi=12):
    return " ".join(rng.choice(VOCAB, size=int(rng.integers(lo, hi))))


def _make_fixture(seed=3, n_vids=6):
    """GT (two reference files) + predictions exercising every matching path:
    exact matches, partial overlaps at each tIoU band, disjoint preds (the
    garbage-control path), a video missing from the predictions, and a video
    present in only one GT file."""
    rng = np.random.default_rng(seed)
    gt1, gt2, preds = {}, {}, {}
    for i in range(n_vids):
        vid = f"vid{i}"
        dur = float(80 + 50 * i)
        n_ev = int(rng.integers(2, 6))
        bounds = np.sort(rng.uniform(0, dur, 2 * n_ev)).reshape(n_ev, 2)
        ts = [[float(a), float(max(b, a + 1.0))] for a, b in bounds]
        sents = [_sentence(rng) for _ in ts]
        gt1[vid] = {"duration": dur, "timestamps": ts, "sentences": sents}
        if i % 3 != 2:  # vid2, vid5 live only in gt1
            jit = [[max(0.0, a + float(rng.uniform(-3, 3))),
                    b + float(rng.uniform(-3, 3))] for a, b in ts]
            jit = [[a, max(b, a + 1.0)] for a, b in jit]
            gt2[vid] = {"duration": dur, "timestamps": jit,
                        "sentences": [_sentence(rng) for _ in ts]}
        if i == n_vids - 1:
            continue  # last video: GT only, missing from predictions
        props = []
        for j, (a, b) in enumerate(ts):
            kind = j % 3
            if kind == 0:  # near-exact segment, near-copy sentence
                seg = [a + 0.5, b - 0.5] if b - a > 2 else [a, b]
                words = sents[j].split()
                rng.shuffle(words)
                sent = " ".join(words[: max(2, len(words) - 1)])
            elif kind == 1:  # shifted: mid-band IoU
                w = b - a
                seg = [a + 0.4 * w, b + 0.4 * w]
                sent = _sentence(rng)
            else:  # disjoint: garbage-control path
                seg = [min(a + dur / 2, dur - 2), min(b + dur / 2, dur)]
                sent = _sentence(rng)
            props.append({"timestamp": [float(seg[0]), float(seg[1])],
                          "sentence": sent})
        preds[vid] = props
    return gt1, gt2, preds


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dvc_parity")
    gt1, gt2, preds = _make_fixture()
    p1, p2 = tmp / "gt1.json", tmp / "gt2.json"
    p1.write_text(json.dumps(gt1))
    p2.write_text(json.dumps(gt2))
    # evaluate2018.py:75-76 validates all three PREDICTION_FIELDS
    sub = {"results": preds, "version": "VERSION 1.0",
           "external_data": {"used": False}}
    sub_path = tmp / "preds.json"
    sub_path.write_text(json.dumps(sub))
    return {"gt_files": [str(p1), str(p2)], "gt": [gt1, gt2],
            "sub": sub, "sub_path": str(sub_path)}


# ---------------------------------------------------------------------------
# eval_dvc (Vid2Seq evaluator, dvc_eval/eval_dvc.py)
# ---------------------------------------------------------------------------


def test_eval_dvc_matches_reference(ref_modules, fixture_files):
    from vidchapters_tpu.evals.dvc import eval_dvc

    random.seed(0)
    ref = ref_modules["dvc_eval"].eval_dvc(
        fixture_files["sub"], fixture_files["gt_files"], verbose=False)
    ours = eval_dvc(fixture_files["sub"], fixture_files["gt_files"], seed=0)

    assert set(ref) <= set(ours), f"missing keys: {set(ref) - set(ours)}"
    for k, v in ref.items():
        assert ours[k] == pytest.approx(v, abs=1e-7), (
            f"{k}: ours={ours[k]} ref={v}")


def test_eval_dvc_no_lang_matches_reference(ref_modules, fixture_files):
    """Localization-only path: detection + navigation P/R/F1 are pure
    arithmetic, so equality is exact."""
    from vidchapters_tpu.evals.dvc import eval_dvc

    ref = ref_modules["dvc_eval"].eval_dvc(
        fixture_files["sub"], fixture_files["gt_files"], no_lang_eval=True)
    ours = eval_dvc(fixture_files["sub"], fixture_files["gt_files"],
                    no_lang_eval=True)
    assert set(ref) <= set(ours)
    for k, v in ref.items():
        assert ours[k] == pytest.approx(v, abs=1e-12), f"{k}"


def _args(sub, refs, no_lang=False):
    a = types.SimpleNamespace()
    a.submission = sub
    a.references = refs
    a.tious = [0.3, 0.5, 0.7, 0.9]
    a.max_proposals_per_video = 1000
    a.verbose = False
    a.no_lang_eval = no_lang
    return a


def test_eval_dvc_2021_matches_pdvc_reference(ref_modules, fixture_files):
    """densevid_eval3/evaluate2021.main returns raw per-tIoU lists with the
    PDVC key spelling (ROUGE_L); compare against our version='2021' output."""
    from vidchapters_tpu.evals.dvc import eval_dvc

    random.seed(1)
    score = ref_modules["e2021"].main(
        _args(fixture_files["sub_path"], fixture_files["gt_files"]))
    ours = eval_dvc(fixture_files["sub"], fixture_files["gt_files"],
                    seed=1, version="2021")

    tious = [0.3, 0.5, 0.7, 0.9]
    for ref_key, our_key in [("METEOR", "METEOR"), ("CIDEr", "CIDEr"),
                             ("ROUGE_L", "Rouge-L"), ("Bleu_4", "Bleu_4"),
                             ("Bleu_1", "Bleu_1")]:
        assert ours[our_key] == pytest.approx(
            float(np.mean(score[ref_key])), abs=1e-7), ref_key
    for i, t in enumerate(tious):
        assert ours[f"Recall@{t}"] == pytest.approx(score["Recall"][i],
                                                    abs=1e-12)
        assert ours[f"Precision@{t}"] == pytest.approx(score["Precision"][i],
                                                       abs=1e-12)
        assert ours[f"F1@{t}"] == pytest.approx(score["F1"][i], abs=1e-12)
    # navigation metrics ride at indices len(tious)..: spot-check 10s
    for i, d in enumerate([1, 3, 5, 10, 30, 60]):
        assert ours[f"Recall@{d}s"] == pytest.approx(
            score["Recall"][len(tious) + i], abs=1e-12)


def test_eval_dvc_2018_matches_pdvc_reference(ref_modules, fixture_files):
    """2018 generation: fixed 'abc123!@#' garbage string, no navigation
    metrics (evaluate2018.py:219-222,126-131); precision denominator
    `pred_i+1` equals len(preds) for the non-empty prediction lists here."""
    from vidchapters_tpu.evals.dvc import eval_dvc

    score = ref_modules["e2018"].main(
        _args(fixture_files["sub_path"], fixture_files["gt_files"]))
    ours = eval_dvc(fixture_files["sub"], fixture_files["gt_files"],
                    version="2018")

    tious = [0.3, 0.5, 0.7, 0.9]
    for ref_key, our_key in [("METEOR", "METEOR"), ("CIDEr", "CIDEr"),
                             ("ROUGE_L", "Rouge-L"), ("Bleu_4", "Bleu_4")]:
        assert ours[our_key] == pytest.approx(
            float(np.mean(score[ref_key])), abs=1e-7), ref_key
    for i, t in enumerate(tious):
        assert ours[f"Recall@{t}"] == pytest.approx(score["Recall"][i],
                                                    abs=1e-12)
        assert ours[f"Precision@{t}"] == pytest.approx(score["Precision"][i],
                                                       abs=1e-12)
    assert "Recall@10s" not in ours  # 2018 has no navigation metrics


# ---------------------------------------------------------------------------
# SODA (dvc_eval/SODA/soda.py)
# ---------------------------------------------------------------------------


def test_eval_soda_matches_reference(ref_modules, fixture_files):
    from vidchapters_tpu.evals.soda import eval_soda

    ref = ref_modules["dvc_eval"].eval_soda(
        fixture_files["sub_path"], fixture_files["gt_files"])
    ours = eval_soda(fixture_files["sub_path"], fixture_files["gt_files"])
    assert ours["soda_c"] == pytest.approx(ref["soda_c"], abs=1e-9), (
        f"ours={ours['soda_c']} ref={ref['soda_c']}")


def _sorted_fixture():
    """SODA.build skips from_load_files' start-time sorting (soda.py:47-51 vs
    dataset.py:79-81), so feed pre-sorted events to both stacks."""
    gt1, gt2, preds = _make_fixture(seed=9)
    for gt in (gt1, gt2):
        for vid, d in gt.items():
            order = sorted(range(len(d["timestamps"])),
                           key=lambda k: d["timestamps"][k][0])
            d["timestamps"] = [d["timestamps"][k] for k in order]
            d["sentences"] = [d["sentences"][k] for k in order]
    preds = {vid: sorted(p, key=lambda x: x["timestamp"][0])
             for vid, p in preds.items()}
    return gt1, gt2, preds


@pytest.mark.parametrize("soda_type", ["a", "b", "c", "d"])
def test_soda_types_match_reference(ref_modules, soda_type):
    import copy

    from vidchapters_tpu.evals.soda import SODAEvaluator

    gt1, gt2, preds = _sorted_fixture()
    gts = [gt1, gt2]
    gt_vids = [v for v in gt1 if v in preds]
    tious = [0.3, 0.5, 0.7, 0.9] if soda_type == "a" else None

    RefSODA = ref_modules["SODA"]
    # build() mutates preds/gts in place during preprocess -> deep copies
    ref_ev = RefSODA.build(copy.deepcopy(preds), copy.deepcopy(gts),
                           list(gt_vids), soda_type=soda_type, tious=tious)
    ref = ref_ev.evaluate()["Meteor"]  # [precision, recall, f1]

    ours = SODAEvaluator().evaluate(preds, gts, gt_vids,
                                    soda_type=soda_type, tious=tious)
    assert ours["precision"] == pytest.approx(ref[0], abs=1e-9), soda_type
    assert ours["recall"] == pytest.approx(ref[1], abs=1e-9), soda_type
    assert ours["f1"] == pytest.approx(ref[2], abs=1e-9), soda_type


def test_chased_dp_assignment_matches_reference(ref_modules):
    """The DP core itself: our iterative version vs the reference's
    recursive one (soda.py:151-188) on random matrices, including shapes
    long enough to matter and degenerate 1-row/1-col cases."""
    from vidchapters_tpu.evals.soda import chased_dp_assignment

    RefSODA = ref_modules["SODA"]
    rng = np.random.default_rng(17)
    shapes = [(1, 1), (1, 7), (7, 1), (3, 5), (12, 9), (30, 40)]
    for shape in shapes:
        for _ in range(5):
            m = rng.uniform(0, 1, shape)
            if rng.uniform() < 0.3:
                m[m < 0.5] = 0.0  # sparse like thresholded IoU matrices
            ref_score, ref_pairs = RefSODA.chased_dp_assignment(None, m)
            our_score, our_pairs = chased_dp_assignment(m)
            assert our_score == pytest.approx(ref_score, abs=1e-12), shape
            assert [tuple(p) for p in our_pairs] == \
                   [tuple(p) for p in ref_pairs], (shape, m)


def test_eval_vc_matches_reference(ref_modules):
    """dvc_eval/eval_vc.py COCOEvalCap run live with our scorers injected
    vs our evals/captioning.py on identical clip-caption fixtures (the
    GT-boundary VC task's metric, vc.py:169-170)."""
    from vidchapters_tpu.evals.captioning import eval_vc

    rng = np.random.default_rng(21)
    vocab = ("chapter intro recipe mix bake bread the a how to make serve "
             "first second part outro").split()
    results = {}
    for i in range(40):
        gt = " ".join(rng.choice(vocab, size=int(rng.integers(2, 9))))
        if i % 4 == 0:
            pred = gt  # exact matches
        else:
            pred = " ".join(rng.choice(vocab, size=int(rng.integers(2, 9))))
        results[f"clip{i}"] = {"sentence": pred, "gt": gt}

    RefCoco = ref_modules["dvc_eval"].COCOEvalCap
    ref_out = RefCoco(dict(results)).evaluate()
    ours = eval_vc(results)
    assert set(ref_out) <= set(ours)
    for k, v in ref_out.items():
        assert ours[k] == pytest.approx(v, abs=1e-9), (
            f"{k}: ours={ours[k]} ref={v}")
