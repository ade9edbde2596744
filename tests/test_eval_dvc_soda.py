import numpy as np
import pytest

from vidchapters_tpu.evals.dvc import DVCEvaluator, eval_dvc, segment_iou
from vidchapters_tpu.evals.soda import chased_dp_assignment, eval_soda, soda_iou


GT = {
    "vid1": {
        "duration": 100.0,
        "timestamps": [[0.0, 30.0], [30.0, 60.0], [60.0, 100.0]],
        "sentences": ["Intro to the topic.", "Main discussion.", "Final conclusion."],
    },
    "vid2": {
        "duration": 50.0,
        "timestamps": [[0.0, 25.0], [25.0, 50.0]],
        "sentences": ["Setting up.", "Wrapping up."],
    },
}

PERFECT_PREDS = {
    "results": {
        vid: [{"sentence": s, "timestamp": list(ts)}
              for s, ts in zip(GT[vid]["sentences"], GT[vid]["timestamps"])]
        for vid in GT
    }
}

BAD_PREDS = {
    "results": {
        "vid1": [{"sentence": "qwerty asdf.", "timestamp": [2.0, 3.0]}],
        "vid2": [{"sentence": "zxcv uiop.", "timestamp": [48.0, 49.0]}],
    }
}


def test_segment_iou():
    assert segment_iou([0, 10], [0, 10]) == pytest.approx(1.0, abs=1e-6)
    assert segment_iou([0, 10], [5, 15]) == pytest.approx(5 / 15, abs=1e-6)
    assert segment_iou([0, 10], [20, 30]) == 0.0
    assert soda_iou([0, 10], [0, 10]) == pytest.approx(1.0, abs=1e-6)


def test_dp_assignment_diagonal():
    scores = np.eye(3)
    max_score, pairs = chased_dp_assignment(scores)
    assert max_score == pytest.approx(3.0)
    assert pairs == [(0, 0), (1, 1), (2, 2)]


def test_dp_assignment_rectangular():
    scores = np.array([[0.9, 0.1, 0.0, 0.0], [0.0, 0.0, 0.8, 0.7]])
    max_score, pairs = chased_dp_assignment(scores)
    assert max_score == pytest.approx(1.7)
    assert pairs == [(0, 0), (1, 2)]


def test_dp_assignment_monotonicity_constraint():
    # cannot take (0,1) and (1,0) together (order-preserving)
    scores = np.array([[0.0, 1.0], [1.0, 0.0]])
    max_score, _ = chased_dp_assignment(scores)
    assert max_score == pytest.approx(1.0)


def test_dp_assignment_large_no_recursion_limit():
    # the reference's recursive DP would RecursionError here (soda.py:101-104)
    scores = np.random.default_rng(0).random((300, 300)) * 0.1
    max_score, pairs = chased_dp_assignment(scores)
    assert max_score > 0
    assert len(pairs) <= 300


def test_eval_dvc_perfect_predictions():
    out = eval_dvc(PERFECT_PREDS, [GT], seed=0)
    assert out["Recall"] == pytest.approx(1.0)
    assert out["Precision"] == pytest.approx(1.0)
    assert out["F1"] == pytest.approx(1.0)
    assert out["CIDEr"] > 1.0  # identical captions
    assert out["METEOR"] > 0.4
    # vid2's 2-word captions have zero 3/4-gram guesses, so its per-video
    # corpus BLEU-4 is ~1e-3 even for perfect output (pycocoevalcap behavior)
    assert out["Bleu_4"] > 0.45
    assert out["Bleu_1"] > 0.9
    assert out["Recall@0.9"] == pytest.approx(1.0)
    assert out["Recall@1s"] == pytest.approx(1.0)


def test_eval_dvc_bad_predictions():
    out = eval_dvc(BAD_PREDS, [GT], seed=0)
    assert out["F1"] < 0.6
    assert out["CIDEr"] < 0.5
    # navigation@1s: vid2's bad pred starts 48s away from any GT start
    assert out["Recall@1s"] < 1.0


def test_eval_dvc_missing_video_skipped():
    preds = {"results": {"vid1": PERFECT_PREDS["results"]["vid1"]}}
    out = eval_dvc(preds, [GT], seed=0)
    assert 0 < out["Recall"] <= 1.0


def test_eval_soda_perfect():
    out = eval_soda(PERFECT_PREDS, [GT])
    assert 0.4 < out["soda_c"] <= 1.0


def test_eval_soda_bad():
    good = eval_soda(PERFECT_PREDS, [GT])["soda_c"]
    bad = eval_soda(BAD_PREDS, [GT])["soda_c"]
    assert bad < good
    assert bad == pytest.approx(0.0, abs=0.05)


def test_eval_soda_empty_prediction_video():
    preds = {"results": {"vid1": PERFECT_PREDS["results"]["vid1"], "vid2": []}}
    out = eval_soda(preds, [GT])
    assert 0 <= out["soda_c"] < 1.0


def test_soda_types_a_b_d():
    from vidchapters_tpu.evals.soda import SODAEvaluator

    ev = SODAEvaluator()
    preds = {vid: PERFECT_PREDS["results"][vid] for vid in GT}
    for soda_type, tious in (("a", [0.3, 0.5, 0.7, 0.9]), ("b", None),
                             ("d", None)):
        out = ev.evaluate(preds, [GT], list(GT), soda_type=soda_type,
                          tious=tious)
        assert 0.0 < out["f1"] <= 1.0, (soda_type, out)
    # soda-d on perfect localization is exactly 1 (pure IoU alignment)
    out_d = ev.evaluate(preds, [GT], list(GT), soda_type="d")
    assert out_d["f1"] == pytest.approx(1.0, abs=1e-6)


def test_eval_dvc_2018_version():
    out = eval_dvc(PERFECT_PREDS, [GT], seed=0, version="2018")
    assert out["Recall"] == pytest.approx(1.0)
    # no navigation metrics in the 2018 scorer
    assert not any(k.endswith("s") and k.startswith("Recall@") for k in out)
    assert "CIDEr" in out


def test_soda_c_perfect_submission_ceiling_is_meteor_fragmentation():
    """The SODA_c ceiling for a PERFECT submission is set by METEOR's
    fragmentation penalty, not 1.0: an identical L-word caption scores
    1 - gamma*(1/L)^beta (0.5184 at L=3), and that literal is exactly the
    per-video F when every event matches with IoU 1. This is the round-5
    diagnosis of the overfit record's soda_c=0.506 vs F1=100/CIDEr=729
    (OVERFIT_TPU.json soda_c_ceiling; tpu_overfit.py docstring)."""
    gt = {"v": {"duration": 90.0,
                "timestamps": [[0.0, 30.0], [30.0, 62.0], [62.0, 90.0]],
                "sentences": ["prepping the pasta", "pasta close up",
                              "final pasta reveal"]}}
    sub = {"results": {"v": [
        {"sentence": s, "timestamp": ts}
        for s, ts in zip(gt["v"]["sentences"], gt["v"]["timestamps"])]}}
    ceiling = 1.0 - 0.6 * (1.0 / 3.0) ** 0.2  # identical 3-word METEOR
    out = eval_soda(sub, [gt])
    assert out["soda_c"] == pytest.approx(ceiling, abs=1e-9)
    # longer identical captions asymptote toward (1 - gamma): the ceiling
    # is a property of caption LENGTH, so real chapter titles (~5+ words)
    # sit higher
    gt7 = {"v": {"duration": 90.0, "timestamps": [[0.0, 90.0]],
                 "sentences": ["seven distinct words fill this caption "
                               "nicely"]}}
    sub7 = {"results": {"v": [{"sentence": gt7["v"]["sentences"][0],
                               "timestamp": [0.0, 90.0]}]}}
    ceiling7 = 1.0 - 0.6 * (1.0 / 7.0) ** 0.2
    assert eval_soda(sub7, [gt7])["soda_c"] == pytest.approx(
        ceiling7, abs=1e-9)
    assert ceiling7 > ceiling
