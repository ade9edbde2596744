import numpy as np
import pytest

from vidchapters_tpu.evals.moment import (
    compute_mr_ap,
    compute_mr_r1,
    detection_ap,
    eval_submission,
    temporal_iou_cross,
    temporal_iou_paired,
)


GT = [
    {"qid": 1, "query": "a", "vid": "v1", "duration": 120.0,
     "relevant_windows": [[10.0, 40.0]]},
    {"qid": 2, "query": "b", "vid": "v2", "duration": 200.0,
     "relevant_windows": [[0.0, 100.0], [150.0, 200.0]]},
]

PERFECT = [
    {"qid": 1, "pred_relevant_windows": [[10.0, 40.0, 0.9]]},
    {"qid": 2, "pred_relevant_windows": [[0.0, 100.0, 0.95], [150.0, 200.0, 0.8]]},
]

BAD = [
    {"qid": 1, "pred_relevant_windows": [[100.0, 110.0, 0.9]]},
    {"qid": 2, "pred_relevant_windows": [[120.0, 130.0, 0.95]]},
]


def test_iou_cross_doctest():
    s1 = np.array([[0, 0.2], [0.5, 1.0]])
    s2 = np.array([[0, 0.3], [0.0, 1.0]])
    iou = temporal_iou_cross(s1, s2)
    np.testing.assert_allclose(iou, [[0.6667, 0.2], [0.0, 0.5]], atol=1e-4)


def test_iou_paired_uses_hull_union():
    # reference quirk: paired IoU divides by enclosing hull (utils.py:27-30)
    pred = np.array([[0.0, 10.0]])
    gt = np.array([[5.0, 15.0]])
    iou = temporal_iou_paired(pred, gt)
    np.testing.assert_allclose(iou, [5.0 / 15.0], atol=1e-6)


def test_detection_ap_perfect():
    gt = np.array([[10.0, 40.0]])
    ap = detection_ap(gt, np.array([[10.0, 40.0]]), np.array([0.9]),
                      [0.5, 0.75, 0.95])
    np.testing.assert_allclose(ap, [1.0, 1.0, 1.0])


def test_detection_ap_locking():
    # two identical predictions on one GT: second is a false positive
    gt = np.array([[10.0, 40.0]])
    ap = detection_ap(gt, np.array([[10.0, 40.0], [10.0, 40.0]]),
                      np.array([0.9, 0.8]), [0.5])
    assert ap[0] == pytest.approx(1.0)  # AP unaffected (GT found at rank 1)


def test_mr_ap_perfect_and_bad():
    perfect = compute_mr_ap(PERFECT, GT)
    assert perfect["average"] == pytest.approx(100.0)
    bad = compute_mr_ap(BAD, GT)
    assert bad["average"] == pytest.approx(0.0)


def test_mr_r1_thresholds_and_distances():
    out = compute_mr_r1(PERFECT, GT)
    assert out["0.5"] == pytest.approx(100.0)
    assert out["10s"] == pytest.approx(100.0)
    out_bad = compute_mr_r1(BAD, GT)
    assert out_bad["0.5"] == pytest.approx(0.0)
    # qid1 bad pred starts at 100 (gt 10): 90s off; qid2 starts 120 vs gt 150
    # (closest-by-iou gt selection): both > 10s
    assert out_bad["10s"] == pytest.approx(0.0)


def test_eval_submission_brief():
    out = eval_submission(PERFECT, GT, dataset="chapters")
    assert out["brief"]["MR-full-mAP"] == pytest.approx(100.0)
    assert out["brief"]["MR-full-R1@10s"] == pytest.approx(100.0)
    assert "full" in out and "short" in out


def test_eval_submission_qid_mismatch():
    with pytest.raises(AssertionError):
        eval_submission(PERFECT[:1], GT, match_number=True)
    out = eval_submission(PERFECT[:1], GT, match_number=False)
    assert out["brief"]["MR-full-mAP"] == pytest.approx(100.0)


def test_postprocessor_detr():
    from vidchapters_tpu.train.postprocessing import PostProcessorDETR

    post = PostProcessorDETR(clip_length=2, min_ts_val=0, max_ts_val=150,
                             min_w_l=2, max_w_l=60,
                             move_window_method="left")
    lines = [{"qid": 1, "pred_relevant_windows": [
        [3.1, 3.9, 0.9],       # too short -> extended to >= 2 then rounded
        [-5.0, 200.0, 0.8],    # clipped to [0, 150], too long -> 60
        [10.0, 30.0, 0.7],     # untouched except rounding
    ]}]
    out = post(lines)[0]["pred_relevant_windows"]
    for st, ed, score in out:
        assert st % 2 == 0 and ed % 2 == 0  # multiples of clip_length
        assert 0 <= st <= ed <= 150
        assert (ed - st) <= 60 + 1e-6
    assert out[0][1] - out[0][0] >= 2
    assert out[2][:2] == [10.0, 30.0]
