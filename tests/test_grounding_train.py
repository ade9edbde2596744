"""End-to-end grounding slice: dataset -> collate -> train step -> eval."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import GroundingConfig
from vidchapters_tpu.data.clip_tokenizer import CLIPTokenizer, CONTEXT_LENGTH
from vidchapters_tpu.data.grounding_dataset import (
    GroundingDataset,
    grounding_collate,
)
from vidchapters_tpu.models.grounding import MomentDETR
from vidchapters_tpu.train.grounding_train import (
    GroundingTrainState,
    build_grounding_optimizer,
    evaluate_grounding,
    make_grounding_infer,
    make_grounding_train_step,
    predictions_to_submission,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("grounding")
    rng = np.random.default_rng(0)
    rows = []
    feat_dir = tmp / "feats"
    feat_dir.mkdir()
    for i, vid in enumerate(["aaaaaaaaaa1", "aaaaaaaaaa2"]):
        rows.append({"qid": i, "query": f"chapter title {i}", "vid": vid,
                     "duration": 120.0,
                     "relevant_windows": [[10.0 * (i + 1), 60.0]]})
        np.save(feat_dir / f"{vid}.npy",
                rng.normal(size=(120, 8)).astype(np.float32))
    jsonl = tmp / "train.jsonl"
    jsonl.write_text("\n".join(json.dumps(r) for r in rows))
    ds = GroundingDataset(str(jsonl), [str(feat_dir)], max_v_l=40, clip_len=3,
                          downsample=True)
    return ds, rows


def test_dataset_example(dataset):
    ds, rows = dataset
    ex = ds[0]
    # 120 frames / clip_len 3 = 40 clips; +2 TEF dims
    assert ex["video_feat"].shape == (40, 10)
    assert ex["spans"].shape == (1, 2)
    # span normalized over ctx_l * clip_len = 120s: [10, 60] -> cx .29, w .42
    np.testing.assert_allclose(ex["spans"][0], [35 / 120, 50 / 120], atol=1e-5)
    assert len(ex["saliency_pos"]) == 2


def test_collate_static(dataset):
    ds, _ = dataset
    batch = grounding_collate([ds[0], ds[1]], max_v_l=40, max_spans=3)
    assert batch["video_feat"].shape == (2, 40, 10)
    assert batch["spans"].shape == (2, 3, 2)
    assert batch["span_valid"].sum() == 2


def test_clip_tokenizer_fallback_shapes():
    tok = CLIPTokenizer()
    out = tok(["hello world", "a"])
    assert out.shape == (2, CONTEXT_LENGTH)
    assert out[0, 0] == 49406  # SOT
    assert 49407 in out[0]  # EOT
    # deterministic
    np.testing.assert_array_equal(out, tok(["hello world", "a"]))


def test_train_step_and_eval(dataset):
    ds, rows = dataset
    cfg = GroundingConfig(hidden_dim=32, nheads=4, enc_layers=1, dec_layers=2,
                          dim_feedforward=64, num_queries=4, v_feat_dim=10,
                          t_feat_dim=6, dropout=0.0, input_dropout=0.0,
                          max_v_l=40)
    model = MomentDETR(cfg)
    batch = grounding_collate([ds[0], ds[1]], max_v_l=40, max_spans=3)
    # precomputed text features path (no CLIP weights offline)
    rng = np.random.default_rng(1)
    batch["query_feat"] = rng.normal(size=(2, 5, 6)).astype(np.float32)
    batch["query_mask"] = np.ones((2, 5), np.int32)

    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch["query_feat"]),
                        jnp.asarray(batch["query_mask"]),
                        jnp.asarray(batch["video_feat"]),
                        jnp.asarray(batch["video_mask"]))["params"]
    tx = build_grounding_optimizer(lr=1e-3)
    train_step = jax.jit(make_grounding_train_step(model, None, None, tx, cfg))
    state = GroundingTrainState(params, tx.init(params), jnp.array(0))
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()
               if not isinstance(v, list)}
    losses = []
    for _ in range(4):
        state, metrics = train_step(state, batch_j, jax.random.PRNGKey(0))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 4

    infer = make_grounding_infer(model, None, None)
    _, metrics = evaluate_grounding(
        infer, state.params, [batch], rows, tokenizer=None)
    assert "MR-full-R1@10s" in metrics["brief"]
    assert 0 <= metrics["brief"]["MR-full-mAP"] <= 100


def test_predictions_to_submission_nms():
    spans = np.array([[[0, 10], [1, 11], [50, 60], [51, 59]]], np.float32)
    scores = np.array([[0.9, 0.8, 0.95, 0.7]], np.float32)
    rows = predictions_to_submission([7], spans, scores, nms_threshold=0.5)
    kept = rows[0]["pred_relevant_windows"]
    assert len(kept) == 2
    assert kept[0][2] == pytest.approx(0.95)
