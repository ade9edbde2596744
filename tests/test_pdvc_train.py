"""PDVC end-to-end slice: train step + inference + rerank + eval."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import PDVCConfig
from vidchapters_tpu.data.pdvc_dataset import PDVCDataset, Translator, pdvc_collate
from vidchapters_tpu.models.pdvc import PDVC
from vidchapters_tpu.train.pdvc_train import (
    PDVCTrainState,
    build_pdvc_optimizer,
    evaluate_pdvc,
    make_pdvc_infer,
    make_pdvc_train_step,
    rerank_proposals,
)


def tiny_cfg():
    return PDVCConfig(hidden_dim=64, nheads=4, enc_layers=1, dec_layers=2,
                      dim_feedforward=128, num_queries=6, num_feature_levels=2,
                      dec_n_points=2, enc_n_points=2, feature_dim=8,
                      frame_embedding_num=16, max_eseq_length=10, dropout=0.0,
                      vocab_size=30, max_caption_len=6, rnn_size=32)


@pytest.mark.slow
def test_pdvc_train_and_eval(tmp_path):
    rng = np.random.default_rng(0)
    ann = {}
    feat_dir = tmp_path / "f"
    feat_dir.mkdir()
    for i in range(2):
        vid = f"wwwwwwwww{i:02d}"
        ann[vid] = {"duration": 80.0,
                    "timestamps": [[0.0, 40.0], [40.0, 80.0]],
                    "sentences": ["mix the batter", "bake the cake"]}
        np.save(feat_dir / f"{vid[-11:]}.npy",
                rng.normal(size=(30, 8)).astype(np.float32))
    ann_path = tmp_path / "a.json"
    ann_path.write_text(json.dumps(ann))

    cfg = tiny_cfg()
    tr = Translator.build([s for a in ann.values() for s in a["sentences"]])
    ds = PDVCDataset(str(ann_path), str(feat_dir), tr, cfg, max_events=3)
    batch = pdvc_collate([ds[0], ds[1]])

    model = PDVC(cfg)
    vf = jnp.asarray(batch["video"])
    mask = jnp.asarray(batch["video_mask"])
    params = model.init({"params": jax.random.PRNGKey(0)}, vf, mask,
                        method=model.init_all)["params"]

    tx = build_pdvc_optimizer(lr=1e-3)
    step = jax.jit(make_pdvc_train_step(model, tx, cfg))
    state = PDVCTrainState(params, tx.init(params), jnp.array(0))
    arrays = {k: jnp.asarray(v) for k, v in batch.items()
              if isinstance(v, np.ndarray)}
    for _ in range(3):
        state, metrics = step(state, arrays, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["total"]))

    infer = make_pdvc_infer(model, cfg)
    results, metrics = evaluate_pdvc(
        infer, state.params, [batch], tr, references=[str(ann_path)])
    assert set(results) == set(ann)
    assert "soda_c" in metrics
    for props in results.values():
        # reranked: truncated to predicted count, sorted by start time
        starts = [p["timestamp"][0] for p in props]
        assert starts == sorted(starts)


def test_rerank_proposals():
    props = [
        {"timestamp": [50.0, 60.0], "proposal_score": 0.9,
         "sentence": "late event", "sentence_score": -1.0,
         "pred_event_count": 2},
        {"timestamp": [0.0, 10.0], "proposal_score": 0.8,
         "sentence": "early event", "sentence_score": -1.0,
         "pred_event_count": 2},
        {"timestamp": [20.0, 30.0], "proposal_score": 0.1,
         "sentence": "weak", "sentence_score": -5.0, "pred_event_count": 2},
    ]
    out = rerank_proposals(props)
    assert len(out) == 2  # truncated to pred_event_count
    assert out[0]["timestamp"][0] < out[1]["timestamp"][0]  # time order
    assert {p["sentence"] for p in out} == {"late event", "early event"}
