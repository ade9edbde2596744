"""Grounding orchestrator end-to-end with a tiny CLIP text tower."""

import json

import numpy as np
import pytest

import jax

from vidchapters_tpu.config import GroundingConfig
from vidchapters_tpu.data.clip_tokenizer import CLIPTokenizer
from vidchapters_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder


@pytest.mark.slow
def test_grounding_main_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rows = []
    for i in range(4):
        vid = f"bbbbbbbbb{i:02d}"
        rows.append({"qid": i, "query": f"chapter about topic {i}",
                     "vid": vid, "duration": 90.0,
                     "relevant_windows": [[15.0 * (i % 2), 60.0]]})
        np.save(feat_dir / f"{vid[-11:]}.npy",
                rng.normal(size=(90, 8)).astype(np.float32))
    train_jsonl = tmp_path / "train.jsonl"
    train_jsonl.write_text("\n".join(json.dumps(r) for r in rows))
    val_jsonl = tmp_path / "val.jsonl"
    val_jsonl.write_text("\n".join(json.dumps(r) for r in rows))

    tcfg = CLIPTextConfig(vocab_size=49408, context_length=77, width=16,
                          layers=1, heads=2, output_dim=12, mlp_dim=32,
                          dtype="float32")
    text_encoder = CLIPTextEncoder(tcfg)
    tokenizer = CLIPTokenizer()  # offline fallback ids
    toks = jax.numpy.asarray(tokenizer(["init"]))
    text_params = text_encoder.init(jax.random.PRNGKey(0), toks)["params"]

    cfg = GroundingConfig(hidden_dim=32, nheads=4, enc_layers=1, dec_layers=1,
                          dim_feedforward=64, num_queries=4, v_feat_dim=10,
                          t_feat_dim=12, dropout=0.0, input_dropout=0.0,
                          max_v_l=30, clip_length=3)

    from vidchapters_tpu.train.grounding_main import main

    metrics = main(str(train_jsonl), str(val_jsonl), [str(feat_dir)], cfg,
                   str(tmp_path / "ckpt"), text_encoder=text_encoder,
                   text_params=text_params, clip_tokenizer=tokenizer,
                   n_epochs=2, batch_size=2, eval_every=1,
                   early_stop_patience=0)
    assert "MR-full-mAP" in metrics
    assert (tmp_path / "ckpt" / "log.txt").exists()
