import numpy as np
import pytest

from vidchapters_tpu.evals.para import (
    eval_para,
    parse_sent,
    prediction_to_paragraphs,
)
from vidchapters_tpu.runtime.profiler import StepTimer, device_memory_stats


def test_parse_sent():
    assert parse_sent("Mix, the (batter)!") == ["mix", "the", "batter"]


def test_prediction_to_paragraphs_sorted():
    sub = {"v": [
        {"sentence": "second part.", "timestamp": [30.0, 60.0]},
        {"sentence": "first part", "timestamp": [0.0, 30.0]},
    ]}
    out = prediction_to_paragraphs(sub)
    assert out["v"] == "first part. second part."


def test_eval_para_perfect_vs_bad():
    sub = {"results": {"v1": [
        {"sentence": "mix the batter", "timestamp": [0.0, 30.0]},
        {"sentence": "bake the cake", "timestamp": [30.0, 60.0]}]}}
    gt = {"v1": "mix the batter. bake the cake."}
    good = eval_para(sub, [gt])
    assert good["Para_Bleu_1"] > 0.9
    assert good["Para_CIDEr"] >= 0.0
    bad = eval_para({"results": {"v1": [
        {"sentence": "completely unrelated words", "timestamp": [0.0, 60.0]}]}},
        [gt])
    assert bad["Para_Bleu_1"] < good["Para_Bleu_1"]


def test_eval_para_dvc_style_reference():
    sub = {"results": {"v1": [
        {"sentence": "mix the batter", "timestamp": [0.0, 30.0]}]}}
    gt = {"v1": {"duration": 60.0, "timestamps": [[0, 30]],
                 "sentences": ["mix the batter"]}}
    out = eval_para(sub, [gt])
    assert out["Para_Bleu_1"] > 0.9


def test_step_timer():
    t = StepTimer()
    with t.phase("data"):
        pass
    with t.phase("step"):
        pass
    with t.phase("step"):
        pass
    avg = t.averages()
    assert set(avg) == {"data", "step"}
    assert t.counts["step"] == 2
    assert "step:" in t.summary()


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_contrastive_align_loss_runs():
    import jax
    import jax.numpy as jnp

    from vidchapters_tpu.config import GroundingConfig
    from vidchapters_tpu.models.grounding import MomentDETR, grounding_loss

    cfg = GroundingConfig(hidden_dim=32, nheads=4, enc_layers=1, dec_layers=1,
                          dim_feedforward=64, num_queries=4, v_feat_dim=10,
                          t_feat_dim=6, dropout=0.0, input_dropout=0.0,
                          contrastive_align_loss=True, contrastive_hdim=16,
                          aux_loss=False)
    model = MomentDETR(cfg)
    rng = np.random.default_rng(0)
    src_txt = jnp.asarray(rng.normal(size=(2, 5, 6)), jnp.float32)
    txt_mask = jnp.ones((2, 5), jnp.int32)
    src_vid = jnp.asarray(rng.normal(size=(2, 12, 10)), jnp.float32)
    vid_mask = jnp.ones((2, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src_txt, txt_mask, src_vid,
                        vid_mask)["params"]
    out = model.apply({"params": params}, src_txt, txt_mask, src_vid, vid_mask)
    assert out["proj_queries"].shape == (2, 4, 16)
    assert out["proj_txt_mem"].shape == (2, 5, 16)
    targets = {"spans": jnp.asarray([[[0.5, 0.4]], [[0.3, 0.2]]], jnp.float32),
               "span_valid": jnp.asarray([[1], [1]], jnp.int32)}
    total, losses = grounding_loss(out, targets, cfg)
    assert "loss_contrastive_align" in losses
    assert np.isfinite(float(total))
