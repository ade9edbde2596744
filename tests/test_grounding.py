import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import GroundingConfig
from vidchapters_tpu.models.grounding import (
    MomentDETR,
    grounding_loss,
    postprocess_predictions,
    sine_position_encoding,
)


def tiny_cfg(**kw):
    return GroundingConfig(hidden_dim=32, nheads=4, enc_layers=2, dec_layers=2,
                           dim_feedforward=64, num_queries=5, v_feat_dim=16,
                           t_feat_dim=12, dropout=0.0, input_dropout=0.0, **kw)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = MomentDETR(cfg)
    rng = np.random.default_rng(0)
    b, lv, lt = 2, 20, 7
    src_vid = jnp.asarray(rng.normal(size=(b, lv, 16)), jnp.float32)
    src_vid_mask = jnp.ones((b, lv), jnp.int32).at[0, -5:].set(0)
    src_txt = jnp.asarray(rng.normal(size=(b, lt, 12)), jnp.float32)
    src_txt_mask = jnp.ones((b, lt), jnp.int32).at[1, -2:].set(0)
    params = model.init(jax.random.PRNGKey(0), src_txt, src_txt_mask,
                        src_vid, src_vid_mask)["params"]
    return cfg, model, params, (src_txt, src_txt_mask, src_vid, src_vid_mask)


def test_forward_shapes(setup):
    cfg, model, params, inputs = setup
    out = model.apply({"params": params}, *inputs)
    assert out["pred_logits"].shape == (2, 5, 2)
    assert out["pred_spans"].shape == (2, 5, 2)
    assert out["saliency_scores"].shape == (2, 20)
    assert len(out["aux_outputs"]) == cfg.dec_layers - 1
    spans = np.asarray(out["pred_spans"])
    assert (spans >= 0).all() and (spans <= 1).all()  # sigmoid cxw


def test_sine_position_encoding():
    mask = jnp.ones((1, 10), jnp.int32)
    pos = sine_position_encoding(mask, 32)
    assert pos.shape == (1, 10, 32)
    # positions vary along time
    assert float(jnp.abs(pos[0, 0] - pos[0, 5]).max()) > 0.1


def test_grounding_loss_runs_and_jits(setup):
    cfg, model, params, inputs = setup
    targets = {
        "spans": jnp.asarray([[[0.25, 0.5], [0.75, 0.3], [0.0, 0.0]],
                              [[0.5, 0.8], [0.0, 0.0], [0.0, 0.0]]], jnp.float32),
        "span_valid": jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.int32),
        "saliency_pos_labels": jnp.asarray([[2, 3], [1, 4]], jnp.int32),
        "saliency_neg_labels": jnp.asarray([[15, 16], [10, 11]], jnp.int32),
    }

    @jax.jit
    def loss_fn(params, targets):
        out = model.apply({"params": params}, *inputs)
        return grounding_loss(out, targets, cfg)

    total, losses = loss_fn(params, targets)
    assert np.isfinite(float(total))
    for k in ("loss_span", "loss_giou", "loss_label", "loss_saliency"):
        assert k in losses and np.isfinite(float(losses[k]))
    assert "aux0_loss_span" in losses


def test_grounding_loss_grad_flows(setup):
    cfg, model, params, inputs = setup
    targets = {
        "spans": jnp.asarray([[[0.25, 0.5], [0.75, 0.3], [0.0, 0.0]],
                              [[0.5, 0.8], [0.0, 0.0], [0.0, 0.0]]], jnp.float32),
        "span_valid": jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.int32),
    }

    def loss_fn(params):
        out = model.apply({"params": params}, *inputs)
        return grounding_loss(out, targets, cfg)[0]

    grads = jax.grad(loss_fn)(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                               for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_exact_vs_auction_match_close(setup):
    """The on-device auction matcher should produce the same assignment as
    scipy on typical (non-degenerate) costs."""
    from vidchapters_tpu.models.grounding import _match_batch

    cfg, model, params, inputs = setup
    out = model.apply({"params": params}, *inputs)
    tgt_spans = jnp.asarray([[[0.25, 0.5], [0.75, 0.3], [0.0, 0.0]],
                             [[0.5, 0.8], [0.0, 0.0], [0.0, 0.0]]], jnp.float32)
    tgt_valid = jnp.asarray([[1, 1, 0], [1, 0, 0]], bool)
    exact = np.asarray(_match_batch(out["pred_logits"], out["pred_spans"],
                                    tgt_spans, tgt_valid, cfg, exact=True))
    approx = np.asarray(_match_batch(out["pred_logits"], out["pred_spans"],
                                     tgt_spans, tgt_valid, cfg, exact=False))
    np.testing.assert_array_equal(exact, approx)


def test_postprocess():
    logits = jnp.asarray([[[3.0, 0.0], [0.0, 3.0]]])  # q0 fg, q1 bg
    spans = jnp.asarray([[[0.5, 0.5], [0.9, 0.4]]])
    durations = jnp.asarray([100.0])
    xx, scores = postprocess_predictions(logits, spans, durations)
    assert xx.shape == (1, 2, 2)
    np.testing.assert_allclose(np.asarray(xx[0, 0]), [25.0, 75.0], atol=1e-4)
    assert float(scores[0, 0]) > float(scores[0, 1])
    # clipped to duration
    assert float(xx[0, 1, 1]) <= 100.0


def test_bfloat16_compute_dtype_close_and_trainable(setup):
    """GroundingConfig.dtype wires the matmul compute dtype (the TPU
    recipe pins bfloat16, configs/chapters_momentdetr.json): same params,
    bf16 forward stays close to f32 (softmax/norms/heads run f32), and a
    bf16 train step produces a finite loss and f32 grads."""
    cfg, model, params, inputs = setup
    out32 = model.apply({"params": params}, *inputs)
    model16 = MomentDETR(tiny_cfg(dtype="bfloat16"))
    out16 = model16.apply({"params": params}, *inputs)
    for k in ("pred_logits", "pred_spans", "saliency_scores"):
        assert out16[k].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out16[k]),
                                   np.asarray(out32[k]), atol=0.05, rtol=0.1)

    from vidchapters_tpu.models.grounding import grounding_loss

    b = inputs[0].shape[0]
    targets = {
        "spans": jnp.asarray([[[0.2, 0.1], [0.6, 0.2]]] * b, jnp.float32),
        "span_valid": jnp.ones((b, 2), jnp.int32),
        "saliency_pos_labels": jnp.zeros((b, 2), jnp.int32),
        "saliency_neg_labels": jnp.ones((b, 2), jnp.int32) * 10,
    }

    def loss_fn(p):
        out = model16.apply({"params": p}, *inputs)
        total, _ = grounding_loss(out, targets, model16.cfg)
        return total

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(g.dtype == jnp.float32 for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)
