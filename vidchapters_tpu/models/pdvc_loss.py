"""PDVC set-prediction criterion, static-shape and jit-safe.

Behavioral port of PDVC's SetCriterion + HungarianMatcher
(PDVC/pdvc/criterion.py:14-258, matcher.py:14-152):

- matcher cost = focal-style class cost + L1 + gIoU over (center, length)
  boxes (matcher.py:75-101), solved on device (ops.matching.auction_lsap);
- sigmoid focal classification loss over one foreground class, scaled by
  num_queries (criterion.py:47-66 with the ``* src_logits.shape[1]`` factor);
- event-count loss: BCE-with-logits against a one-hot count target with a
  Gaussian-smeared coefficient mask and (1 - class_rate) weights
  (criterion.py:202-223);
- L1 + gIoU box losses normalized by total target count (criterion.py:95-127);
- optional self-IoU penalty between matched predictions (criterion.py:116-126;
  the chapters recipe disables it via --no_self_iou, README.md:188-193);
- caption NLL over matched (query, target) pairs (LSTM.py:52-56 build_loss).

Targets are padded: boxes [B, T, 2] (center, length, normalized), valid
[B, T]; captions [B, T, L_cap] word ids (0 = BOS/EOS/pad).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidchapters_tpu.config import PDVCConfig
from vidchapters_tpu.models.pdvc import PDVC, box_cl_to_xy
from vidchapters_tpu.ops.matching import hungarian_match
from vidchapters_tpu.ops.span_ops import generalized_temporal_iou, temporal_iou

Array = jax.Array

# empirical event-count prior from ActivityNet (criterion.py:38-46)
COUNTER_CLASS_RATE = np.array([
    0.0, 0.0, 1.93425917e-1, 4.12129084e-1, 1.88929963e-1, 7.81296833e-2,
    5.09541413e-2, 3.12718553e-2, 1.84833650e-2, 8.39244680e-3,
    6.59406534e-3, 4.49595364e-3, 2.19802178e-3, 1.79838146e-3,
    5.99460486e-4, 4.99550405e-4, 4.99550405e-4, 1.99820162e-4,
    2.99730243e-4, 3.99640324e-4, 2.99730243e-4, 0.0, 1.99820162e-4,
    0.0, 0.0, 0.0, 9.99100809e-5, 9.99100809e-5])


def match_pdvc(pred_logits: Array, pred_boxes: Array, tgt_boxes: Array,
               tgt_valid: Array, cfg: PDVCConfig,
               cost_class: float = 2.0, cost_bbox: float = 5.0,
               cost_giou: float = 2.0, exact: bool = False) -> Array:
    """[B, Q, 1], [B, Q, 2] vs padded targets -> [B, T] query per target."""
    prob = jax.nn.sigmoid(pred_logits[..., 0])  # single fg class

    def one(p, boxes, tb, tv):
        alpha, gamma = cfg.focal_alpha, cfg.focal_gamma
        neg = (1 - alpha) * (p ** gamma) * (-jnp.log(1 - p + 1e-8))
        pos = alpha * ((1 - p) ** gamma) * (-jnp.log(p + 1e-8))
        c_class = (pos - neg)[:, None]  # [Q, 1] -> broadcast over T
        c_class = jnp.broadcast_to(c_class, (p.shape[0], tb.shape[0]))
        c_l1 = jnp.abs(boxes[:, None] - tb[None]).sum(-1)
        c_giou = -generalized_temporal_iou(box_cl_to_xy(boxes), box_cl_to_xy(tb))
        cost = cost_bbox * c_l1 + cost_class * c_class + cost_giou * c_giou
        return hungarian_match(cost, tv, exact=False)

    return jax.vmap(one)(prob, pred_boxes, tgt_boxes, tgt_valid.astype(bool))


def sigmoid_focal_loss(logits: Array, targets: Array, num_boxes: Array,
                       alpha: float, gamma: float) -> Array:
    prob = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss.mean(axis=1).sum() / num_boxes


def optax_sigmoid_ce(logits: Array, labels: Array) -> Array:
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def count_loss(pred_count: Array, tgt_counts: Array, cfg: PDVCConfig,
               gau_mask: bool = True, beta: float = 1.0) -> Array:
    """Gaussian-smeared BCE count loss (criterion.py:202-223)."""
    b, n_bins = pred_count.shape
    max_len = n_bins - 1
    counts = jnp.clip(tgt_counts, 0, max_len)
    onehot = jax.nn.one_hot(counts, n_bins)
    pos = jnp.arange(n_bins, dtype=jnp.float32)
    gaussian = jnp.exp(-(pos[None, :] - counts[:, None].astype(jnp.float32)) ** 2
                       / (2 * 2.0 ** 2))
    weight = jnp.asarray(COUNTER_CLASS_RATE[:n_bins], jnp.float32)
    loss = optax_sigmoid_ce(pred_count, onehot) * (1.0 - weight)[None, :]
    if gau_mask:
        coef = onehot + ((1 - gaussian) ** beta) * (1 - onehot)
    else:
        coef = jnp.ones_like(onehot)
    return (loss * coef).mean(axis=1).mean()


def caption_nll(logprobs: Array, seq: Array, pair_valid: Array) -> Array:
    """Per-pair caption NLL (LSTM.py:52-56): mean over valid tokens of
    -logP(next token), averaged over valid pairs.

    logprobs [N, L-1, V+1] predicting seq[:, 1:]; seq [N, L]; pair_valid [N].
    """
    targets = seq[:, 1:]
    mask = (targets > 0).astype(jnp.float32)
    # include the EOS(0) step right after the last word (reference masks with
    # seq > 0 on input positions: mask[:, :max_len] over input tokens)
    inp_mask = (seq[:, :-1] > 0).astype(jnp.float32)
    inp_mask = jnp.concatenate(
        [jnp.ones_like(inp_mask[:, :1]), inp_mask[:, 1:]], axis=1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    per_pair = (nll * inp_mask).sum(1) / (inp_mask.sum(1) + 1e-6)
    per_pair = per_pair * pair_valid.astype(jnp.float32)
    return per_pair.sum() / jnp.maximum(pair_valid.sum(), 1)


def pdvc_criterion(model: PDVC, params, outputs: Dict[str, Array],
                   targets: Dict[str, Array], cfg: PDVCConfig,
                   self_iou: bool = False) -> Tuple[Array, Dict[str, Array]]:
    """Full loss over all decoder layers + final-layer caption loss.

    ``outputs`` is the model forward dict (layer-stacked); ``targets``:
    boxes [B, T, 2], valid [B, T], captions [B, T, L_cap].
    """
    tgt_boxes = targets["boxes"]
    tgt_valid = targets["valid"].astype(bool)
    b, t = tgt_valid.shape
    num_boxes = jnp.maximum(tgt_valid.sum().astype(jnp.float32), 1.0)
    tgt_counts = tgt_valid.sum(axis=1)

    losses: Dict[str, Array] = {}
    total = 0.0
    n_layers = outputs["pred_logits"].shape[0]
    last_assign = None
    for lid in range(n_layers):
        logits = outputs["pred_logits"][lid]  # [B, Q, 1]
        boxes = outputs["pred_boxes"][lid]
        assign = match_pdvc(logits, boxes, tgt_boxes, tgt_valid, cfg,
                            cost_class=cfg.cls_loss_coef,
                            cost_bbox=cfg.bbox_loss_coef,
                            cost_giou=cfg.giou_loss_coef)
        last_assign = assign
        q = boxes.shape[1]
        safe = jnp.where(assign >= 0, assign, 0)
        valid_pair = (assign >= 0) & tgt_valid

        # focal classification: matched queries are class-0 positives
        fg = jnp.zeros((b, q), bool)
        fg = jax.vmap(lambda f, a, v: f.at[jnp.where(v, a, q)].set(
            True, mode="drop"))(fg, safe, valid_pair)
        onehot = fg[..., None].astype(jnp.float32)
        loss_ce = sigmoid_focal_loss(logits, onehot, num_boxes,
                                     cfg.focal_alpha, cfg.focal_gamma) * q

        # count loss
        loss_counter = count_loss(outputs["pred_count"][lid], tgt_counts, cfg)

        # box losses over matched pairs
        matched = jnp.take_along_axis(boxes, safe[..., None], axis=1)
        l1 = jnp.abs(matched - tgt_boxes).sum(-1)
        giou_mat = jax.vmap(lambda p, g: generalized_temporal_iou(
            box_cl_to_xy(p), box_cl_to_xy(g)))(matched, tgt_boxes)
        giou_diag = jnp.diagonal(giou_mat, axis1=1, axis2=2)
        loss_bbox = jnp.where(valid_pair, l1, 0.0).sum() / num_boxes
        loss_giou = jnp.where(valid_pair, 1.0 - giou_diag, 0.0).sum() / num_boxes

        layer_total = (cfg.cls_loss_coef * loss_ce
                       + cfg.count_loss_coef * loss_counter
                       + cfg.bbox_loss_coef * loss_bbox
                       + cfg.giou_loss_coef * loss_giou)

        if self_iou:
            iou_mat = jax.vmap(lambda p: temporal_iou(
                box_cl_to_xy(p), box_cl_to_xy(p))[0])(matched)
            pair_mask = (valid_pair[:, :, None] & valid_pair[:, None, :])
            upper = jnp.triu(jnp.ones((t, t), bool), k=1)[None]
            n_i = valid_pair.sum(1).astype(jnp.float32)
            denom = jnp.maximum(0.5 * n_i * (n_i - 1), 1.0)
            loss_self_iou = (jnp.where(pair_mask & upper, iou_mat, 0.0)
                             .sum(axis=(1, 2)) / denom).sum()
            losses[f"loss_self_iou_{lid}"] = loss_self_iou
            layer_total = layer_total + loss_self_iou

        suffix = "" if lid == n_layers - 1 else f"_{lid}"
        losses[f"loss_ce{suffix}"] = loss_ce
        losses[f"loss_counter{suffix}"] = loss_counter
        losses[f"loss_bbox{suffix}"] = loss_bbox
        losses[f"loss_giou{suffix}"] = loss_giou
        total = total + layer_total

    # caption loss on final-layer matched pairs
    if "captions" in targets:
        hs_last = outputs["hs"][-1]  # [B, Q, C]
        safe = jnp.where(last_assign >= 0, last_assign, 0)
        feats = jnp.take_along_axis(
            hs_last, safe[..., None], axis=1)  # [B, T, C]
        valid_pair = (last_assign >= 0) & tgt_valid
        n_pairs = b * t
        flat_feats = feats.reshape(n_pairs, -1)
        flat_seq = targets["captions"].reshape(n_pairs, -1)
        # the DSA head deformably samples encoder memory around each matched
        # event's reference point (pdvc.py:390: reference[:, feat_bigids])
        ctx = (model.caption_context(outputs, safe)
               if cfg.caption_decoder_type in ("standard", "dsa") else None)
        logprobs = model.apply({"params": params}, flat_feats, flat_seq, ctx,
                               method=model.caption_logprobs)
        loss_caption = caption_nll(logprobs, flat_seq,
                                   valid_pair.reshape(n_pairs))
        losses["loss_caption"] = loss_caption
        total = total + cfg.caption_loss_coef * loss_caption

    losses["total"] = total
    return total, losses


def pdvc_postprocess(outputs: Dict[str, Array], durations: Array,
                     seq: Optional[Array] = None,
                     cap_logprob_sums: Optional[Array] = None
                     ) -> Dict[str, Array]:
    """Top-k proposals + count-based length (PDVC PostProcess, pdvc.py:534-593).

    Returns per-video sorted scores/boxes(+captions indices); with a single
    foreground class top-k over queries = sorting by sigmoid score.
    """
    logits = outputs["pred_logits"][-1][..., 0]  # [B, Q]
    boxes = outputs["pred_boxes"][-1]  # [B, Q, 2] (c, l)
    prob = jax.nn.sigmoid(logits)
    order = jnp.argsort(-prob, axis=1)
    scores = jnp.take_along_axis(prob, order, axis=1)
    xy = jnp.clip(box_cl_to_xy(boxes), 0.0, 1.0)
    xy = jnp.take_along_axis(xy, order[..., None], axis=1)
    xy = xy * durations[:, None, None]
    eseq_len = jnp.clip(jnp.argmax(outputs["pred_count"][-1], axis=-1), 1)
    out = {"scores": scores, "boxes": xy, "query_order": order,
           "pred_seq_len": eseq_len}
    if seq is not None:
        out["seq"] = jnp.take_along_axis(seq, order[..., None], axis=1)
        out["caption_scores"] = jnp.take_along_axis(cap_logprob_sums, order, axis=1)
    return out
