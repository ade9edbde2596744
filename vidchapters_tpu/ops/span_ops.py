"""Temporal span math in jnp (xx <-> cxw, IoU, generalized IoU, NMS).

Conventions follow moment_detr/moment_detr/span_utils.py:4-122 (verified by
its doctests, reproduced in tests): ``xx`` = (start, end), ``cxw`` =
(center, width); gIoU subtracts the normalized enclosing-hull slack.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def span_xx_to_cxw(xx: Array) -> Array:
    center = xx.sum(-1) * 0.5
    width = xx[..., 1] - xx[..., 0]
    return jnp.stack([center, width], axis=-1)


def span_cxw_to_xx(cxw: Array) -> Array:
    x1 = cxw[..., 0] - 0.5 * cxw[..., 1]
    x2 = cxw[..., 0] + 0.5 * cxw[..., 1]
    return jnp.stack([x1, x2], axis=-1)


def temporal_iou(spans1: Array, spans2: Array) -> Tuple[Array, Array]:
    """Pairwise IoU of [N,2] x [M,2] xx spans -> (iou [N,M], union [N,M])."""
    areas1 = spans1[:, 1] - spans1[:, 0]
    areas2 = spans2[:, 1] - spans2[:, 0]
    left = jnp.maximum(spans1[:, None, 0], spans2[None, :, 0])
    right = jnp.minimum(spans1[:, None, 1], spans2[None, :, 1])
    inter = jnp.clip(right - left, 0.0)
    union = areas1[:, None] + areas2[None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
    return iou, union


def generalized_temporal_iou(spans1: Array, spans2: Array) -> Array:
    """Pairwise gIoU of [N,2] x [M,2] xx spans -> [N,M]."""
    iou, union = temporal_iou(spans1, spans2)
    left = jnp.minimum(spans1[:, None, 0], spans2[None, :, 0])
    right = jnp.maximum(spans1[:, None, 1], spans2[None, :, 1])
    enclosing = jnp.clip(right - left, 0.0)
    return iou - jnp.where(enclosing > 0,
                           (enclosing - union) / jnp.maximum(enclosing, 1e-12),
                           0.0)


def temporal_nms_indices(spans: Array, scores: Array, iou_threshold: float,
                         max_keep: int) -> Tuple[Array, Array]:
    """Static-shape greedy temporal NMS.

    Reference semantics: moment_detr/utils/temporal_nms.py:25 (sort by score,
    greedily keep spans whose IoU with every kept span <= threshold). Returns
    (keep_indices [max_keep], valid_mask [max_keep]); jit-safe.
    """
    n = spans.shape[0]
    order = jnp.argsort(-scores)
    spans_sorted = spans[order]
    iou, _ = temporal_iou(spans_sorted, spans_sorted)
    positions = jnp.arange(n)

    def body(i, suppressed):
        is_live = ~suppressed[i]
        overlap = iou[i] > iou_threshold
        return jnp.where(is_live, suppressed | (overlap & (positions > i)),
                         suppressed)

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros(n, bool))
    kept_positions = jnp.nonzero(~suppressed, size=max_keep, fill_value=-1)[0]
    valid = kept_positions >= 0
    src = jnp.where(valid, order[kept_positions.clip(0)], -1)
    return src.astype(jnp.int32), valid
