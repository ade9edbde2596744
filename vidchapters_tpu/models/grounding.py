"""Chapter-grounding model (Moment-DETR equivalent) in Flax.

Architecture per moment_detr/moment_detr/model.py:19-196 + transformer.py:
LayerNorm->Dropout->Linear(+ReLU) input projections for video and text
features, sine position encoding over valid video clips
(position_encoding.py:35-72, normalized), a post-norm DETR transformer
(2 enc + 2 dec layers, pos added to q/k only), learned moment queries, and
three heads: 3-layer span MLP with (center, width) sigmoid, 2-way
foreground/background classifier, and a per-clip saliency score on the video
memory (model.py:64-66,177).

The frozen CLIP text encoder the reference runs inline (model.py:53-56,
94-107) is factored out: this model consumes text features, produced either
offline or by ``models.clip.CLIPTextEncoder``. TPU-first: everything is
static-shape; masks are additive biases.

The criterion (SetCriterion, model.py:198-330) is implemented in
``grounding_loss`` with fixed-size padded targets and the jit-safe Hungarian
from ops.matching.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidchapters_tpu.config import GroundingConfig
from vidchapters_tpu.ops.matching import hungarian_match
from vidchapters_tpu.ops.span_ops import (
    generalized_temporal_iou,
    span_cxw_to_xx,
)

Array = jax.Array
NEG_INF = -1e9


def sine_position_encoding(mask: Array, dim: int, temperature: float = 10000.0,
                           normalize: bool = True) -> Array:
    """[B, L] validity mask -> [B, L, dim] sine embedding over cumsum positions."""
    x_embed = jnp.cumsum(mask.astype(jnp.float32), axis=1)
    if normalize:
        x_embed = x_embed / (x_embed[:, -1:] + 1e-6) * (2 * math.pi)
    dim_t = jnp.arange(dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / dim)
    pos = x_embed[:, :, None] / dim_t
    pos = jnp.stack([jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])],
                    axis=3).reshape(pos.shape[0], pos.shape[1], dim)
    return pos


class InputProj(nn.Module):
    """LayerNorm -> Dropout -> Linear (+ReLU) stack (model.py LinearLayer)."""

    hidden_dim: int
    n_layers: int = 2
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        relu_flags = [True] * 3
        relu_flags[self.n_layers - 1] = False
        for i in range(self.n_layers):
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm_{i}")(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if relu_flags[i]:
                x = jax.nn.relu(x)
        return x


class MHAttention(nn.Module):
    """Scaled multi-head attention with separate q/k/v inputs + key mask.

    ``dtype`` is the matmul compute dtype (GroundingConfig.dtype; params
    stay float32); scores and softmax run in float32 regardless.
    """

    dim: int
    heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array,
                 key_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        d_head = self.dim // self.heads
        b, lq, _ = q.shape
        lk = k.shape[1]
        dt = self.dtype
        qh = nn.Dense(self.dim, dtype=dt, name="q")(q).reshape(
            b, lq, self.heads, d_head)
        kh = nn.Dense(self.dim, dtype=dt, name="k")(k).reshape(
            b, lk, self.heads, d_head)
        vh = nn.Dense(self.dim, dtype=dt, name="v")(v).reshape(
            b, lk, self.heads, d_head)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(d_head)
        if key_mask is not None:
            scores = scores + (1.0 - key_mask.astype(jnp.float32))[:, None, None, :] * NEG_INF
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh,
                         preferred_element_type=jnp.float32
                         ).astype(dt).reshape(b, lq, self.dim)
        return nn.Dense(self.dim, dtype=dt, name="out")(out)


class EncoderLayer(nn.Module):
    cfg: GroundingConfig

    @nn.compact
    def __call__(self, src: Array, mask: Array, pos: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        qk = src + pos
        h = MHAttention(cfg.hidden_dim, cfg.nheads, cfg.dropout, dtype=dt,
                        name="self_attn")(
            qk, qk, src, key_mask=mask, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            src + nn.Dropout(cfg.dropout, deterministic=deterministic)(h))
        h = nn.Dense(cfg.dim_feedforward, dtype=dt, name="ff1")(src)
        h = nn.Dropout(cfg.dropout, deterministic=deterministic)(jax.nn.relu(h))
        h = nn.Dense(cfg.hidden_dim, dtype=dt, name="ff2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(
            src + nn.Dropout(cfg.dropout, deterministic=deterministic)(h))


class DecoderLayer(nn.Module):
    cfg: GroundingConfig

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, mem_mask: Array,
                 pos: Array, query_pos: Array,
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        qk = tgt + query_pos
        h = MHAttention(cfg.hidden_dim, cfg.nheads, cfg.dropout, dtype=dt,
                        name="self_attn")(
            qk, qk, tgt, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            tgt + nn.Dropout(cfg.dropout, deterministic=deterministic)(h))
        h = MHAttention(cfg.hidden_dim, cfg.nheads, cfg.dropout, dtype=dt,
                        name="cross_attn")(
            tgt + query_pos, memory + pos, memory, key_mask=mem_mask,
            deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(
            tgt + nn.Dropout(cfg.dropout, deterministic=deterministic)(h))
        h = nn.Dense(cfg.dim_feedforward, dtype=dt, name="ff1")(tgt)
        h = nn.Dropout(cfg.dropout, deterministic=deterministic)(jax.nn.relu(h))
        h = nn.Dense(cfg.hidden_dim, dtype=dt, name="ff2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(
            tgt + nn.Dropout(cfg.dropout, deterministic=deterministic)(h))


class SpanMLP(nn.Module):
    """3-layer ReLU MLP span head (model.py MLP)."""

    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = jax.nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name="fc0")(x))
        x = jax.nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name="fc1")(x))
        return nn.Dense(self.out_dim, name="fc2")(x.astype(jnp.float32))


class MomentDETR(nn.Module):
    cfg: GroundingConfig

    @nn.compact
    def __call__(self, src_txt: Array, src_txt_mask: Array,
                 src_vid: Array, src_vid_mask: Array,
                 src_speech: Optional[Array] = None,
                 src_speech_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Dict[str, Array]:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)  # matmul compute dtype; params stay f32
        vid = InputProj(cfg.hidden_dim, dropout=cfg.input_dropout, dtype=dt,
                        name="input_vid_proj")(src_vid, deterministic)
        txt = InputProj(cfg.hidden_dim, dropout=cfg.input_dropout, dtype=dt,
                        name="input_txt_proj")(src_txt, deterministic)
        parts = [vid, txt]
        masks = [src_vid_mask, src_txt_mask]
        pos_vid = sine_position_encoding(src_vid_mask, cfg.hidden_dim)
        poss = [pos_vid, jnp.zeros_like(txt)]
        if cfg.use_speech and src_speech is not None:
            sp = nn.Dense(cfg.hidden_dim, dtype=dt,
                          name="speech_proj")(src_speech)
            parts.append(sp)
            masks.append(src_speech_mask)
            poss.append(jnp.zeros_like(sp))
        src = jnp.concatenate(parts, axis=1)
        mask = jnp.concatenate(masks, axis=1)
        pos = jnp.concatenate(poss, axis=1)

        memory = src
        for i in range(cfg.enc_layers):
            memory = EncoderLayer(cfg, name=f"enc_{i}")(memory, mask, pos,
                                                        deterministic)

        query_pos = self.param("query_embed", nn.initializers.normal(1.0),
                               (cfg.num_queries, cfg.hidden_dim), jnp.float32)
        b = src.shape[0]
        query_pos_b = jnp.broadcast_to(query_pos[None], (b,) + query_pos.shape)
        tgt = jnp.zeros_like(query_pos_b)
        dec_norm = nn.LayerNorm(epsilon=1e-5, name="dec_norm")
        intermediates = []
        for i in range(cfg.dec_layers):
            tgt = DecoderLayer(cfg, name=f"dec_{i}")(
                tgt, memory, mask, pos, query_pos_b, deterministic)
            # DETR return_intermediate: shared final norm on every layer
            intermediates.append(dec_norm(tgt))
        hs = jnp.stack(intermediates)  # [layers, B, Q, D]

        span_dim = 2 if cfg.span_loss_type == "l1" else cfg.max_v_l * 2
        spans = SpanMLP(cfg.hidden_dim, span_dim, dtype=dt,
                        name="span_embed")(hs)
        if cfg.span_loss_type == "l1":
            spans = jax.nn.sigmoid(spans)
        logits = nn.Dense(2, name="class_embed")(hs.astype(jnp.float32))

        vid_len = src_vid.shape[1]
        vid_mem = memory[:, :vid_len].astype(jnp.float32)
        saliency = nn.Dense(1, name="saliency_proj")(vid_mem)[..., 0]

        out = {
            "pred_logits": logits[-1],
            "pred_spans": spans[-1],
            "saliency_scores": saliency,
        }
        if cfg.contrastive_align_loss:  # model.py:85-90,168-176
            txt_mem = memory[:, vid_len:vid_len + src_txt.shape[1]]
            norm = lambda x: x / (jnp.linalg.norm(x, axis=-1, keepdims=True)
                                  + 1e-6)
            out["proj_queries"] = norm(nn.Dense(
                cfg.contrastive_hdim, name="contrastive_query_proj")(hs[-1]))
            out["proj_txt_mem"] = norm(nn.Dense(
                cfg.contrastive_hdim, name="contrastive_txt_proj")(txt_mem))
            out["proj_vid_mem"] = norm(nn.Dense(
                cfg.contrastive_hdim, name="contrastive_vid_proj")(vid_mem))
        if cfg.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": logits[i], "pred_spans": spans[i]}
                for i in range(cfg.dec_layers - 1)
            ]
        return out


# ---------------------------------------------------------------------------
# Criterion (SetCriterion equivalent; fixed-size padded targets)
# ---------------------------------------------------------------------------

FOREGROUND, BACKGROUND = 0, 1


def _match_batch(pred_logits: Array, pred_spans: Array, tgt_spans: Array,
                 tgt_valid: Array, cfg: GroundingConfig,
                 exact: bool = True) -> Array:
    """Per-example Hungarian assignment (matcher.py:37-117).

    Returns [B, T] query index per target (-1 when padded)."""
    probs = jax.nn.softmax(pred_logits, axis=-1)  # [B, Q, 2]

    def cost_fn(logp, spans, tspans):
        cost_class = -logp[:, FOREGROUND][:, None]  # [Q, 1] broadcast over T
        cost_class = jnp.broadcast_to(cost_class, (spans.shape[0], tspans.shape[0]))
        cost_l1 = jnp.abs(spans[:, None, :] - tspans[None, :, :]).sum(-1)
        cost_giou = -generalized_temporal_iou(span_cxw_to_xx(spans),
                                              span_cxw_to_xx(tspans))
        return (cfg.set_cost_span * cost_l1 + cfg.set_cost_giou * cost_giou
                + cfg.set_cost_class * cost_class)

    if exact:  # host oracle: only valid outside jit (tests / CPU eval)
        return jnp.stack([
            hungarian_match(cost_fn(probs[b], pred_spans[b], tgt_spans[b]),
                            tgt_valid[b], exact=True)
            for b in range(pred_spans.shape[0])])
    return jax.vmap(lambda l, s, ts, tv: hungarian_match(
        cost_fn(l, s, ts), tv, exact=False))(
        probs, pred_spans, tgt_spans, tgt_valid)


def grounding_loss(outputs: Dict[str, Array], targets: Dict[str, Array],
                   cfg: GroundingConfig, exact_match: bool = False
                   ) -> Tuple[Array, Dict[str, Array]]:
    """Weighted sum of span L1 + gIoU + label CE + saliency margin losses.

    ``targets``: spans [B, T, 2] (cxw, normalized), span_valid [B, T] bool,
    optionally saliency_pos/neg_labels [B, P]. Matches model.py:367-434 with
    aux-layer losses (aux_loss path) when present.
    """
    losses: Dict[str, Array] = {}
    tgt_spans = targets["spans"]
    tgt_valid = targets["span_valid"].astype(bool)
    num_spans = jnp.maximum(tgt_valid.sum(), 1)

    def layer_losses(pred_logits, pred_spans, prefix=""):
        assign = _match_batch(pred_logits, pred_spans, tgt_spans, tgt_valid,
                              cfg, exact=exact_match)  # [B, T]
        b, t = assign.shape
        q = pred_spans.shape[1]
        safe_assign = jnp.where(assign >= 0, assign, 0)
        matched_spans = jnp.take_along_axis(
            pred_spans, safe_assign[..., None], axis=1)  # [B, T, 2]
        valid = (assign >= 0) & tgt_valid
        l1 = jnp.abs(matched_spans - tgt_spans).sum(-1)
        giou_mat = jax.vmap(lambda p, g: generalized_temporal_iou(
            span_cxw_to_xx(p), span_cxw_to_xx(g)))(matched_spans, tgt_spans)
        giou_diag = jnp.diagonal(giou_mat, axis1=1, axis2=2)
        loss_span = jnp.where(valid, l1, 0.0).sum() / num_spans
        loss_giou = jnp.where(valid, 1.0 - giou_diag, 0.0).sum() / num_spans

        # labels: matched queries are foreground; others background with
        # eos_coef weight (model.py:286-301)
        fg = jnp.zeros((b, q), bool)
        fg = jax.vmap(lambda f, a, v: f.at[jnp.where(v, a, q)].set(
            True, mode="drop"))(fg, safe_assign, valid)
        logp = jax.nn.log_softmax(pred_logits, axis=-1)
        ce = -jnp.where(fg, logp[..., FOREGROUND], logp[..., BACKGROUND])
        weight = jnp.where(fg, 1.0, cfg.eos_coef)
        loss_label = (ce * weight).mean()

        losses[prefix + "loss_span"] = loss_span
        losses[prefix + "loss_giou"] = loss_giou
        losses[prefix + "loss_label"] = loss_label
        return (cfg.span_loss_coef * loss_span + cfg.giou_loss_coef * loss_giou
                + cfg.label_loss_coef * loss_label)

    total = layer_losses(outputs["pred_logits"], outputs["pred_spans"])
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        total = total + layer_losses(aux["pred_logits"], aux["pred_spans"],
                                     prefix=f"aux{i}_")

    if cfg.contrastive_align_loss and "proj_queries" in outputs:
        # NCE between matched queries and text tokens (model.py:305-322)
        q_proj = outputs["proj_queries"]  # [B, Q, h]
        t_proj = outputs["proj_txt_mem"]  # [B, Lt, h]
        logits_nce = jnp.einsum("bqh,bth->bqt", q_proj, t_proj).sum(2) / 0.07
        assign = _match_batch(outputs["pred_logits"], outputs["pred_spans"],
                              tgt_spans, tgt_valid, cfg, exact=exact_match)
        b, q = logits_nce.shape
        safe = jnp.where(assign >= 0, assign, 0)
        vmask = (assign >= 0) & tgt_valid
        pos_map = jnp.zeros((b, q), bool)
        pos_map = jax.vmap(lambda f, a, v: f.at[jnp.where(v, a, q)].set(
            True, mode="drop"))(pos_map, safe, vmask)
        pos_term = jnp.where(pos_map, logits_nce, 0.0).sum(1)
        num_pos = jnp.maximum(pos_map.sum(1), 1)
        neg_term = jax.nn.logsumexp(logits_nce, axis=1)
        loss_nce = (-pos_term / num_pos + neg_term).mean()
        losses["loss_contrastive_align"] = loss_nce
        total = total + loss_nce

    if "saliency_pos_labels" in targets:
        s = outputs["saliency_scores"]  # [B, L]
        pos_idx = targets["saliency_pos_labels"]  # [B, P]
        neg_idx = targets["saliency_neg_labels"]
        pos = jnp.take_along_axis(s, pos_idx, axis=1)
        neg = jnp.take_along_axis(s, neg_idx, axis=1)
        n_pairs = pos_idx.shape[1]
        loss_sal = jnp.clip(cfg.saliency_margin + neg - pos, 0.0).sum() / (
            s.shape[0] * n_pairs) * 2.0
        losses["loss_saliency"] = loss_sal
        total = total + cfg.lw_saliency * loss_sal

    losses["total"] = total
    return total, losses


def postprocess_predictions(pred_logits: Array, pred_spans: Array,
                            durations: Array,
                            min_w_l: float = 2.0, max_w_l: float = 0.0,
                            round_multiple: int = 1) -> Tuple[Array, Array]:
    """Span decode + confidence (inference.py:88-165 + PostProcessorDETR):
    softmax foreground prob as score; (cx,w) -> (st,ed) scaled to seconds,
    clipped to [0, duration]. Returns (spans_sec [B,Q,2], scores [B,Q])."""
    prob = jax.nn.softmax(pred_logits, axis=-1)[..., FOREGROUND]
    xx = span_cxw_to_xx(pred_spans) * durations[:, None, None]
    xx = jnp.clip(xx, 0.0, durations[:, None, None])
    if round_multiple > 1:
        xx = jnp.round(xx / round_multiple) * round_multiple
    st = xx[..., 0]
    ed = jnp.maximum(xx[..., 1], st + min_w_l)
    ed = jnp.minimum(ed, durations[:, None])
    return jnp.stack([st, ed], axis=-1), prob
