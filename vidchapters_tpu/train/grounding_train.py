"""Chapter-grounding training + inference (Moment-DETR task).

TPU-native counterpart of moment_detr/moment_detr/train.py:40-179 +
inference.py:88-274: one jit'd step runs the frozen CLIP text encoder, the
grounding transformer, the Hungarian-matched losses, AdamW with StepLR decay,
and grad clipping; evaluation decodes spans + scores, applies the
PostProcessor clipping/rounding (postprocessing_moment_detr.py:9-70) and
optional temporal NMS, and scores with evals.moment.eval_submission.

The reference replicates the model per-GPU with nn.DataParallel
(inference.py:207); here batches shard over the mesh's data axis and XLA
averages gradients.
"""

from __future__ import annotations


from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vidchapters_tpu.config import GroundingConfig
from vidchapters_tpu.models.clip import CLIPTextEncoder
from vidchapters_tpu.models.grounding import (
    MomentDETR,
    grounding_loss,
    postprocess_predictions,
)
from vidchapters_tpu.ops.span_ops import temporal_nms_indices


class GroundingTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def build_grounding_optimizer(lr: float = 1e-4, weight_decay: float = 1e-4,
                              lr_drop_step: int = 400, gamma: float = 0.1,
                              clip_norm: float = 0.1,
                              steps_per_epoch: int = 1
                              ) -> optax.GradientTransformation:
    """AdamW + StepLR(lr_drop) + grad clip (moment_detr train.py:210-211,
    config defaults lr 1e-4, wd 1e-4, lr_drop 400 epochs, grad_clip 0.1)."""
    schedule = optax.exponential_decay(
        lr, transition_steps=lr_drop_step * steps_per_epoch,
        decay_rate=gamma, staircase=True)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, weight_decay=weight_decay))


def make_grounding_train_step(model: MomentDETR,
                              text_encoder: Optional[CLIPTextEncoder],
                              text_params,
                              tx: optax.GradientTransformation,
                              cfg: GroundingConfig,
                              speech_encoder=None,
                              speech_params=None) -> Callable:
    """Text params are frozen (model.py:53-56); only grounding params train.
    With ``cfg.use_speech``, batches carry BERT-tokenized ASR
    (``speech_tokens``) run through a frozen ``speech_encoder`` (the
    reference's in-model BERT + bert_proj, model.py:131-136)."""

    def _speech_inputs(batch):
        if speech_encoder is None or "speech_tokens" not in batch:
            return None, None
        toks = batch["speech_tokens"]
        mask = (toks != 0).astype(jnp.int32)
        hidden = speech_encoder.apply({"params": speech_params}, toks,
                                      attention_mask=mask)
        return hidden, mask

    def loss_fn(params, batch, rng):
        if text_encoder is not None:
            src_txt = text_encoder.apply({"params": text_params},
                                         batch["query_tokens"],
                                         return_tokens=True)
            txt_mask = (batch["query_tokens"] != 0).astype(jnp.int32)
        else:
            src_txt = batch["query_feat"]
            txt_mask = batch["query_mask"]
        src_speech, speech_mask = _speech_inputs(batch)
        out = model.apply({"params": params}, src_txt, txt_mask,
                          batch["video_feat"], batch["video_mask"],
                          src_speech=src_speech,
                          src_speech_mask=speech_mask,
                          deterministic=False, rngs={"dropout": rng})
        targets = {
            "spans": batch["spans"],
            "span_valid": batch["span_valid"],
            "saliency_pos_labels": batch["saliency_pos_labels"],
            "saliency_neg_labels": batch["saliency_neg_labels"],
        }
        return grounding_loss(out, targets, cfg)

    def train_step(state: GroundingTrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return GroundingTrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_grounding_infer(model: MomentDETR,
                         text_encoder: Optional[CLIPTextEncoder],
                         text_params,
                         speech_encoder=None,
                         speech_params=None) -> Callable:
    @jax.jit
    def infer(params, query_tokens_or_feat, txt_mask, video_feat, video_mask,
              durations, speech_tokens=None):
        if text_encoder is not None:
            src_txt = text_encoder.apply({"params": text_params},
                                         query_tokens_or_feat,
                                         return_tokens=True)
            txt_mask = (query_tokens_or_feat != 0).astype(jnp.int32)
        else:
            src_txt = query_tokens_or_feat
        src_speech = speech_mask = None
        if speech_encoder is not None and speech_tokens is not None:
            speech_mask = (speech_tokens != 0).astype(jnp.int32)
            src_speech = speech_encoder.apply({"params": speech_params},
                                              speech_tokens,
                                              attention_mask=speech_mask)
        out = model.apply({"params": params}, src_txt, txt_mask,
                          video_feat, video_mask,
                          src_speech=src_speech,
                          src_speech_mask=speech_mask)
        spans_sec, scores = postprocess_predictions(
            out["pred_logits"], out["pred_spans"], durations)
        return spans_sec, scores, out["saliency_scores"]

    return infer


def predictions_to_submission(qids: List, spans_sec: np.ndarray,
                              scores: np.ndarray,
                              saliency: Optional[np.ndarray] = None,
                              nms_threshold: float = -1.0,
                              max_keep: int = 10) -> List[dict]:
    """Build eval_submission rows, sorted by confidence, optional NMS
    (inference.py:117-165)."""
    rows = []
    for i, qid in enumerate(qids):
        order = np.argsort(-scores[i])
        windows = [[float(spans_sec[i, j, 0]), float(spans_sec[i, j, 1]),
                    float(scores[i, j])] for j in order]
        if nms_threshold > 0:
            keep, valid = temporal_nms_indices(
                jnp.asarray(spans_sec[i]), jnp.asarray(scores[i]),
                nms_threshold, max_keep)
            keep = np.asarray(keep)[np.asarray(valid)]
            windows = [[float(spans_sec[i, j, 0]), float(spans_sec[i, j, 1]),
                        float(scores[i, j])] for j in keep]
        row = {"qid": qid, "pred_relevant_windows": windows[:max_keep]}
        if saliency is not None:
            row["pred_saliency_scores"] = [float(x) for x in saliency[i]]
        rows.append(row)
    return rows


def evaluate_grounding(infer_fn, params, data_iter, ground_truth: List[dict],
                       tokenizer=None, nms_threshold: float = -1.0,
                       dataset: str = "chapters") -> Tuple[List[dict], Dict]:
    from vidchapters_tpu.evals.moment import eval_submission

    submission: List[dict] = []
    for batch in data_iter:
        if tokenizer is not None:
            toks = jnp.asarray(tokenizer(batch["query"]))
            txt_mask = None
        else:
            toks = jnp.asarray(batch["query_feat"])
            txt_mask = jnp.asarray(batch["query_mask"])
        speech = (jnp.asarray(batch["speech_tokens"])
                  if "speech_tokens" in batch else None)
        spans_sec, scores, saliency = infer_fn(
            params, toks, txt_mask, jnp.asarray(batch["video_feat"]),
            jnp.asarray(batch["video_mask"]), jnp.asarray(batch["duration"]),
            speech_tokens=speech)
        submission.extend(predictions_to_submission(
            batch["qid"], np.asarray(spans_sec), np.asarray(scores),
            np.asarray(saliency), nms_threshold))
    metrics = eval_submission(submission, ground_truth, match_number=False,
                              dataset=dataset)
    return submission, metrics
