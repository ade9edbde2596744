"""PDVC training + evaluation harness.

Counterpart of PDVC/train.py:33-360 + eval_utils.py:109-242: a jit'd train
step over the full set-prediction criterion, and an eval pass producing the
DVC submission json with per-proposal scores/captions, count-based reranking
(eval_utils.py:152-170: joint score = proposal + alpha * length-normalized
sentence score, truncate to the count head's prediction, sort by time), and
eval_dvc + SODA scoring.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vidchapters_tpu.config import PDVCConfig
from vidchapters_tpu.models.pdvc import PDVC
from vidchapters_tpu.models.pdvc_loss import (
    pdvc_criterion,
    pdvc_postprocess,
)


class PDVCTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def build_pdvc_optimizer(lr: float = 1e-4, weight_decay: float = 1e-4,
                         lr_drop_step: int = 8, gamma: float = 0.5,
                         clip_norm: float = 100.0,
                         steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """Adam + StepLR (PDVC/opts.py defaults: lr 1e-4, learning_rate_decay_every
    8 epochs x0.5, grad clip 100)."""
    schedule = optax.exponential_decay(lr, lr_drop_step * steps_per_epoch,
                                       gamma, staircase=True)
    return optax.chain(optax.clip_by_global_norm(clip_norm),
                       optax.adamw(schedule, weight_decay=weight_decay))


def make_pdvc_train_step(model: PDVC, tx, cfg: PDVCConfig,
                         self_iou: bool = False) -> Callable:
    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch["video"],
                          batch["video_mask"], deterministic=False,
                          rngs={"dropout": rng})
        targets = {"boxes": batch["boxes"], "valid": batch["valid"],
                   "captions": batch["captions"]}
        return pdvc_criterion(model, params, out, targets, cfg,
                              self_iou=self_iou)

    def train_step(state: PDVCTrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return PDVCTrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_pdvc_infer(model: PDVC, cfg: PDVCConfig) -> Callable:
    @jax.jit
    def infer(params, video, video_mask, durations):
        out = model.apply({"params": params}, video, video_mask)
        hs_last = out["hs"][-1]
        b, q, c = hs_last.shape
        feats = hs_last.reshape(b * q, c)
        ctx = (model.caption_context(out)
               if cfg.caption_decoder_type in ("standard", "dsa") else None)
        seq, lps = model.apply({"params": params}, feats, cfg.max_caption_len,
                               ctx, method=model.caption_sample)
        seq = seq.reshape(b, q, -1)
        cap_scores = lps.sum(-1).reshape(b, q)
        return pdvc_postprocess(out, durations, seq, cap_scores)

    return infer


def rerank_proposals(proposals: List[dict], alpha: float = 0.3,
                     temperature: float = 2.0) -> List[dict]:
    """Count-based reranking (eval_utils.py:152-170)."""
    if not proposals:
        return proposals
    joint = []
    for p in proposals:
        n_words = len(p["sentence"].split())
        sent = p["sentence_score"] / (float(n_words) ** temperature + 1e-5)
        joint.append(alpha * sent + p["proposal_score"])
    order = sorted(range(len(proposals)), key=lambda i: -joint[i])
    top_n = proposals[order[0]]["pred_event_count"]
    kept = [proposals[i] for i in order[:top_n]]
    return sorted(kept, key=lambda p: p["timestamp"])


def evaluate_pdvc(infer_fn, params, data_iter, translator,
                  references: Optional[List] = None,
                  rerank: bool = True, alpha: float = 0.3,
                  score_threshold: float = 0.0
                  ) -> Tuple[Dict[str, list], Dict[str, float]]:
    """Produce the DVC submission (eval_utils.py:174-242 schema) and score."""
    results: Dict[str, list] = {}
    for batch in data_iter:
        post = infer_fn(params, jnp.asarray(batch["video"]),
                        jnp.asarray(batch["video_mask"]),
                        jnp.asarray(batch["duration"]))
        scores = np.asarray(post["scores"])
        boxes = np.asarray(post["boxes"])
        seq = np.asarray(post["seq"])
        cap_scores = np.asarray(post["caption_scores"])
        counts = np.asarray(post["pred_seq_len"])
        for i, vid in enumerate(batch["video_id"]):
            props = []
            for pid in range(scores.shape[1]):
                if scores[i, pid] <= score_threshold:
                    continue
                props.append({
                    "timestamp": [float(boxes[i, pid, 0]),
                                  float(boxes[i, pid, 1])],
                    "proposal_score": float(scores[i, pid]),
                    "sentence": translator.rtranslate(seq[i, pid]),
                    "sentence_score": float(cap_scores[i, pid]),
                    "pred_event_count": int(counts[i]),
                })
            if rerank:
                props = rerank_proposals(props, alpha=alpha)
            results[vid] = props
    metrics: Dict[str, float] = {}
    if references:
        from vidchapters_tpu.evals.dvc import eval_dvc
        from vidchapters_tpu.evals.soda import eval_soda

        submission = {"results": results}
        metrics.update(eval_dvc(submission, references))
        metrics.update(eval_soda(submission, references))
    return results, metrics
