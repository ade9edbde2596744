"""Baseline-model train throughput on one chip: PDVC and Moment-DETR.

Shapes follow the reference recipes: PDVC chapters (CLIP 768-d features
resized to 100 frame embeddings, 100 event queries, deformable attention
Pallas path — /root/reference/PDVC/cfgs/ + opts.py defaults) and
Moment-DETR chapters (max_v_l 1200 downsampled by clip_length 3 to 400
clips, CLIP text queries, bs 256 over 8 GPUs = 32/device —
moment_detr/scripts/chapters.sh:28-51).

    python bench_aux.py [--which pdvc,grounding]

Prints one JSON line per model.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_pdvc(reps: int = 20) -> None:
    from vidchapters_tpu.config import PDVCConfig
    from vidchapters_tpu.models.pdvc import PDVC
    from vidchapters_tpu.train.pdvc_train import (
        PDVCTrainState,
        build_pdvc_optimizer,
        make_pdvc_train_step,
    )

    cfg = PDVCConfig()
    model = PDVC(cfg)
    b, t = 8, cfg.frame_embedding_num
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(b, t, cfg.feature_dim)), jnp.float32)
    mask = jnp.ones((b, t), jnp.int32)
    max_events, cap_len = 10, 20
    batch = {
        "video": video,
        "video_mask": mask,
        "boxes": jnp.asarray(rng.uniform(0.1, 0.9, (b, max_events, 2)),
                             jnp.float32),
        "valid": jnp.asarray(rng.integers(0, 2, (b, max_events)), jnp.int32
                             ).at[:, 0].set(1),
        "captions": jnp.asarray(
            rng.integers(1, cfg.vocab_size, (b, max_events, cap_len)),
            jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)}, video, mask,
                        method=model.init_all)["params"]
    tx = build_pdvc_optimizer()
    step = jax.jit(make_pdvc_train_step(model, tx, cfg), donate_argnums=(0,))
    state = PDVCTrainState(params=params, opt_state=tx.init(params),
                           step=jnp.array(0))
    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key)
    float(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = step(state, batch, key)
    float(metrics["total"])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"metric": "pdvc_train_videos_per_sec_per_chip",
                      "value": round(b / dt, 2), "unit": "videos/s",
                      "vs_baseline": round(b / dt / 20.0, 2)}))  # A100 est


def bench_grounding(reps: int = 20) -> None:
    from vidchapters_tpu.config import GroundingConfig
    from vidchapters_tpu.models.grounding import MomentDETR
    from vidchapters_tpu.train.grounding_train import (
        GroundingTrainState,
        build_grounding_optimizer,
        make_grounding_train_step,
    )

    cfg = GroundingConfig(dtype="bfloat16")  # the TPU recipe (configs/)
    model = MomentDETR(cfg)
    b, lv, lq = 32, 400, 32  # chapters recipe per-device shapes
    rng = np.random.default_rng(0)
    batch = {
        "query_feat": jnp.asarray(rng.normal(size=(b, lq, cfg.t_feat_dim)),
                                  jnp.float32),
        "query_mask": jnp.ones((b, lq), jnp.int32),
        "video_feat": jnp.asarray(
            rng.normal(size=(b, lv, cfg.v_feat_dim)), jnp.float32),
        "video_mask": jnp.ones((b, lv), jnp.int32),
        "spans": jnp.asarray(rng.uniform(0.1, 0.9, (b, 3, 2)), jnp.float32),
        "span_valid": jnp.ones((b, 3), jnp.int32),
        "saliency_pos_labels": jnp.zeros((b, 2), jnp.int32),
        "saliency_neg_labels": jnp.ones((b, 2), jnp.int32) * (lv - 1),
    }
    params = model.init({"params": jax.random.PRNGKey(0), "dropout":
                         jax.random.PRNGKey(0)},
                        batch["query_feat"], batch["query_mask"],
                        batch["video_feat"], batch["video_mask"])["params"]
    tx = build_grounding_optimizer()
    step = jax.jit(make_grounding_train_step(model, None, None, tx, cfg),
                   donate_argnums=(0,))
    state = GroundingTrainState(params=params, opt_state=tx.init(params),
                                step=jnp.array(0))
    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key)
    float(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = step(state, batch, key)
    float(metrics["total"])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"metric": "momentdetr_train_samples_per_sec_per_chip",
                      "value": round(b / dt, 1), "unit": "samples/s",
                      "vs_baseline": round(b / dt / 1500.0, 2)}))  # A100 est


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="pdvc,grounding")
    a = p.parse_args()
    if "pdvc" in a.which:
        bench_pdvc()
    if "grounding" in a.which:
        bench_grounding()
