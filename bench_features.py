"""Feature-factory throughput: CLIP ViT-L/14 frame encoding on one chip.

The reference extracts CLIP ViT-L/14 features per frame with the pip
``clip`` package under PyTorch (run_on_video/data_utils.py, demo
preprocessing at /root/reference/demo_vid2seq.py:98-99); this measures the
JAX tower (models/clip.py) at ViT-L/14 scale, bf16, jit'd, one v5e chip.

    python bench_features.py [--batch 128] [--reps 20]

Prints ONE JSON line: frames/sec/chip.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--reps", type=int, default=20)
    a = p.parse_args()

    from vidchapters_tpu.models.clip import VIT_L14, CLIPImageEncoder

    enc = CLIPImageEncoder(VIT_L14)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(a.batch, 224, 224, 3)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), pixels[:1])["params"]

    fwd = jax.jit(lambda p, x: enc.apply({"params": p}, x))
    feats = fwd(params, pixels)
    _ = float(jnp.sum(feats.astype(jnp.float32)))  # compile + barrier

    t0 = time.perf_counter()
    for _ in range(a.reps):
        feats = fwd(params, pixels)
    _ = float(jnp.sum(feats.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / a.reps
    fps = a.batch / dt
    print(json.dumps({
        "metric": "clip_vitl14_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 600.0, 2),  # A100 clip-pip estimate
        "batch": a.batch,
    }))


if __name__ == "__main__":
    main()
