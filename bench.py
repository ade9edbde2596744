"""Benchmark: Vid2Seq chapter-generation training throughput on one chip.

Measures end-to-end jit'd train steps (generative + denoising forward,
backward, Adam update, time-token renorm) of the flagship model (t5-base +
12-layer temporal ViT) at the reference recipe's per-device shapes
(batch 8/device, 100 visual features, ASR up to 1000 tokens, 256 output
tokens — README.md:179-185, args.py:241-299) and reports videos/sec/chip.

``vs_baseline``: the reference trains this model on A100-80GB at batch 8 per
GPU; no throughput number is published (BASELINE.md), so the baseline is an
engineering estimate of the reference PyTorch path at these shapes —
~8 videos/s per A100 (≈1 it/s at bs8 for a 314M-param enc-dec + dual forward).
The ratio is therefore indicative; task-metric parity is tracked separately.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_VIDEOS_PER_SEC_ESTIMATE = 8.0


def main() -> None:
    from vidchapters_tpu.config import OptimConfig, T5Config, Vid2SeqConfig
    from vidchapters_tpu.models.vid2seq import Vid2Seq
    from vidchapters_tpu.train.dvc_train import TrainState, make_train_step
    from vidchapters_tpu.train.schedules import build_optimizer

    import os

    # bfloat16 compute; no block remat — the fused attention kernel's
    # in-kernel dropout keeps residuals O(L*d), so the full recipe fits v5e
    # HBM without recompute (19.9 vs 19.0 videos/s remat'd, 12.8 chunked).
    # SCAN_LAYERS=1: layer-stacked nn.scan T5 stacks (same math; collapses
    # the param tree the optimizer/staging chews on + the compiled HLO)
    from vidchapters_tpu.config import TemporalViTConfig

    # SCAN_LAYERS: "1" scans both T5 stacks + ViT and implies remat —
    # without it the scanned L=1024 encoder saves every per-layer residual
    # as one monolithic [12, ...] buffer and OOMs HBM (17.98 of 15.75 GB,
    # 9.8 GB fragmentation); measured 32.9 videos/s (remat tax > tail win).
    # "decoder" scans only the short decoder stack + ViT, no remat.
    scan_env = os.environ.get("SCAN_LAYERS", "0")
    if scan_env not in ("0", "1", "encoder", "decoder"):
        raise SystemExit(f"SCAN_LAYERS must be 0|1|encoder|decoder, "
                         f"got {scan_env!r}")
    t5_scan: object = {"0": False, "1": True}.get(scan_env, scan_env)
    # FUSED_QKV=1: packed attention projections (T5Config.fused_qkv) — one
    # matmul + one optimizer leaf per projection group
    fused = os.environ.get("FUSED_QKV", "0") == "1"
    cfg = Vid2SeqConfig(
        t5=T5Config(remat=t5_scan is True, scan_layers=t5_scan,
                    fused_qkv=fused),
        vit=TemporalViTConfig(scan_layers=t5_scan is not False))
    model = Vid2Seq(cfg)

    batch, feats = 8, cfg.vit.num_features
    src, tgt = 1000, 256
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.default_rng(0)

    video = jnp.asarray(np_rng.normal(size=(batch, feats, cfg.vit.embed_dim)),
                        jnp.float32)
    input_tokens = jnp.asarray(
        np_rng.integers(2, 32000, (batch, src)), jnp.int32)
    output_tokens = jnp.asarray(
        np_rng.integers(2, 32000, (batch, tgt)), jnp.int32)

    params = model.init({"params": rng, "dropout": rng}, video,
                        input_tokens[:, :8], jnp.ones((batch, 8), jnp.int32),
                        output_tokens[:, :8])["params"]

    # experiment knob: MU_DTYPE=bfloat16 stores the Adam first moment in
    # bf16 (halved mu read/write traffic); reference-recipe default f32
    tx = build_optimizer(OptimConfig(mu_dtype=os.environ.get(
        "MU_DTYPE", "float32")), num_training_steps=1000)
    train_step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.array(0))
    # denoising fields at their analytic static bounds (~0.8L in / ~0.3L out,
    # data.dvc_dataset.denoise_length_bounds) — what the collate produces
    from vidchapters_tpu.data.dvc_dataset import denoise_length_bounds

    den_in, den_out = denoise_length_bounds(src)
    batch_dict = {
        "video": video,
        "input_tokens": input_tokens,
        "output_tokens": output_tokens,
        "denoising_input_tokens": jnp.asarray(
            np_rng.integers(2, 32000, (batch, den_in)), jnp.int32),
        "denoising_output_tokens": jnp.asarray(
            np_rng.integers(2, 32000, (batch, den_out)), jnp.int32),
    }
    from vidchapters_tpu.runtime.rng import fast_train_key

    step_rng = fast_train_key(1)

    # warmup / compile; fetch a scalar to the host — on the axon remote
    # platform block_until_ready returns before execution finishes, so a
    # value fetch is the only reliable barrier
    state, metrics = train_step(state, batch_dict, step_rng)
    float(metrics["total_loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = train_step(state, batch_dict, step_rng)
    float(metrics["total_loss"])  # serializes the whole step chain
    dt = time.perf_counter() - t0

    videos_per_sec = batch * n_steps / dt
    print(json.dumps({
        "metric": "vid2seq_train_videos_per_sec_per_chip",
        "value": round(videos_per_sec, 3),
        "unit": "videos/s",
        "vs_baseline": round(videos_per_sec / REF_VIDEOS_PER_SEC_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
