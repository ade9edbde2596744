"""Capture an on-chip trace of the train step (bench.py shapes) and print
the top ops by self time.  One TPU session; the train program pays the
~25-40 min remote compile.

    python bench_profile.py [--steps 6] [--out /tmp/trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import os
import time
from collections import defaultdict


def capture(out_dir: str, steps: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidchapters_tpu.config import OptimConfig, T5Config, Vid2SeqConfig
    from vidchapters_tpu.data.dvc_dataset import denoise_length_bounds
    from vidchapters_tpu.models.vid2seq import Vid2Seq
    from vidchapters_tpu.train.dvc_train import TrainState, make_train_step
    from vidchapters_tpu.train.schedules import build_optimizer

    cfg = Vid2SeqConfig(t5=T5Config(remat=False))
    model = Vid2Seq(cfg)
    batch, feats = 8, cfg.vit.num_features
    src, tgt = 1000, 256
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.default_rng(0)
    video = jnp.asarray(np_rng.normal(size=(batch, feats, cfg.vit.embed_dim)),
                        jnp.float32)
    input_tokens = jnp.asarray(np_rng.integers(2, 32000, (batch, src)),
                               jnp.int32)
    output_tokens = jnp.asarray(np_rng.integers(2, 32000, (batch, tgt)),
                                jnp.int32)
    params = model.init({"params": rng, "dropout": rng}, video,
                        input_tokens[:, :8], jnp.ones((batch, 8), jnp.int32),
                        output_tokens[:, :8])["params"]
    tx = build_optimizer(OptimConfig(), num_training_steps=1000)
    train_step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.array(0))
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

    step_rng = fast_train_key(1)  # the production dropout stream (rbg)
    t0 = time.time()
    state, metrics = train_step(state, batch_dict, step_rng)
    print(f"compile+first step: {time.time()-t0:.0f}s "
          f"loss={float(metrics['total_loss']):.3f}", flush=True)

    t0 = time.time()
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            state, metrics = train_step(state, batch_dict, step_rng)
        _ = float(metrics["total_loss"])
    dt = (time.time() - t0) / steps
    print(f"traced {steps} steps at {dt*1e3:.1f} ms/step "
          f"({batch/dt:.2f} videos/s)", flush=True)


def parse(out_dir: str) -> None:
    """Sum self-times per op name from the xplane proto (TPU device lines)."""
    from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
    # xplane protos live under <dir>/plugins/profile/<run>/*.xplane.pb
    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane found", flush=True)
        return
    from tensorflow.core.profiler.protobuf import xplane_pb2

    totals = defaultdict(float)
    device_total = 0.0
    for path in paths:
        data = open(path, "rb").read()
        if path.endswith(".gz"):
            data = gzip.decompress(data)
        space = xplane_pb2.XSpace()
        space.ParseFromString(data)
        for plane in space.planes:
            if "TPU" not in plane.name or "trace" in plane.name.lower():
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                lname = line.name.lower()
                if "step" in lname or "sparse" in lname:
                    continue
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    dur = ev.duration_ps / 1e9  # ms
                    totals[name] += dur
                    device_total += dur
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:30]
    print(f"device line total: {device_total:.1f} ms (all traced steps)",
          flush=True)
    for name, ms in top:
        print(f"  {ms:9.2f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--out", default="/tmp/train_trace")
    p.add_argument("--parse-only", action="store_true")
    a = p.parse_args()
    if not a.parse_only:
        capture(a.out, a.steps)
    parse(a.out)
