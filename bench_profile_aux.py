"""On-chip trace of the PDVC / Moment-DETR train steps (bench_aux shapes).

Same method as bench_profile.py but for the baseline models, and parsing
the chrome trace (`vm.trace.json.gz`: pid 3 = TPU device, tid 3 = "XLA
Ops"; this TF build lacks the xplane proto module). Wall time through the
tunnel inflates ~20x; the per-op device durations are correct.

    python bench_profile_aux.py --which pdvc [--steps 6]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import time
from collections import defaultdict


def _make_pdvc_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    def run(state):
        return step(state, batch, key)

    return run, state, b, "total"


def _make_grounding_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidchapters_tpu.config import GroundingConfig
    from vidchapters_tpu.models.grounding import MomentDETR
    from vidchapters_tpu.train.grounding_train import (
        GroundingTrainState,
        build_grounding_optimizer,
        make_grounding_train_step,
    )

    cfg = GroundingConfig(dtype="bfloat16")  # the TPU recipe (configs/)
    model = MomentDETR(cfg)
    b, lv, lq = 32, 400, 32
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

    def run(state):
        return step(state, batch, key)

    return run, state, b, "total"


def capture(which: str, out_dir: str, steps: int) -> None:
    import jax

    run, state, b, key = (_make_pdvc_step() if which == "pdvc"
                          else _make_grounding_step())
    t0 = time.time()
    state, metrics = run(state)
    print(f"compile+first step: {time.time()-t0:.0f}s "
          f"loss={float(metrics[key]):.3f}", flush=True)
    t0 = time.time()
    state, metrics = run(state)
    float(metrics[key])
    print(f"untraced step: {(time.time()-t0)*1e3:.1f} ms", flush=True)
    t0 = time.time()
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            state, metrics = run(state)
        _ = float(metrics[key])
    dt = (time.time() - t0) / steps
    print(f"traced {steps} steps at {dt*1e3:.1f} ms/step (wall, inflated)",
          flush=True)


def parse(out_dir: str, steps: int) -> None:
    """Chrome-trace parse: sum device-op self times by tf_op/name."""
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found", flush=True)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # pid of the TPU device process, tid of the "XLA Ops" line
    names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev["args"].get("name", "")
    tpu_pids = {pid for pid, n in names.items()
                if "TPU" in n or "/device" in n.lower()}
    tid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    totals = defaultdict(float)
    cat_totals = defaultdict(float)
    device_total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        tname = tid_names.get((ev["pid"], ev["tid"]), "")
        if "XLA Ops" not in tname:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        args = ev.get("args", {})
        op = args.get("tf_op") or ev.get("name", "?")
        cat = args.get("hlo_category", "?")
        totals[op] += dur
        cat_totals[cat] += dur
        device_total += dur
    print(f"device total: {device_total:.1f} ms over {steps} steps "
          f"({device_total/steps:.2f} ms/step)", flush=True)
    print("-- by hlo_category --", flush=True)
    for name, ms in sorted(cat_totals.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms/steps:9.3f} ms/step  {name}", flush=True)
    print("-- top ops --", flush=True)
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms/steps:9.3f} ms/step  {name[:110]}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="pdvc", choices=["pdvc", "grounding"])
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--out", default=None)
    p.add_argument("--parse-only", action="store_true")
    a = p.parse_args()
    out = a.out or f"/tmp/{a.which}_trace"
    if not a.parse_only:
        capture(a.which, out, a.steps)
    parse(out, a.steps)
