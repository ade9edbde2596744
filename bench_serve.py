"""Serving throughput/latency: ChapterGenerator under concurrent load.

The reference has no serving story (its demo is a one-shot script,
demo_vid2seq.py:141-197); serve.py keeps the jitted encode+beam programs
warm and coalesces concurrent requests into batched device calls. This
drives the engine at the production recipe (t5-base Vid2Seq, CLIP 768-d
features, beam-4/256 via the decode megakernel) with many concurrent
clients and reports throughput plus request-latency percentiles — the
numbers a deployment actually cares about.

    python bench_serve.py [--requests 64] [--clients 32] [--max-batch 16]
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--input-bucket", type=int, default=1000,
                   help="ASR length per request (snaps to this bucket)")
    p.add_argument("--no-pipeline", action="store_true",
                   help="round-3 behavior: block on each device call before "
                        "assembling the next batch")
    p.add_argument("--max-wait-ms", type=float, default=25.0,
                   help="coalescing window: how long a lone request waits "
                        "for co-batchers before dispatch")
    a = p.parse_args()

    import jax

    from vidchapters_tpu.config import (
        DataConfig,
        GenerationConfig,
        Vid2SeqConfig,
    )
    from vidchapters_tpu.data.tokenizer import build_tokenizer
    from vidchapters_tpu.models.vid2seq import Vid2Seq
    from vidchapters_tpu.serve import ChapterGenerator

    cfg = Vid2SeqConfig()
    data_cfg = DataConfig(input_buckets=(a.input_bucket,),
                          max_input_tokens=a.input_bucket)
    gen_cfg = GenerationConfig()
    model = Vid2Seq(cfg)
    rng = np.random.default_rng(0)
    feats0 = np.asarray(rng.normal(size=(data_cfg.max_feats,
                                         data_cfg.features_dim)), np.float32)
    toks0 = np.ones((1, 8), np.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        np.asarray(feats0[None]), toks0,
                        np.ones((1, 8), np.int32), toks0)["params"]
    tok = build_tokenizer("", num_bins=cfg.num_bins)
    engine = ChapterGenerator(
        model, params, tok, data_cfg, gen_cfg, cfg.num_bins,
        max_batch=a.max_batch,
        batch_buckets=tuple(b for b in (1, 2, 4, 8, 16, 32)
                            if b <= a.max_batch),
        max_wait_ms=a.max_wait_ms,
        pipeline=not a.no_pipeline)
    # long synthetic ASR so requests land in the target input bucket
    n_seg = 60
    asr = {"text": ["some spoken words about the chapter topic"] * n_seg,
           "start": [i * 10.0 for i in range(n_seg)],
           "end": [i * 10.0 + 8.0 for i in range(n_seg)]}
    duration = n_seg * 10.0

    t0 = time.time()
    engine.warmup(batch_sizes=tuple(engine.batch_buckets))
    print(f"warmup ({len(engine.batch_buckets)} programs): "
          f"{time.time()-t0:.0f}s", flush=True)

    latencies = []
    lat_lock = threading.Lock()
    work_q = list(range(a.requests))
    q_lock = threading.Lock()

    def client():
        while True:
            with q_lock:
                if not work_q:
                    return
                work_q.pop()
            t0 = time.monotonic()
            chapters = engine.generate_chapters(feats0, duration, asr)
            dt = time.monotonic() - t0
            assert isinstance(chapters, list)
            with lat_lock:
                latencies.append(dt)

    threads = [threading.Thread(target=client) for _ in range(a.clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    lat = np.sort(np.asarray(latencies))
    print(json.dumps({
        "metric": "serve_chapter_requests_per_sec_per_chip",
        "value": round(a.requests / wall, 2),
        "unit": "videos/s",
        "p50_s": round(float(lat[len(lat) // 2]), 2),
        "p95_s": round(float(lat[int(len(lat) * 0.95)]), 2),
        "clients": a.clients,
        "requests": a.requests,
        "device_calls": engine.device_calls,
        "pipeline": engine.pipeline,
        "vs_baseline": round(a.requests / wall / 1.32, 2),
        # baseline: reference one-shot demo path ~1.32 videos/s on A100
        # (BASELINE.md decode table — no serving batching exists there)
    }))


if __name__ == "__main__":
    main()
