"""Decode throughput: standard incremental path vs the cross-layer
megakernel, at the eval hot-loop shapes (t5-base decoder, bs 16, beam 4,
256 steps, encoder length 1100 — BENCH_NOTES.md "Decode").

Random weights never emit EOS, so all 256 steps run (worst case; trained
models stop early).  Timing uses a host scalar fetch (axon's
block_until_ready returns early).  Run ONE at a time on the chip:

    python bench_decode.py [--paths standard,mega] [--steps 256]
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
    p.add_argument("--paths", default="standard,mega")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--beams", type=int, default=4)
    p.add_argument("--steps", type=int, default=256)
    p.add_argument("--enc-len", type=int, default=1100)
    p.add_argument("--reps", type=int, default=3)
    a = p.parse_args()

    from vidchapters_tpu.config import T5Config
    from vidchapters_tpu.models.t5 import T5ForConditionalGeneration
    from vidchapters_tpu.ops.decoding import beam_search, make_decode_fns
    from vidchapters_tpu.ops.decode_megakernel import make_mega_decode_fns

    cfg = T5Config()  # t5-base + time tokens, bf16 compute
    model = T5ForConditionalGeneration(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32))["params"]
    np_rng = np.random.default_rng(0)
    enc_out = jnp.asarray(
        np_rng.normal(size=(a.batch, a.enc_len, cfg.d_model)) * 0.1,
        jnp.bfloat16)
    enc_mask = jnp.ones((a.batch, a.enc_len), jnp.int32)

    results = {}
    seqs_by_path = {}
    for path in a.paths.split(","):
        if path == "standard":
            def run(params, enc_out, enc_mask):
                fns = make_decode_fns(model, params, a.steps)
                return beam_search(fns, enc_out, enc_mask, a.steps,
                                   num_beams=a.beams)
        else:
            def run(params, enc_out, enc_mask):
                fns = make_mega_decode_fns(cfg, params, a.steps,
                                           num_beams=a.beams)
                return beam_search(fns, enc_out, enc_mask, a.steps,
                                   num_beams=a.beams)
        f = jax.jit(run)
        t0 = time.perf_counter()
        seqs = f(params, enc_out, enc_mask)
        _ = int(np.asarray(seqs)[0, 0])
        print(f"{path}: first call (compile+run) "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(a.reps):
            seqs = f(params, enc_out, enc_mask)
            _ = int(np.asarray(seqs)[0, 0])
        dt = (time.perf_counter() - t0) / a.reps
        vps = a.batch / dt
        # reference estimate: HF fp32 generate beam-4 on A100 ~1.5
        # videos/s (launch-overhead bound; BASELINE.md ratio table)
        results[path] = {"sec_per_call": round(dt, 3),
                         "videos_per_sec": round(vps, 3),
                         "vs_baseline": round(vps / 1.5, 2)}
        seqs_by_path[path] = np.asarray(seqs)
        print(f"{path}: {dt:.3f}s/call -> {vps:.2f} videos/s", flush=True)

    if len(seqs_by_path) == 2:
        s, m = seqs_by_path["standard"], seqs_by_path["mega"]
        diff = int((s != m).sum())
        results["token_mismatches"] = diff
        print(f"token mismatches standard vs mega: {diff}/{s.size}",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
