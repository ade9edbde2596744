"""ASR factory throughput: Whisper large-v2 transcription on one chip.

The reference runs WhisperX/faster-whisper large-v2 per video on GPU
(/root/reference/asr_extract/whisper_inference.py:28-50) — the largest
offline compute in the VidChapters-7M data factory (817K videos).  This
measures the JAX Whisper (models/whisper.py) batched greedy decode at
large-v2 scale over 30 s mel chunks and reports AUDIO-seconds transcribed
per wall-second (random weights => no early EOS, so this is the
worst-case full-224-token decode; real speech stops much earlier).

    python bench_asr.py [--batch 8] [--steps 224]
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
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=224)
    p.add_argument("--dtype", default=None,
                   help="cast params (e.g. bfloat16) like the transcriber's"
                        " param_dtype option")
    p.add_argument("--mega", action="store_true",
                   help="cross-layer decode megakernel "
                        "(ops/whisper_megakernel.py)")
    p.add_argument("--beam", type=int, default=0,
                   help="beam size; 0/1 = greedy. beam 5 matches the "
                        "faster-whisper default the reference's --faster "
                        "factory path runs (whisper_inference.py:40-43)")
    a = p.parse_args()

    from vidchapters_tpu.models.whisper import LARGE_V2, Whisper

    cfg = LARGE_V2
    model = Whisper(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(a.batch, cfg.num_mel_bins, 3000)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel[:1],
                        jnp.ones((1, 4), jnp.int32))["params"]
    if a.dtype:
        dt = jnp.dtype(a.dtype)
        params = jax.tree_util.tree_map(lambda x: x.astype(dt), params)

    from vidchapters_tpu.ops.decoding import (
        make_decode_fns,
        reorder_beam_cache,
    )
    from vidchapters_tpu.ops.whisper_megakernel import make_whisper_mega_fns

    beams = max(a.beam, 1)

    @jax.jit
    def run(params, mel):
        enc = model.apply({"params": params}, mel, method=model.encode)
        if a.mega:
            fns = make_whisper_mega_fns(cfg, params, a.steps)
        else:
            fns = make_decode_fns(model, params, a.steps)
        rows = a.batch * beams
        # both paths keep cross KV per-example with beams: the standard
        # attention layer groups the beam axis; the megapath shares one
        # cross block per example inside the kernel (like _beam_decode)
        cache = fns.init_cache(rows, enc)
        tokens = jnp.full((rows,), 50258, jnp.int32)  # <|sot|>

        def body(i, carry):
            tokens, cache, acc = carry
            logits, cache = fns.step(tokens, cache, i, None)
            if beams > 1:
                flat = logits.reshape(a.batch, -1)
                _, idx = jax.lax.top_k(flat, beams)
                parent = (jnp.arange(a.batch)[:, None] * beams
                          + idx // logits.shape[-1]).reshape(-1)
                # beam-invariant leaves (shared/repeated cross KV) skip
                # the gather — same rules as production (ops.decoding)
                cache = reorder_beam_cache(cache, parent)
                nxt = (idx % logits.shape[-1]).reshape(-1).astype(jnp.int32)
            else:
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return nxt, cache, acc + jnp.sum(logits[:, 0])

        tokens, cache, acc = jax.lax.fori_loop(
            0, a.steps, body, (tokens, cache, jnp.float32(0)))
        return acc

    acc = run(params, mel)
    float(acc)  # compile + barrier
    t0 = time.perf_counter()
    acc = run(params, mel)
    float(acc)
    dt = time.perf_counter() - t0
    audio_s = a.batch * 30.0
    print(json.dumps({
        "metric": "whisper_largev2_audio_seconds_per_sec_per_chip",
        "value": round(audio_s / dt, 1),
        "unit": "audio-s/s",
        "batch": a.batch,
        "decode_steps": a.steps,
        "dtype": a.dtype or "float32",
        "beam": a.beam,
        "mega": bool(a.mega),
        "vs_baseline": round(audio_s / dt / 70.0, 2),  # whisperx ~70x RT
    }))


if __name__ == "__main__":
    main()
