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
    p.add_argument("--vad-fraction", type=float, default=None,
                   help="run the REAL JaxWhisperTranscriber (vad=True) over "
                        "long synthetic audio that is only this fraction "
                        "speech (rest silence) and report EFFECTIVE "
                        "audio-s/s — the role whisperx's pyannote VAD plays "
                        "in the reference --faster path's ~70x-RT figure")
    p.add_argument("--rules-ab", action="store_true",
                   help="A/B the decode-time timestamp rules and language "
                        "detection through the real transcriber")
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

    if a.vad_fraction is not None:
        _vad_bench(model, params, a)
        return
    if a.rules_ab:
        _rules_ab(model, params, a)
        return

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
                # the gather — same rules as production (ops.decoding);
                # the mega path defers the permutation into the next
                # step's kernel (fns.reorder_cache)
                cache = (fns.reorder_cache or reorder_beam_cache)(
                    cache, parent)
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


def _vad_bench(model, params, a) -> None:
    """Effective audio-s/s through the REAL transcriber on long audio that
    is only ``--vad-fraction`` speech: VAD skips silent 30 s windows before
    any mel/encode/decode work, so effective throughput scales ~1/fraction.
    Random weights mean every decoded window runs the full worst-case
    token budget; gates/temperature retries are disabled so both arms run
    one deterministic pass per window."""
    from vidchapters_tpu.factory.whisper_transcribe import (
        JaxWhisperTranscriber,
    )
    from vidchapters_tpu.factory.vad import SAMPLE_RATE

    rng = np.random.default_rng(1)
    secs, period = 120, 30  # 4 windows per item; whole-window speech blocks
    n_speech = int(round(secs / period * a.vad_fraction))
    audios = []
    for _ in range(a.batch):
        blocks = []
        for w in range(secs // period):
            if w < n_speech:
                blocks.append(rng.normal(0, 0.05,
                                         period * SAMPLE_RATE).astype(
                                             np.float32))
            else:
                blocks.append(np.zeros(period * SAMPLE_RATE, np.float32))
        audios.append(np.concatenate(blocks))

    def run(vad: bool) -> float:
        # language pinned: this row isolates VAD (detection overhead is
        # measured by --rules-ab)
        tr = JaxWhisperTranscriber(
            model, params, max_decode_len=a.steps, vad=vad, language="en",
            beam_size=a.beam if a.beam > 1 else None,
            temperatures=(0.0,), compression_ratio_threshold=None,
            logprob_threshold=None, no_speech_threshold=None)
        tr.transcribe_batch(audios)  # compile both programs
        t0 = time.perf_counter()
        tr.transcribe_batch(audios)
        return time.perf_counter() - t0

    dt_off, dt_on = run(False), run(True)
    total = a.batch * secs
    print(json.dumps({
        "metric": "whisper_largev2_effective_audio_seconds_per_sec",
        "value": round(total / dt_on, 1),
        "unit": "audio-s/s",
        "vad_off": round(total / dt_off, 1),
        "speech_fraction": a.vad_fraction,
        "batch": a.batch,
        "dtype": a.dtype or "float32",
        "beam": a.beam,
        "vs_baseline": round(total / dt_on / 70.0, 2),  # whisperx ~70x RT,
        # itself a VAD-assisted real-audio figure — this row is the
        # apples-to-apples comparison for the factory default config
    }))


def _rules_ab(model, params, a) -> None:
    """Real-transcriber A/B: timestamp rules on/off and language detection
    on/off, at the factory default decode config. Random weights mean every
    window decodes the full worst-case token budget, so this upper-bounds
    the per-step cost of the rules filter (one extra masked log_softmax)
    and the per-video cost of detection (one batched encode + SOT step)."""
    from vidchapters_tpu.factory.whisper_transcribe import (
        JaxWhisperTranscriber,
    )
    from vidchapters_tpu.factory.vad import SAMPLE_RATE

    rng = np.random.default_rng(2)
    secs = 60  # 2 windows per item
    audios = [rng.normal(0, 0.05, secs * SAMPLE_RATE).astype(np.float32)
              for _ in range(a.batch)]

    def make(rules: bool, detect: bool):
        return JaxWhisperTranscriber(
            model, params, max_decode_len=a.steps,
            language=None if detect else "en", timestamp_rules=rules,
            beam_size=a.beam if a.beam > 1 else None,
            temperatures=(0.0,), compression_ratio_threshold=None,
            logprob_threshold=None, no_speech_threshold=None)

    def timed(tr) -> float:
        tr.transcribe_batch(audios)  # compile (or warm)
        t0 = time.perf_counter()
        tr.transcribe_batch(audios)
        return time.perf_counter() - t0

    from vidchapters_tpu.factory.whisper_transcribe import (
        language_token_for,
    )

    # language is runtime DATA (the SOT prefix is a program input), so the
    # full and rules-only arms share one compiled decode program — only two
    # big remote compiles instead of three (the tunnel drops ~15-min-plus
    # compile RPCs; see BENCH_NOTES round 5)
    tr_full = make(rules=True, detect=True)
    full = timed(tr_full)
    tr_full.language_token = language_token_for("en")  # pin -> no detect
    rules = timed(tr_full)
    base = timed(make(rules=False, detect=False))
    total = a.batch * secs
    print(json.dumps({
        "metric": "whisper_rules_detect_ab_audio_seconds_per_sec",
        "value": round(total / full, 1),
        "unit": "audio-s/s",
        "no_rules_no_detect": round(total / base, 1),
        "rules_only": round(total / rules, 1),
        "rules_delta_pct": round(100 * (base / rules - 1), 1),
        "detect_delta_pct": round(100 * (rules / full - 1), 1),
        "batch": a.batch,
        "dtype": a.dtype or "float32",
        "beam": a.beam,
    }))


if __name__ == "__main__":
    main()
