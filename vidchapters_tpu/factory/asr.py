"""ASR factory: Whisper inference hooks + pickle merging, idempotent/sharded.

Counterpart of asr_extract/: per-video ASR inference with the reference's
resume pattern — skip outputs that already exist and shuffle the work list so
many independent jobs can share one directory (whisper_inference.py:26-50,
the repo's entire data-processing "distributed" story, SURVEY.md §5) — plus
the merge steps producing the consolidated pickles the datasets read
(merge_asr_whisper.py:12-41, merge_asr_whisper_align.py:16-81 including the
``v_``-prefixed ActivityNet id handling).

The actual Whisper model is a pluggable ``transcribe_fn``; a JAX Whisper port
is planned, and HF/whisperx backends can be wrapped where installed.
"""

from __future__ import annotations

import os

from pathlib import Path
from typing import Callable, Dict, Iterable, Optional

import numpy as np

from vidchapters_tpu.utils.io import load_pickle, save_pickle


def run_sharded_asr(video_paths: Iterable[str], out_dir: str,
                    transcribe_fn: Callable[[str], dict],
                    seed: int = 0) -> int:
    """Idempotent per-video ASR: shuffled work list, skip existing outputs.

    ``transcribe_fn(path) -> {"text": [...], "start": [...], "end": [...]}``.
    Returns the number of videos processed by this job."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = list(video_paths)
    np.random.default_rng(seed).shuffle(paths)
    done = 0
    for path in paths:
        vid = Path(path).stem
        target = out / f"{vid}.pkl"
        if target.exists():  # another job already did it
            continue
        result = transcribe_fn(path)
        save_pickle(result, target)
        done += 1
    return done


def normalize_video_id(name: str) -> str:
    """ActivityNet ids keep their ``v_`` prefix + 11-char id; YouTube ids are
    the trailing 11 chars (merge_asr_whisper_align.py:27-31)."""
    stem = Path(name).stem
    if stem.startswith("v_") and len(stem) >= 13:
        return stem[:13]
    return stem[-11:]


def merge_asr_pickles(asr_dir: str, out_path: str) -> Dict[str, dict]:
    """Merge per-video pickles into one ``{vid: raw_result}`` dict
    (merge_asr_whisper.py:12-41)."""
    merged = {}
    for name in sorted(os.listdir(asr_dir)):
        if not name.endswith(".pkl"):
            continue
        merged[normalize_video_id(name)] = load_pickle(os.path.join(asr_dir, name))
    save_pickle(merged, out_path)
    return merged


def proc_asr(raw: dict) -> Dict[str, list]:
    """Raw (whisperx-style) result -> the ``{text[], start[], end[]}``
    schema every dataset reads (merge_asr_whisper_align.py:16-81); the
    detected ``language`` code rides along when present (the key
    whisper_align.py:30-41 groups videos on)."""
    texts, starts, ends = [], [], []
    segments = raw.get("segments", raw if isinstance(raw, list) else [])
    for seg in segments:
        text = seg.get("text", "").strip()
        if not text or "start" not in seg or "end" not in seg:
            continue
        texts.append(text)
        starts.append(float(seg["start"]))
        ends.append(float(seg["end"]))
    out = {"text": texts, "start": starts, "end": ends}
    if isinstance(raw, dict) and "language" in raw:
        out["language"] = raw["language"]
    return out


def merge_and_process(asr_dir: str, out_path: str) -> Dict[str, dict]:
    """Merged + schema-normalized variant (the ``_proc`` pickle)."""
    merged = {}
    for name in sorted(os.listdir(asr_dir)):
        if not name.endswith(".pkl"):
            continue
        raw = load_pickle(os.path.join(asr_dir, name))
        merged[normalize_video_id(name)] = proc_asr(raw)
    save_pickle(merged, out_path)
    return merged


def make_hf_whisper_transcribe(model_name: str = "openai/whisper-large-v2",
                               device: str = "cpu",
                               language: Optional[str] = None
                               ) -> Callable[[str], dict]:
    """Optional HF-whisper backend (requires model weights locally).
    ``language`` pins the spoken language; None auto-detects."""
    from transformers import pipeline

    pipe = pipeline("automatic-speech-recognition", model=model_name,
                    device=device, return_timestamps=True)
    kwargs = ({"generate_kwargs": {"language": language}}
              if language else {})

    def transcribe(path: str) -> dict:
        out = pipe(path, **kwargs)
        return {"segments": [
            {"text": c["text"], "start": c["timestamp"][0],
             "end": c["timestamp"][1]}
            for c in out.get("chunks", [])
            if c.get("timestamp") and c["timestamp"][0] is not None]}

    return transcribe


def run_batched_asr(audio_paths: Iterable[str], out_dir: str,
                    transcriber, batch_size: int = 8,
                    seed: int = 0) -> int:
    """Batched idempotent ASR sweep: groups of ``batch_size`` audio files
    decode window-lockstep on one chip (JaxWhisperTranscriber.transcribe_batch)
    — the TPU-throughput version of ``run_sharded_asr``'s per-video loop
    (asr_extract/whisper_inference.py batches via whisperx at batch 16).

    Skips existing outputs so concurrent shards cooperate. Returns videos
    processed by this job."""
    from pathlib import Path

    from vidchapters_tpu.factory.audio import load_audio
    from vidchapters_tpu.utils.io import save_pickle

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = list(audio_paths)
    np.random.default_rng(seed).shuffle(paths)
    todo = [p for p in paths if not (out / f"{Path(p).stem}.pkl").exists()]
    done = 0
    for s in range(0, len(todo), batch_size):
        chunk = todo[s:s + batch_size]
        audios = [load_audio(p) for p in chunk]
        results = transcriber.transcribe_batch(audios)
        for path, result in zip(chunk, results):
            save_pickle(result, out / f"{Path(path).stem}.pkl")
            done += 1
    return done
