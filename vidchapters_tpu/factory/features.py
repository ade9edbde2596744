"""CLIP frame-feature factory: batched JAX feature extraction.

Counterpart of the reference feature pipelines (demo_vid2seq.py:70-113 1-FPS
decode + CLIP ViT-L/14 encode; moment_detr/run_on_video/data_utils.py:9-49):
frames are preprocessed (resize-shorter-side + center crop + CLIP
normalization, pure numpy), batched, and pushed through the JAX CLIP image
tower under jit — one compiled program reused across all videos, the big
per-chip throughput win over the per-frame torch loop.

Video decode needs ffmpeg; when absent, the extractor accepts pre-decoded
frame arrays (tests, or upstream decode services). The per-video output is
``<id>.npy`` [T, D], matching what every dataset loader reads.
"""

from __future__ import annotations


import shutil
import subprocess
from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_frames(frames: np.ndarray, size: int = 224) -> np.ndarray:
    """[T, H, W, 3] uint8 -> [T, size, size, 3] float32, CLIP-normalized
    (resize shorter side to ``size`` bilinearly, center crop)."""
    t, h, w, _ = frames.shape
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    # bilinear resize via separable linear interpolation
    ys = np.linspace(0, h - 1, nh)
    xs = np.linspace(0, w - 1, nw)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    f = frames.astype(np.float32)
    top = f[:, y0][:, :, x0] * (1 - wx) + f[:, y0][:, :, x1] * wx
    bot = f[:, y1][:, :, x0] * (1 - wx) + f[:, y1][:, :, x1] * wx
    resized = top * (1 - wy) + bot * wy
    # center crop
    oy = (nh - size) // 2
    ox = (nw - size) // 2
    crop = resized[:, oy:oy + size, ox:ox + size]
    return ((crop / 255.0 - CLIP_MEAN) / CLIP_STD).astype(np.float32)


def decode_video_1fps(video_path: str, size: int = 224) -> np.ndarray:
    """1-FPS RGB frames via ffmpeg (demo_vid2seq.py:84-90); raises if ffmpeg
    is unavailable."""
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not available; provide frames directly")
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0", "-show_entries",
         "stream=width,height", "-of", "csv=p=0", video_path],
        capture_output=True, text=True, check=True).stdout.strip()
    w, h = (int(x) for x in probe.split(","))
    proc = subprocess.run(
        ["ffmpeg", "-i", video_path, "-vf", "fps=1", "-f", "rawvideo",
         "-pix_fmt", "rgb24", "-v", "error", "-"],
        capture_output=True, check=True)
    frames = np.frombuffer(proc.stdout, np.uint8).reshape(-1, h, w, 3)
    return frames


class CLIPFeatureExtractor:
    """Batched jit'd CLIP image tower over frame arrays."""

    def __init__(self, encoder, params, batch_size: int = 64):
        import jax

        self.encoder = encoder
        self.params = params
        self.batch_size = batch_size
        self._encode = jax.jit(
            lambda p, x: encoder.apply({"params": p}, x))

    # in-flight device batches: enough to overlap H2D/compute/D2H, small
    # enough that a multi-hour video (thousands of frames) never holds
    # more than a few input/output buffers in HBM at once
    MAX_IN_FLIGHT = 3

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        """[T, H, W, 3] uint8 or preprocessed float -> [T, D] features.

        Chunks are dispatched ahead of the fetches (jax execution is
        async, so host D2H of chunk i overlaps device encode of chunk
        i+1) with a bounded in-flight window."""
        import jax.numpy as jnp

        if frames.dtype == np.uint8:
            frames = preprocess_frames(frames)
        bs = self.batch_size
        n = len(frames)
        pending = []
        feats = []
        for s in range(0, n, bs):
            chunk = frames[s:s + bs]
            keep = len(chunk)
            if keep < bs:  # static-shape pad for one compiled program
                pad = np.zeros((bs - keep,) + chunk.shape[1:], chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            pending.append((self._encode(self.params, jnp.asarray(chunk)),
                            keep))
            if len(pending) >= self.MAX_IN_FLIGHT:
                out, k = pending.pop(0)
                feats.append(np.asarray(out)[:k])
        feats.extend(np.asarray(out)[:k] for out, k in pending)
        return np.concatenate(feats, axis=0)


def extract_features_sharded(video_paths: Sequence[str], out_dir: str,
                             extractor: Callable[[np.ndarray], np.ndarray],
                             decode_fn: Optional[Callable[[str], np.ndarray]] = None,
                             seed: int = 0, prefetch: int = 2,
                             decode_workers: int = 1) -> int:
    """Idempotent sharded feature extraction (same resume pattern as the ASR
    factory: skip existing outputs, shuffle work).

    Video decode runs on ``decode_workers`` background threads ``prefetch``
    videos ahead so the CPU decode overlaps device encoding — the
    reference's VideoLoader decodes synchronously between GPU batches
    (run_on_video/data_utils.py:9-31), roughly halving its throughput.
    ``prefetch=0`` reproduces that synchronous behavior (bench contrast
    mode)."""
    from concurrent.futures import ThreadPoolExecutor

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    decode_fn = decode_fn or decode_video_1fps
    paths = list(video_paths)
    np.random.default_rng(seed).shuffle(paths)
    todo = [p for p in paths
            if not (out / (Path(p).stem + ".npy")).exists()]
    done = 0

    def save(path: str, frames: np.ndarray) -> int:
        target = out / (Path(path).stem + ".npy")
        if target.exists():  # another shard may have raced us
            return 0
        np.save(target, extractor(frames).astype(np.float32))
        return 1

    if prefetch <= 0:  # synchronous decode-between-batches (reference mode)
        for path in todo:
            done += save(path, decode_fn(path))
        return done
    prefetch = max(prefetch, decode_workers)
    with ThreadPoolExecutor(max_workers=max(1, decode_workers)) as pool:
        futures = {}
        for i, path in enumerate(todo[:prefetch]):
            futures[i] = pool.submit(decode_fn, path)
        for i, path in enumerate(todo):
            frames = futures.pop(i).result()
            nxt = i + prefetch
            if nxt < len(todo):
                futures[nxt] = pool.submit(decode_fn, todo[nxt])
            done += save(path, frames)
    return done
