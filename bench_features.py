"""Feature-factory throughput: CLIP ViT-L/14 frame encoding on one chip.

The reference extracts CLIP ViT-L/14 features per frame with the pip
``clip`` package under PyTorch (run_on_video/data_utils.py, demo
preprocessing at /root/reference/demo_vid2seq.py:98-99); this measures the
JAX tower (models/clip.py) at ViT-L/14 scale, bf16, jit'd, one v5e chip.

    python bench_features.py [--batch 128] [--reps 20]

End-to-end factory mode (decode -> preprocess -> encode -> .npy through
``extract_features_sharded``), measuring the async decode-prefetch pipeline
against the reference's synchronous decode-between-GPU-batches VideoLoader
(run_on_video/data_utils.py:9-49):

    python bench_features.py --e2e [--videos 8] [--frames 240]
        [--decode-workers 4]

Videos are real encoded media when ffmpeg is present (testsrc h264),
otherwise per-frame JPEGs decoded with PIL — either way the decode stage
pays real CPU work per frame. Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _tower_bench(a) -> None:
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


def _synth_videos(root: Path, n_videos: int, n_frames: int,
                  size=(480, 360)) -> tuple:
    """Synthesize decodable media: h264 via ffmpeg when available, else
    per-frame JPEGs (PIL). Returns (paths, decode_fn)."""
    w, h = size
    if shutil.which("ffmpeg"):
        paths = []
        for i in range(n_videos):
            path = root / f"vid{i:03d}.mp4"
            subprocess.run(
                ["ffmpeg", "-y", "-loglevel", "error", "-f", "lavfi", "-i",
                 f"testsrc=duration={n_frames}:size={w}x{h}:rate=1",
                 str(path)], check=True)
            paths.append(str(path))
        from vidchapters_tpu.factory.features import decode_video_1fps

        return paths, decode_video_1fps

    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_videos):
        vdir = root / f"vid{i:03d}"
        vdir.mkdir()
        # structured frames so JPEG decode cost is realistic (not noise)
        base = rng.integers(0, 255, size=(h // 8, w // 8, 3), dtype=np.uint8)
        frame = np.kron(base, np.ones((8, 8, 1), np.uint8))
        for t in range(n_frames):
            Image.fromarray(np.roll(frame, t * 3, axis=1)).save(
                vdir / f"{t:05d}.jpg", quality=85)
        paths.append(str(vdir))

    def decode_jpeg_dir(path: str) -> np.ndarray:
        files = sorted(Path(path).glob("*.jpg"))
        return np.stack([np.asarray(Image.open(f).convert("RGB"))
                         for f in files])

    return paths, decode_jpeg_dir


def _e2e_bench(a) -> None:
    from vidchapters_tpu.factory.features import (
        CLIPFeatureExtractor,
        extract_features_sharded,
    )
    from vidchapters_tpu.models.clip import VIT_L14, CLIPImageEncoder

    root = Path(tempfile.mkdtemp(prefix="bench_feat_"))
    paths, decode_fn = _synth_videos(root, a.videos, a.frames)
    enc = CLIPImageEncoder(VIT_L14)
    params = enc.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 224, 224, 3), jnp.float32))["params"]
    extractor = CLIPFeatureExtractor(enc, params, batch_size=a.batch)
    total_frames = a.videos * a.frames

    # warm the compiled tower, and decode EVERY video once so both timed
    # arms read a warm page cache — otherwise the sync arm (which runs
    # first) pays cold-media page-in the pipelined arm never sees, and
    # pipeline_speedup is inflated
    extractor(decode_fn(paths[0])[: a.batch])
    for p in paths:
        decode_fn(p)

    results = {}
    for mode, prefetch, workers in (
            ("sync", 0, 1),  # reference VideoLoader behavior
            ("pipelined", max(2, a.decode_workers), a.decode_workers)):
        out_dir = root / f"out_{mode}"
        t0 = time.perf_counter()
        n = extract_features_sharded(paths, str(out_dir), extractor,
                                     decode_fn=decode_fn, prefetch=prefetch,
                                     decode_workers=workers)
        dt = time.perf_counter() - t0
        assert n == a.videos, (mode, n)
        results[mode] = total_frames / dt
    shutil.rmtree(root, ignore_errors=True)

    print(json.dumps({
        "metric": "clip_factory_e2e_frames_per_sec_per_chip",
        "value": round(results["pipelined"], 1),
        "unit": "frames/s",
        "sync_frames_per_sec": round(results["sync"], 1),
        "pipeline_speedup": round(results["pipelined"] / results["sync"], 2),
        "decode_workers": a.decode_workers,
        "videos": a.videos,
        "frames_per_video": a.frames,
        # reference end-to-end estimate: ~600 frames/s tower halved by the
        # synchronous ffmpeg VideoLoader (BASELINE.md CLIP row method)
        "vs_baseline": round(results["pipelined"] / 300.0, 2),
    }))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--e2e", action="store_true",
                   help="decode -> features factory pipeline instead of the "
                        "tower-only microbench")
    p.add_argument("--videos", type=int, default=8)
    p.add_argument("--frames", type=int, default=240,
                   help="1-FPS frames per synthetic video")
    p.add_argument("--decode-workers", type=int, default=4)
    a = p.parse_args()
    if a.e2e:
        _e2e_bench(a)
    else:
        _tower_bench(a)


if __name__ == "__main__":
    main()
