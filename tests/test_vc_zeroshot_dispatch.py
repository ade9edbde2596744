"""Raw-video path in the VC dataset + BLIP-2/LLaMA eval dispatches
(vc.py:109-154, 268-283) and the zero-shot captioner/titler adapters."""

import json

import numpy as np

from vidchapters_tpu.config import DataConfig
from vidchapters_tpu.data.vc_dataset import (
    VideoCaptioningDataset,
    get_raw_video,
    vc_collate,
)
from vidchapters_tpu.train.vc_train import (
    VC_BLIP2_PROMPT,
    VC_LLAMA_PROMPT,
    evaluate_vc_blip2,
    evaluate_vc_llama,
)
from vidchapters_tpu.zeroshot.speech_vcg import LLM_PROMPT, make_llm_titler
from vidchapters_tpu.zeroshot.visual_vcg import (
    BLIP2_PROMPT,
    make_blip2_captioner,
)


def _make_ds(tmp_path, with_videos):
    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir(exist_ok=True)
    ann, vid2path = {}, {}
    for i in range(2):
        vid = f"vvvvvvvvv{i:02d}"
        ann[vid] = {"duration": 40.0,
                    "timestamps": [[0.0, 20.0], [20.0, 40.0]],
                    "sentences": ["intro part", "main part"]}
        np.save(feat_dir / f"{vid[-11:]}.npy",
                rng.normal(size=(40, 16)).astype(np.float32))
        vid2path[vid[-11:]] = str(tmp_path / "missing.mp4")  # decode fails
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    cfg = DataConfig(max_feats=8, features_dim=16, max_input_tokens=32,
                     max_output_tokens=16)
    return VideoCaptioningDataset(
        str(ann_path), str(feat_dir), training=False, cfg=cfg,
        videos_path=vid2path if with_videos else None)


def test_get_raw_video_fallback_zeros():
    out = get_raw_video("/nonexistent/video.mp4")
    assert out.shape == (1, 224, 224, 3)
    assert out.dtype == np.uint8
    assert (out == 0).all()


def test_vc_dataset_raw_first_frames(tmp_path):
    ds = _make_ds(tmp_path, with_videos=True)
    ex = ds[0]
    # one first-frame per clip (vc.py:111 raw_video[0, :, 0])
    assert ex["raw_first_frames"].shape == (2, 224, 224, 3)
    batch = vc_collate([ex])
    assert batch["raw_first_frames"].shape == (1, 2, 224, 224, 3)
    # without videos_path the key is absent (feature-only mode)
    ds2 = _make_ds(tmp_path, with_videos=False)
    assert "raw_first_frames" not in ds2[0]


def test_evaluate_vc_blip2_dispatch(tmp_path):
    ds = _make_ds(tmp_path, with_videos=True)
    seen_prompts = []

    def caption_fn(frames, prompt):
        seen_prompts.append(prompt)
        assert frames.shape[1:] == (224, 224, 3)
        return [f"caption {i}" for i in range(frames.shape[0])]

    results, metrics = evaluate_vc_blip2(ds, caption_fn)
    assert len(results) == 4  # 2 videos x 2 clips
    assert all(p == VC_BLIP2_PROMPT for p in seen_prompts)
    assert "CIDEr" in metrics


def test_evaluate_vc_llama_dispatch(tmp_path):
    ds = _make_ds(tmp_path, with_videos=False)
    prompts = []

    def generate_fn(prompt):
        prompts.append(prompt)
        return " A generated title"

    results, metrics = evaluate_vc_llama(ds, generate_fn)
    assert len(results) == 4
    assert all(p.startswith(VC_LLAMA_PROMPT[:40]) for p in prompts)
    assert results[0]["sentence"] == "A generated title"
    assert "CIDEr" in metrics


def test_make_blip2_captioner_adapter():
    def caption_fn(frames, prompt):
        assert prompt == BLIP2_PROMPT
        assert frames.shape == (1, 224, 224, 3)
        return [" A shot caption "]

    frame = np.zeros((224, 224, 3), np.uint8)
    captioner = make_blip2_captioner(caption_fn, lambda sec: frame)
    assert captioner(12.5) == "A shot caption"


def test_run_visual_vcg_raw_fallbacks(tmp_path):
    """No ffprobe/video available -> one whole-video shot, zero frames,
    still produces a scored submission."""
    from vidchapters_tpu.zeroshot.run import run_visual_vcg_raw

    ann = {"vvvvvvvvv00": {"duration": 30.0, "timestamps": [[0.0, 30.0]],
                           "sentences": ["a chapter"]}}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    def caption_fn(frames, prompt):
        assert frames.ndim == 4
        return ["Generated title"] * frames.shape[0]

    results, metrics = run_visual_vcg_raw(
        str(ann_path), {"vvvvvvvvv00": str(tmp_path / "missing.mp4")},
        caption_fn)
    assert results["vvvvvvvvv00"][0]["sentence"] == "Generated title"
    assert "soda_c" in metrics


def test_make_llm_titler_reference_prompt():
    seen = {}

    def generate_fn(prompt):
        seen["prompt"] = prompt
        return " The Title\nextra line"

    titler = make_llm_titler(generate_fn)
    title = titler(["hello world", "more text"])
    assert title == "The Title"
    # reference prompt shape: trailing period added, 'Chapter title:' suffix
    assert seen["prompt"] == LLM_PROMPT.format("hello world more text.")


def test_vc_main_eval_random_cli(tmp_path):
    """`vc_main --eval --model-type random` scores the ASR text as the
    prediction (vc.py --random, vc.py:109-110) through the real CLI."""
    import subprocess
    import sys

    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    ann = {}
    for i in range(2):
        vid = f"wwwwwwwww{i:02d}"
        ann[vid] = {"duration": 40.0,
                    "timestamps": [[0.0, 20.0], [20.0, 40.0]],
                    "sentences": ["intro part", "main part"]}
        np.save(feat_dir / f"{vid[-11:]}.npy",
                rng.normal(size=(40, 16)).astype(np.float32))
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    (tmp_path / "dcfg.json").write_text(json.dumps(
        {"max_feats": 8, "features_dim": 16, "max_input_tokens": 32,
         "max_output_tokens": 16}))
    import os

    env = dict(os.environ, PYTHONPATH=os.getcwd(), JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "vidchapters_tpu.train.vc_main",
         "--eval", "--model-type", "random",
         "--val-json", str(tmp_path / "ann.json"),
         "--features-path", str(feat_dir),
         "--data-config", str(tmp_path / "dcfg.json"),
         "--save-dir", str(tmp_path / "out")],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert "CIDEr" in metrics
