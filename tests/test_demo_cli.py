"""End-to-end CLI tests for the two user-facing demos.

- ``demo/demo_vid2seq.py`` (reference demo_vid2seq.py:24-197): features ->
  ASR time+text tokens -> generate -> ``<time=k>`` regex decode, driven
  through the real argparse ``main()``.
- ``demo/run_on_video.py`` (reference moment_detr/run_on_video/run.py:12-80):
  ``MomentDETRPredictor.localize_moment`` schema + the ffmpeg decode path.

Every stitched component has its own unit test elsewhere; these cover the
stitching (arg plumbing, subsample/pad, tokenizer round trips, output
schemas) where integration rot happens.
"""

import json
import shutil
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import (
    DataConfig,
    ExperimentConfig,
    GenerationConfig,
    T5Config,
    TemporalViTConfig,
    Vid2SeqConfig,
    save_config,
)
from vidchapters_tpu.data.tokenizer import build_tokenizer
from vidchapters_tpu.utils.io import save_pickle


def _tiny_vid2seq_config(tmp_path) -> str:
    """A CPU-sized Vid2Seq saved as an experiment json for --config."""
    t5 = T5Config(vocab_size=32200, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                  num_decoder_layers=1, num_heads=4,
                  relative_attention_num_buckets=8,
                  relative_attention_max_distance=16, dtype="float32",
                  dropout_rate=0.0, encoder_dropout=0.0, decoder_dropout=0.0)
    vit = TemporalViTConfig(num_features=8, embed_dim=8, depth=1, num_heads=2,
                            mlp_dim=16, dtype="float32")
    cfg = ExperimentConfig(
        model=Vid2SeqConfig(t5=t5, vit=vit, num_bins=100),
        data=DataConfig(max_feats=8, features_dim=8, max_input_tokens=32,
                        max_output_tokens=24),
        generation=GenerationConfig(num_beams=1, max_length=16),
    )
    path = tmp_path / "exp.json"
    save_config(cfg, str(path))
    return str(path)


def _demo_inputs(tmp_path, n_frames=50, dim=8):
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(n_frames, dim)).astype(np.float32)
    feat_path = tmp_path / "feats.npy"
    np.save(feat_path, feats)
    asr_path = tmp_path / "asr.pkl"
    save_pickle({"text": ["today we bake bread"], "start": [2.0],
                 "end": [8.0]}, str(asr_path))
    return str(feat_path), str(asr_path)


def test_demo_vid2seq_cli_oracle_roundtrip(tmp_path, monkeypatch):
    """Drive the full CLI with a generate oracle: the ASR must arrive as
    quantized time+text tokens (demo_vid2seq.py:141-150 semantics) and the
    emitted ids must round-trip the <time=k> regex decode into chapters
    (demo_vid2seq.py:172-197)."""
    from vidchapters_tpu.demo import demo_vid2seq

    cfg_path = _tiny_vid2seq_config(tmp_path)
    feat_path, asr_path = _demo_inputs(tmp_path)
    duration = 50.0  # frames at 1 FPS

    tok = build_tokenizer("", num_bins=100)
    caption_ids = tok.encode("hello world", add_special_tokens=False)
    oracle_ids = np.array([[tok.time_token_id(10), tok.time_token_id(20),
                            *caption_ids, tok.eos_token_id]], np.int32)
    seen = {}

    def fake_make_generate_fn(model, gen_cfg):
        def generate(params, video, input_tokens, rng):
            seen["video"] = np.asarray(video)
            seen["input_tokens"] = np.asarray(input_tokens)
            return jnp.asarray(oracle_ids)

        return generate

    monkeypatch.setattr("vidchapters_tpu.train.dvc_train.make_generate_fn",
                        fake_make_generate_fn)

    out_path = tmp_path / "chapters.json"
    chapters = demo_vid2seq.main([
        "--config", cfg_path, "--features_path", feat_path,
        "--asr_path", asr_path, "--max_feats", "8",
        "--max_input_tokens", "32", "--num_beams", "1",
        "--max_output_tokens", "16", "--out_path", str(out_path)])

    # input plumbing: [t_start, t_end, text...] with the reference
    # quantization int((num_bins-1)*t/duration) (dvc_dataset.py:88-91)
    num_text = len(tok) - 100
    assert seen["input_tokens"].shape == (1, 32)
    assert seen["input_tokens"][0, 0] == int(99 * 2.0 / duration) + num_text
    assert seen["input_tokens"][0, 1] == int(99 * 8.0 / duration) + num_text
    assert seen["video"].shape == (1, 8, 8)

    # output decode: bins 10/20 de-quantized via token*duration/(num_bins-1)
    assert len(chapters) == 1
    st, ed = chapters[0]["timestamp"]
    assert st == pytest.approx(10 * duration / 99)
    assert ed == pytest.approx(20 * duration / 99)
    assert chapters[0]["sentence"] == "hello world"
    assert json.loads(out_path.read_text()) == chapters


@pytest.mark.slow
def test_demo_vid2seq_cli_tiny_checkpoint(tmp_path):
    """The real path end to end at tiny scale: import a fabricated
    released-layout .pth (--ckpt_path), beam-search decode, regex-decode
    chapters. Checks the demo runs and every chapter is well-formed."""
    torch = pytest.importorskip("torch")
    from tests.test_checkpoint_import_fullscale import (
        _synth_reference_state_dict,
    )
    from vidchapters_tpu.demo import demo_vid2seq

    cfg_path = _tiny_vid2seq_config(tmp_path)
    feat_path, asr_path = _demo_inputs(tmp_path)

    rng = np.random.default_rng(1)
    sd = _synth_reference_state_dict(
        rng, vocab=32200, d=32, heads=4, dkv=8, dff=64, layers=1,
        rel_buckets=8, vit_mlp=16, vit_depth=1, vit_d=8, vit_feats=8)
    sd["proj_v2t.weight"] = rng.normal(scale=0.02, size=(32, 8)).astype(
        np.float32)
    sd["proj_v2t.bias"] = np.zeros(32, np.float32)
    ckpt = tmp_path / "released.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               str(ckpt))

    out_path = tmp_path / "chapters.json"
    chapters = demo_vid2seq.main([
        "--config", cfg_path, "--features_path", feat_path,
        "--asr_path", asr_path, "--ckpt_path", str(ckpt),
        "--max_feats", "8", "--max_input_tokens", "32",
        "--num_beams", "2", "--max_output_tokens", "16",
        "--out_path", str(out_path)])

    assert isinstance(chapters, list)
    duration = 50.0
    for ch in chapters:
        st, ed = ch["timestamp"]
        assert 0.0 <= st < ed <= duration
        assert isinstance(ch["sentence"], str)
    assert json.loads(out_path.read_text()) == chapters


# ---------------------------------------------------------------------------
# run_on_video MomentDETRPredictor (run.py:12-80)
# ---------------------------------------------------------------------------


def _tiny_predictor(extractor=None):
    from vidchapters_tpu.config import GroundingConfig
    from vidchapters_tpu.data.clip_tokenizer import CLIPTokenizer
    from vidchapters_tpu.demo.run_on_video import MomentDETRPredictor
    from vidchapters_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    from vidchapters_tpu.models.grounding import MomentDETR

    tcfg = CLIPTextConfig(vocab_size=49408, context_length=77, width=16,
                          layers=1, heads=2, output_dim=12, mlp_dim=32,
                          dtype="float32")
    text_encoder = CLIPTextEncoder(tcfg)
    tokenizer = CLIPTokenizer()
    toks = jnp.asarray(tokenizer(["init"]))
    text_params = text_encoder.init(jax.random.PRNGKey(0), toks)["params"]

    gcfg = GroundingConfig(hidden_dim=32, nheads=4, enc_layers=1,
                           dec_layers=1, dim_feedforward=64, num_queries=5,
                           v_feat_dim=10, t_feat_dim=12, dropout=0.0,
                           input_dropout=0.0, max_v_l=30, clip_length=2)
    model = MomentDETR(gcfg)
    src_txt = text_encoder.apply({"params": text_params}, toks,
                                 return_tokens=True)
    params = model.init(
        jax.random.PRNGKey(1), src_txt,
        jnp.ones(src_txt.shape[:2], jnp.int32),
        jnp.zeros((1, 30, 10), jnp.float32),
        jnp.ones((1, 30), jnp.int32))["params"]
    return MomentDETRPredictor(
        model, params, text_encoder, text_params, tokenizer,
        feature_extractor=extractor, clip_len=2.0, max_v_l=30,
        v_feat_dim=10), gcfg


def test_run_on_video_predictor_schema():
    """localize_moment returns the run.py:25-80 schema: ranked windows
    inside [0, duration] and per-clip saliency, one row per query."""
    predictor, gcfg = _tiny_predictor()
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(30, 8)).astype(np.float32)
    queries = ["baking the bread", "kneading the dough"]
    out = predictor.localize_moment(None, queries, video_features=feats)

    assert len(out) == len(queries)
    duration = 30 * 2.0
    for row, q in zip(out, queries):
        assert set(row) == {"query", "vid", "pred_relevant_windows",
                            "pred_saliency_scores"}
        assert row["query"] == q
        windows = row["pred_relevant_windows"]
        assert len(windows) == gcfg.num_queries
        scores = [w[2] for w in windows]
        assert scores == sorted(scores, reverse=True)  # confidence-ranked
        for st, ed, _ in windows:
            assert 0.0 <= st <= duration and 0.0 <= ed <= duration
        assert len(row["pred_saliency_scores"]) == 30


def test_run_on_video_ffmpeg_decode_path(tmp_path):
    """The raw-video path: ffmpeg color-bars -> 1 FPS decode -> clip_len
    stride -> injected tiny extractor -> localized moments
    (data_utils.py:9-49 semantics)."""
    if not shutil.which("ffmpeg"):
        pytest.skip("ffmpeg not installed")
    video = tmp_path / "bars.mp4"
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-f", "lavfi",
         "-i", "testsrc=duration=12:size=64x64:rate=5", str(video)],
        check=True)

    calls = {}

    def extractor(frames):
        frames = np.asarray(frames, np.float32)
        calls["n_frames"] = len(frames)
        flat = frames.reshape(len(frames), -1)
        cols = np.linspace(0, flat.shape[1] - 1, 8).astype(int)
        return flat[:, cols] / 255.0

    predictor, _ = _tiny_predictor(extractor)
    out = predictor.localize_moment(str(video), ["the color bars"])
    # 12 s at 1 FPS = ~12 frames, strided by clip_len 2 -> ~6 features
    assert 4 <= calls["n_frames"] <= 7
    assert len(out) == 1
    assert len(out[0]["pred_saliency_scores"]) == calls["n_frames"]
