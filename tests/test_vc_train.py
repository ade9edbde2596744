"""VC (GT-boundary captioning) pipeline: dataset, train step, eval."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import (
    DataConfig,
    GenerationConfig,
    T5Config,
    TemporalViTConfig,
    Vid2SeqConfig,
)
from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer
from vidchapters_tpu.data.vc_dataset import VideoCaptioningDataset, vc_collate
from vidchapters_tpu.models.vid2seq import Vid2Seq
from vidchapters_tpu.train.vc_train import (
    evaluate_vc,
    make_vc_train_step,
    strip_time_tokens,
    tokenize_batch,
)


@pytest.fixture
def vc_data(tmp_path):
    rng = np.random.default_rng(0)
    ann = {"uuuuuuuuu01": {
        "duration": 60.0,
        "timestamps": [[0.0, 30.0], [30.0, 60.0]],
        "sentences": ["opening chapter", "closing chapter"]}}
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    fdir = tmp_path / "f"
    fdir.mkdir()
    np.save(fdir / "uuuuuuuuu01"[-11:],
            rng.normal(size=(60, 8)).astype(np.float32))
    import pickle

    subs = {"uuuuuuuuu01"[-11:]: {
        "text": ["hello there", "goodbye now"],
        "start": [1.0, 40.0], "end": [5.0, 50.0]}}
    sp = tmp_path / "s.pkl"
    sp.write_bytes(pickle.dumps(subs))
    cfg = DataConfig(max_feats=8, features_dim=8, max_input_tokens=32,
                     max_output_tokens=16)
    return str(p), str(fdir), str(sp), cfg


def test_vc_dataset_train_and_eval_modes(vc_data, rng):
    ann_path, fdir, sp, cfg = vc_data
    train_ds = VideoCaptioningDataset(ann_path, fdir, training=True, cfg=cfg,
                                      subtitles_path=sp)
    ex = train_ds.__getitem__(0, rng=rng)
    assert ex["video"].shape == (8, 8)
    assert isinstance(ex["output_text"], str)
    eval_ds = VideoCaptioningDataset(ann_path, fdir, training=False, cfg=cfg,
                                     subtitles_path=sp)
    ex = eval_ds[0]
    assert ex["video"].shape == (2, 8, 8)  # one clip per GT boundary
    # ASR windows respect clip boundaries: first clip gets the first line
    assert "Hello there." in ex["input_text"][0]
    assert ex["input_text"][1] == "Goodbye now."
    assert ex["output_text"] == ["Opening chapter.", "Closing chapter."]


def test_tokenize_batch_and_strip():
    tok = ByteLevelTokenizer()
    out = tokenize_batch(["hi", "a longer sentence"], tok, max_tokens=8)
    assert out.shape == (2, 8)
    assert out[0, 2] == tok.eos_token_id
    params = {"t5": {"shared": {"embedding": np.ones((32200, 4))}}}
    stripped = strip_time_tokens(params, num_bins=100)
    assert stripped["t5"]["shared"]["embedding"].shape == (32100, 4)


@pytest.mark.slow
def test_vc_train_and_eval_end_to_end(vc_data, rng):
    import optax

    ann_path, fdir, sp, cfg = vc_data
    t5 = T5Config(vocab_size=32200, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                  num_decoder_layers=1, num_heads=4,
                  relative_attention_num_buckets=8,
                  relative_attention_max_distance=16, dtype="float32",
                  dropout_rate=0.0, encoder_dropout=0.0, decoder_dropout=0.0)
    vit = TemporalViTConfig(num_features=8, embed_dim=8, depth=1, num_heads=2,
                            mlp_dim=16, dtype="float32")
    mcfg = Vid2SeqConfig(t5=t5, vit=vit)
    model = Vid2Seq(mcfg)
    tok = ByteLevelTokenizer()

    ds = VideoCaptioningDataset(ann_path, fdir, training=True, cfg=cfg,
                                subtitles_path=sp)
    batch = vc_collate([ds.__getitem__(0, rng=rng)])
    inp = tokenize_batch(batch["input_text"], tok, cfg.max_input_tokens)
    out_toks = tokenize_batch(batch["output_text"], tok, cfg.max_output_tokens)
    arrays = {"video": jnp.asarray(batch["video"]),
              "input_tokens": jnp.asarray(inp),
              "output_tokens": jnp.asarray(out_toks)}

    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(0)},
                        arrays["video"], arrays["input_tokens"],
                        jnp.ones_like(arrays["input_tokens"]),
                        arrays["output_tokens"])["params"]
    tx = optax.adam(1e-3)
    from vidchapters_tpu.train.dvc_train import TrainState

    step = jax.jit(make_vc_train_step(model, tx))
    state = TrainState(params, tx.init(params), jnp.array(0))
    for _ in range(2):
        state, metrics = step(state, arrays, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

    eval_ds = VideoCaptioningDataset(ann_path, fdir, training=False, cfg=cfg,
                                     subtitles_path=sp)
    results, metrics = evaluate_vc(model, state.params, eval_ds, tok,
                                   GenerationConfig(num_beams=1, max_length=8),
                                   max_input_tokens=cfg.max_input_tokens)
    assert len(results) == 2
    assert "CIDEr" in metrics and "METEOR" in metrics


def test_evaluate_vc_with_captioner(vc_data):
    from vidchapters_tpu.train.vc_train import evaluate_vc_with_captioner
    from vidchapters_tpu.data.vc_dataset import VideoCaptioningDataset

    ann_path, fdir, sp, cfg = vc_data
    ds = VideoCaptioningDataset(ann_path, fdir, training=False, cfg=cfg,
                                subtitles_path=sp)
    results, metrics = evaluate_vc_with_captioner(
        ds, captioner=lambda clip, asr: "A generated caption.")
    assert len(results) == 2
    assert "CIDEr" in metrics


@pytest.mark.slow
def test_vc_main_end_to_end(vc_data):
    from vidchapters_tpu.train.vc_main import main

    ann_path, fdir, sp, cfg = vc_data
    t5 = T5Config(vocab_size=32200, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                  num_decoder_layers=1, num_heads=4,
                  relative_attention_num_buckets=8,
                  relative_attention_max_distance=16, dtype="float32",
                  dropout_rate=0.0, encoder_dropout=0.0, decoder_dropout=0.0)
    vit = TemporalViTConfig(num_features=8, embed_dim=8, depth=1, num_heads=2,
                            mlp_dim=16, dtype="float32")
    import tempfile

    with tempfile.TemporaryDirectory() as save_dir:
        metrics = main(ann_path, ann_path, fdir,
                       Vid2SeqConfig(t5=t5, vit=vit), cfg, save_dir,
                       subtitles_path=sp, n_epochs=1, batch_size=1,
                       generation=GenerationConfig(num_beams=1, max_length=8))
        assert "CIDEr" in metrics
        import os

        assert os.path.exists(os.path.join(save_dir, "log.txt"))
