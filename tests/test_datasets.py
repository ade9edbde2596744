import numpy as np
import pytest

from vidchapters_tpu.config import DataConfig
from vidchapters_tpu.data.dvc_dataset import (
    DenseVideoCaptioningDataset,
    EpochIterator,
    SubtitleSource,
    collate,
    pad_to,
)
from vidchapters_tpu.data.features import FeatureSource, subsample_or_pad
from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer


def test_subsample_long_video():
    video = np.arange(250, dtype=np.float32)[:, None].repeat(4, 1)
    out = subsample_or_pad(video, 100, 4)
    assert out.shape == (100, 4)
    # integer-stride rule: out[j] = video[(j * 250) // 100]
    for j in [0, 1, 50, 99]:
        assert out[j, 0] == (j * 250) // 100


def test_pad_short_video():
    video = np.ones((30, 4), np.float32)
    out = subsample_or_pad(video, 100, 4)
    assert out.shape == (100, 4)
    assert out[:30].sum() == 120
    assert out[30:].sum() == 0


@pytest.fixture
def tiny_dataset(tmp_path):
    import json

    ann = {
        "xxxxxxvid01": {"duration": 100.0,
                        "timestamps": [[0.0, 50.0], [50.0, 100.0]],
                        "sentences": ["first part", "second part"]},
        "xxxxxxvid02": {"duration": 60.0,
                        "timestamps": [[0.0, 60.0]],
                        "sentences": ["only chapter"]},
    }
    json_path = tmp_path / "ann.json"
    json_path.write_text(json.dumps(ann))
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    for vid in ann:
        np.save(feat_dir / f"{vid[-11:]}.npy",
                rng.normal(size=(rng.integers(5, 200), 8)).astype(np.float32))
    subs = {
        "xxxxxxvid01"[-11:]: {"text": ["hello there", "more speech"],
                              "start": [0.0, 40.0], "end": [30.0, 90.0]},
    }
    import pickle

    subs_path = tmp_path / "subs.pkl"
    subs_path.write_bytes(pickle.dumps(subs))
    tok = ByteLevelTokenizer(num_bins=100)
    cfg = DataConfig(max_feats=16, features_dim=8, max_input_tokens=64,
                     max_output_tokens=48)
    ds = DenseVideoCaptioningDataset(str(json_path), str(feat_dir), tok,
                                     cfg, subtitles_path=str(subs_path))
    return ds, tok, cfg


def test_dataset_example_structure(tiny_dataset, rng):
    ds, tok, cfg = tiny_dataset
    ex = ds.__getitem__(0, rng=rng)
    assert ex["video"].shape == (16, 8)
    assert ex["output_tokens"][-1] == tok.eos_token_id
    # output starts with two time tokens
    assert tok.is_time_token(ex["output_tokens"][0])
    assert tok.is_time_token(ex["output_tokens"][1])
    # subtitle video has a real input sequence with time tokens
    assert len(ex["input_tokens"]) > 1
    assert tok.is_time_token(ex["input_tokens"][0])
    # denoising pair contains sentinels just below time tokens
    assert any(32000 <= t < 32100 for t in ex["denoising_input_tokens"])


def test_dataset_no_subtitles(tiny_dataset, rng):
    ds, tok, cfg = tiny_dataset
    ex = ds.__getitem__(1, rng=rng)  # vid02 has no subtitles
    assert list(ex["input_tokens"]) == [tok.eos_token_id]
    assert list(ex["denoising_input_tokens"]) == [0]


def test_collate_static_shapes(tiny_dataset, rng):
    ds, tok, cfg = tiny_dataset
    examples = [ds.__getitem__(i, rng=rng) for i in range(2)]
    batch = collate(examples, cfg.max_input_tokens, cfg.max_output_tokens)
    assert batch["video"].shape == (2, 16, 8)
    assert batch["input_tokens"].shape == (2, 64)
    assert batch["output_tokens"].shape == (2, 48)
    assert batch["video_id"] == ["xxxxxxvid01", "xxxxxxvid02"]


def test_epoch_iterator_sharding(tiny_dataset):
    ds, tok, cfg = tiny_dataset
    it0 = EpochIterator(ds, batch_size=1, cfg=cfg, num_shards=2, shard_index=0,
                        seed=1)
    it1 = EpochIterator(ds, batch_size=1, cfg=cfg, num_shards=2, shard_index=1,
                        seed=1)
    vids0 = [b["video_id"][0] for b in it0]
    vids1 = [b["video_id"][0] for b in it1]
    assert set(vids0) | set(vids1) == {"xxxxxxvid01", "xxxxxxvid02"}
    assert not set(vids0) & set(vids1)


def test_epoch_iterator_shuffle_determinism(tiny_dataset):
    ds, tok, cfg = tiny_dataset
    it = EpochIterator(ds, batch_size=2, cfg=cfg, seed=3)
    it.set_epoch(0)
    a = [b["video_id"] for b in it]
    it.set_epoch(0)
    b = [x["video_id"] for x in it]
    assert a == b


def test_checkpoint_manager_roundtrip(tmp_path):
    from vidchapters_tpu.runtime.checkpoint import CheckpointManager

    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": np.zeros(3, np.float32)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), best_metric="CIDEr")
    mgr.save_last(tree, epoch=0)
    assert mgr.maybe_save_best(tree, 0, {"CIDEr": 1.0})
    assert not mgr.maybe_save_best(tree, 1, {"CIDEr": 0.5})
    tree2 = {"w": np.array(tree["w"] * 2), "b": tree["b"]}
    assert mgr.maybe_save_best(tree2, 2, {"CIDEr": 2.0})
    target = {"w": np.zeros((2, 3), np.float32), "b": np.zeros(3, np.float32)}
    restored = mgr.restore("best", target)
    np.testing.assert_array_equal(restored["w"], tree2["w"])
    assert mgr.meta("best")["epoch"] == 2
    # fresh manager preserves best value
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), best_metric="CIDEr")
    assert mgr2.best_value == 2.0


def test_checkpoint_manager_retention(tmp_path):
    """keep_last/keep_best archive rolling copies and prune the oldest
    (CheckpointConfig knobs; reference keeps one of each, dvc.py:402-441)."""
    from vidchapters_tpu.runtime.checkpoint import CheckpointManager

    tree = {"w": np.arange(3, dtype=np.float32)}
    mgr = CheckpointManager(str(tmp_path / "ck"), best_metric="CIDEr",
                            keep_last=3, keep_best=2)
    for e in range(5):
        mgr.save_last(tree, epoch=e)
        mgr.maybe_save_best({"w": tree["w"] + e}, e, {"CIDEr": float(e)})

    def names(prefix):
        return sorted(p.name.replace(".npz", "")
                      for p in (tmp_path / "ck").iterdir()
                      if p.name.startswith(prefix + "_e")
                      and not p.name.endswith(".meta.json"))

    # alias + (keep-1) archives, newest retained
    assert names("last") == ["last_e3", "last_e4"]
    assert names("best") == ["best_e4"]
    assert mgr.has("last") and mgr.has("best")
    target = {"w": np.zeros(3, np.float32)}
    np.testing.assert_array_equal(
        mgr.restore("last_e3", target)["w"], tree["w"])
    np.testing.assert_array_equal(
        mgr.restore("best_e4", target)["w"], tree["w"] + 4)
    # keep_*=1 (default) archives nothing extra
    mgr1 = CheckpointManager(str(tmp_path / "ck1"), best_metric="CIDEr")
    mgr1.save_last(tree, epoch=0)
    mgr1.maybe_save_best(tree, 0, {"CIDEr": 1.0})
    assert not [p for p in (tmp_path / "ck1").iterdir() if "_e" in p.name]


def test_collate_input_bucketing(tmp_path, rng):
    from vidchapters_tpu.data.dvc_dataset import collate, pick_bucket

    assert pick_bucket(50, (128, 256, 512, 1000), 1000) == 128
    assert pick_bucket(300, (128, 256, 512, 1000), 1000) == 512
    assert pick_bucket(999, (128, 256), 1000) == 1000  # none fits -> cap
    assert pick_bucket(200, (128, 256, 512), 250) == 250  # buckets clamped

    examples = [{
        "video": np.zeros((4, 8), np.float32), "duration": 10.0,
        "video_id": f"v{i}",
        "input_tokens": np.arange(60 + i, dtype=np.int64),
        "output_tokens": np.arange(5, dtype=np.int64),
    } for i in range(3)]
    batch = collate(examples, max_input=1000, max_output=64,
                    input_buckets=(128, 256, 512, 1000))
    assert batch["input_tokens"].shape == (3, 128)  # bucketed, not 1000
    batch_full = collate(examples, max_input=1000, max_output=64)
    assert batch_full["input_tokens"].shape == (3, 1000)
    # output side (DataConfig.output_buckets)
    batch_ob = collate(examples, max_input=1000, max_output=256,
                       output_buckets=(64, 128, 256))
    assert batch_ob["output_tokens"].shape == (3, 64)
    assert batch_full["output_tokens"].shape == (3, 64)  # explicit max


def test_tokenize_batch_output_bucketing():
    """VC training targets pad to the smallest output bucket, preserving
    content + EOS (DataConfig.output_buckets)."""
    from vidchapters_tpu.data.tokenizer import build_tokenizer
    from vidchapters_tpu.train.vc_train import tokenize_batch

    tok = build_tokenizer("", num_bins=10)
    texts = ["a short title", "another chapter title here"]
    full = tokenize_batch(texts, tok, 256)
    assert full.shape == (2, 256)
    bucketed = tokenize_batch(texts, tok, 256, buckets=(64, 128, 256))
    assert bucketed.shape == (2, 64)
    np.testing.assert_array_equal(bucketed, full[:, :64])
    assert (bucketed == tok.eos_token_id).any(axis=1).all()


def test_feature_source_broken_video_fallback(tmp_path):
    from vidchapters_tpu.data.features import FeatureSource

    fs = FeatureSource(str(tmp_path), max_feats=10, features_dim=8)
    with np.testing.assert_raises(AssertionError):
        fs.raw("missingvid0")
    out = fs.raw("missingvid0", strict=False)
    assert out.shape == (1, 8) and (out == 0).all()
    # corrupt npy file
    (tmp_path / "corruptvid0.npy").write_bytes(b"not an npy")
    assert fs.raw("corruptvid0", strict=False).shape == (1, 8)


def test_yt_pretrain_dataset_video_path_mapping(tmp_path, rng):
    """csv video_path entries carry extensions; features must resolve by
    stem (regression: '.npy.npy' double extension)."""
    import pickle

    from vidchapters_tpu.config import DataConfig
    from vidchapters_tpu.data.dvc_dataset import YTPretrainDataset
    from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer

    vid = "htmvideo001"
    np.save(tmp_path / f"{vid}.npy", rng.normal(size=(12, 8)).astype(np.float32))
    asr = {vid[-11:]: {"text": ["hello world"], "start": [0.5],
                       "end": [3.0], "duration": 10.0}}
    pickle.dump(asr, open(tmp_path / "asr.pkl", "wb"))
    cfg = DataConfig(max_feats=6, features_dim=8, max_input_tokens=48,
                     max_output_tokens=24)
    ds = YTPretrainDataset([{"video_id": vid, "video_path": vid + ".npy"}],
                           str(tmp_path), ByteLevelTokenizer(),
                           subtitles_path=str(tmp_path / "asr.pkl"), cfg=cfg)
    ex = ds.__getitem__(0, rng=rng)
    assert ex["video"].shape == (6, 8)
    assert len(ex["output_tokens"]) > 1  # ASR sequence is the target
    assert "denoising_input_tokens" in ex


def test_yt_pretrain_dataset_video_path_subdirectories(tmp_path, rng):
    """HowTo100M layouts shard features into subdirectories; video_path
    must be joined relative to features_path (yt_dataset.py:49), not
    flattened via basename (ADVICE r1 medium)."""
    import pickle

    from vidchapters_tpu.config import DataConfig
    from vidchapters_tpu.data.dvc_dataset import YTPretrainDataset
    from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer

    vid = "htmvideo002"
    (tmp_path / "shard03").mkdir()
    np.save(tmp_path / "shard03" / f"{vid}.mp4.npy",
            rng.normal(size=(12, 8)).astype(np.float32))
    asr = {vid[-11:]: {"text": ["hello"], "start": [0.5], "end": [3.0],
                       "duration": 10.0}}
    pickle.dump(asr, open(tmp_path / "asr.pkl", "wb"))
    cfg = DataConfig(max_feats=6, features_dim=8, max_input_tokens=48,
                     max_output_tokens=24)
    ds = YTPretrainDataset(
        [{"video_id": vid, "video_path": f"shard03/{vid}.mp4.npy"}],
        str(tmp_path), ByteLevelTokenizer(),
        subtitles_path=str(tmp_path / "asr.pkl"), cfg=cfg)
    ex = ds.__getitem__(0, rng=rng)
    assert ex["video"].shape == (6, 8)


def test_genasr_train_step(rng):
    """HowTo100M objective: generative target is the ASR sequence and the
    model trains without input tokens (dvc.py:59-68 equivalent)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vidchapters_tpu.config import T5Config, TemporalViTConfig, Vid2SeqConfig
    from vidchapters_tpu.models.vid2seq import Vid2Seq
    from vidchapters_tpu.train.dvc_train import TrainState, make_train_step

    cfg = Vid2SeqConfig(
        t5=T5Config(d_model=32, d_kv=8, d_ff=64, num_layers=1,
                    num_decoder_layers=1, num_heads=4, dtype="float32"),
        vit=TemporalViTConfig(num_features=6, embed_dim=16, depth=1,
                              num_heads=4, mlp_dim=32, dtype="float32"))
    model = Vid2Seq(cfg)
    key = jax.random.PRNGKey(0)
    video = jnp.asarray(rng.normal(size=(2, 6, 16)), jnp.float32)
    out_toks = jnp.asarray(rng.integers(2, 100, (2, 10)), jnp.int32)
    params = model.init({"params": key, "dropout": key}, video,
                        out_toks[:, :4], jnp.ones((2, 4), jnp.int32),
                        out_toks[:, :4])["params"]
    tx = optax.adam(1e-3)
    step = jax.jit(make_train_step(model, tx, genasr=True))
    state = TrainState(params, tx.init(params), jnp.array(0))
    batch = {"video": video, "output_tokens": out_toks,
             "denoising_input_tokens": out_toks[:, :8],
             "denoising_output_tokens": out_toks[:, :6]}
    state, metrics = step(state, batch, key)
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["loss"]) > 0 and float(metrics["denoising_loss"]) > 0
