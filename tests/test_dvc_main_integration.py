"""End-to-end integration: tiny DVC training run through dvc_main.main."""

import json

import numpy as np
import pytest

from vidchapters_tpu.config import (
    CheckpointConfig,
    DataConfig,
    DatasetPaths,
    ExperimentConfig,
    GenerationConfig,
    MeshConfig,
    OptimConfig,
    T5Config,
    TemporalViTConfig,
    TrainConfig,
    Vid2SeqConfig,
)


@pytest.mark.slow
def test_tiny_dvc_training_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    # synthetic dataset: 4 videos, 2 chapters each
    ann = {}
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(4):
        vid = f"vvvvvvvvv{i:02d}"
        ann[vid] = {"duration": 60.0,
                    "timestamps": [[0.0, 30.0], [30.0, 60.0]],
                    "sentences": ["first half", "second half"]}
        np.save(feat_dir / f"{vid[-11:]}.npy",
                rng.normal(size=(20, 8)).astype(np.float32))
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    t5 = T5Config(vocab_size=32200, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                  num_decoder_layers=1, num_heads=4,
                  relative_attention_num_buckets=8,
                  relative_attention_max_distance=16, dtype="float32",
                  dropout_rate=0.0, encoder_dropout=0.0, decoder_dropout=0.0)
    vit = TemporalViTConfig(num_features=8, embed_dim=8, depth=1, num_heads=2,
                            mlp_dim=16, dtype="float32")
    cfg = ExperimentConfig(
        combine_datasets=["chapters"],
        datasets={"chapters": DatasetPaths(
            train_json_path=str(ann_path), val_json_path=str(ann_path),
            features_path=str(feat_dir))},
        data=DataConfig(max_feats=8, features_dim=8, max_input_tokens=16,
                        max_output_tokens=24),
        model=Vid2SeqConfig(t5=t5, vit=vit, num_bins=100),
        generation=GenerationConfig(num_beams=1, max_length=16),
        train=TrainConfig(
            epochs=2, batch_size=2, eval_batch_size=2, print_freq=100,
            eval_every_epochs=1,
            optim=OptimConfig(lr=1e-3, clip_max_norm=1.0,
                              fraction_warmup_steps=0.0),
            checkpoint=CheckpointConfig(save_dir=str(tmp_path / "ckpt"),
                                        best_metric="soda_c"),
            mesh=MeshConfig()),
    )

    from vidchapters_tpu.train.dvc_main import main

    metrics = main(cfg)
    assert any(k.startswith("chapters_") for k in metrics)
    assert "chapters_soda_c" in metrics
    # log.txt written with one line per epoch
    log = (tmp_path / "ckpt" / "log.txt").read_text().strip().splitlines()
    assert len(log) == 2
    assert json.loads(log[0])["epoch"] == 0
    # checkpoints exist
    assert (tmp_path / "ckpt" / "last").exists() or \
        (tmp_path / "ckpt" / "last.npz").exists()


@pytest.mark.slow
def test_dvc_main_resume(tmp_path):
    """A rerun with more epochs resumes from the `last` checkpoint."""
    rng = np.random.default_rng(1)
    ann = {}
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(2):
        vid = f"rrrrrrrrr{i:02d}"
        ann[vid] = {"duration": 40.0, "timestamps": [[0.0, 40.0]],
                    "sentences": ["single chapter"]}
        np.save(feat_dir / f"{vid[-11:]}.npy",
                rng.normal(size=(10, 8)).astype(np.float32))
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    from vidchapters_tpu.config import (CheckpointConfig, DataConfig,
                                        DatasetPaths, ExperimentConfig,
                                        GenerationConfig, OptimConfig,
                                        T5Config, TemporalViTConfig,
                                        TrainConfig, Vid2SeqConfig)

    t5 = T5Config(vocab_size=32200, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                  num_decoder_layers=1, num_heads=4,
                  relative_attention_num_buckets=8,
                  relative_attention_max_distance=16, dtype="float32",
                  dropout_rate=0.0, encoder_dropout=0.0, decoder_dropout=0.0)
    vit = TemporalViTConfig(num_features=8, embed_dim=8, depth=1, num_heads=2,
                            mlp_dim=16, dtype="float32")

    def make_cfg(epochs):
        return ExperimentConfig(
            combine_datasets=["chapters"],
            datasets={"chapters": DatasetPaths(
                train_json_path=str(ann_path), val_json_path=str(ann_path),
                features_path=str(feat_dir))},
            data=DataConfig(max_feats=8, features_dim=8, max_input_tokens=12,
                            max_output_tokens=16),
            model=Vid2SeqConfig(t5=t5, vit=vit),
            generation=GenerationConfig(num_beams=1, max_length=8),
            train=TrainConfig(epochs=epochs, batch_size=2, eval_batch_size=2,
                              eval_every_epochs=10,  # skip mid-run evals
                              optim=OptimConfig(lr=1e-3,
                                                fraction_warmup_steps=0.0),
                              checkpoint=CheckpointConfig(
                                  save_dir=str(tmp_path / "ckpt"))))

    from vidchapters_tpu.train.dvc_main import main

    main(make_cfg(1))
    log1 = (tmp_path / "ckpt" / "log.txt").read_text().strip().splitlines()
    assert len(log1) == 1
    main(make_cfg(3))  # resumes at epoch 1, runs epochs 1..2
    log2 = (tmp_path / "ckpt" / "log.txt").read_text().strip().splitlines()
    epochs = [json.loads(l)["epoch"] for l in log2]
    assert epochs == [0, 1, 2]
