"""dvc_main --load / --eval: the released-checkpoint evaluation surface
(reference dvc.py:308,354-364 --load/--eval) driven through the real CLI."""

import json
import os
import subprocess
import sys

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
    save_config,
)
from tests.test_checkpoint_import_fullscale import _synth_reference_state_dict


def _tiny_experiment(tmp_path) -> ExperimentConfig:
    rng = np.random.default_rng(0)
    ann = {}
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir(parents=True)
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
    return ExperimentConfig(
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


@pytest.mark.slow
def test_dvc_main_eval_load_torch_checkpoint_cli(tmp_path):
    """--eval --load <tiny .pth in the released layout> evaluates without
    training a single step."""
    torch = pytest.importorskip("torch")

    cfg = _tiny_experiment(tmp_path)
    rng1 = np.random.default_rng(1)
    sd = _synth_reference_state_dict(
        rng1, vocab=32200, d=32, heads=4, dkv=8, dff=64,
        layers=1, rel_buckets=8, vit_mlp=16, vit_depth=1, vit_d=8,
        vit_feats=8)
    # the vit->t5 projection (present when embed_dim != d_model)
    sd["proj_v2t.weight"] = rng1.normal(
        scale=0.02, size=(32, 8)).astype(np.float32)
    sd["proj_v2t.bias"] = np.zeros(32, np.float32)
    ckpt_path = tmp_path / "released.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               str(ckpt_path))
    cfg_path = tmp_path / "exp.json"
    save_config(cfg, str(cfg_path))

    env = dict(os.environ, PYTHONPATH=os.getcwd(), JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "vidchapters_tpu.train.dvc_main",
         "--config", str(cfg_path), "--eval", "--load", str(ckpt_path)],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "loading torch checkpoint" in out.stdout
    assert "Epoch [" not in out.stdout  # no training ran
    import ast

    metrics = ast.literal_eval(out.stdout.strip().splitlines()[-1])
    assert "chapters_soda_c" in metrics


@pytest.mark.slow
def test_dvc_main_eval_load_torch_checkpoint_scanned(tmp_path):
    """The same released-.pth load under scan_layers: dvc_main restacks
    the imported tree (scan_vid2seq_params) and evaluates."""
    import dataclasses

    torch = pytest.importorskip("torch")

    cfg = _tiny_experiment(tmp_path)
    t5 = dataclasses.replace(cfg.model.t5, scan_layers=True)
    vit = dataclasses.replace(cfg.model.vit, scan_layers=True)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, t5=t5, vit=vit))
    rng1 = np.random.default_rng(1)
    sd = _synth_reference_state_dict(
        rng1, vocab=32200, d=32, heads=4, dkv=8, dff=64,
        layers=1, rel_buckets=8, vit_mlp=16, vit_depth=1, vit_d=8,
        vit_feats=8)
    sd["proj_v2t.weight"] = rng1.normal(
        scale=0.02, size=(32, 8)).astype(np.float32)
    sd["proj_v2t.bias"] = np.zeros(32, np.float32)
    ckpt_path = tmp_path / "released.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               str(ckpt_path))
    from vidchapters_tpu.train.dvc_main import main

    metrics = main(cfg, load=str(ckpt_path), eval_only=True)
    assert "chapters_soda_c" in metrics


@pytest.mark.slow
def test_dvc_main_eval_load_orbax_dir(tmp_path):
    """--eval --load <orbax best dir from a previous run> restores the
    params-only tree and evaluates."""
    from vidchapters_tpu.train.dvc_main import main

    cfg = _tiny_experiment(tmp_path)
    metrics = main(cfg)  # trains 2 tiny epochs, writes best/last
    assert "chapters_soda_c" in metrics

    cfg2 = _tiny_experiment(tmp_path / "second")
    # fresh save_dir so nothing resumes; load the first run's best weights
    ckpt_dir = str(tmp_path / "ckpt" / "best")
    metrics2 = main(cfg2, load=ckpt_dir, eval_only=True)
    assert "chapters_soda_c" in metrics2
