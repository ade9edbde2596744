"""Two-process jax.distributed rehearsal (VERDICT r2 #8).

Spawns two real OS processes that rendezvous through the JAX coordinator on
localhost and drive runtime/mesh.py's process-index paths, per-host data
sharding, and process_allgather-based eval merging end-to-end — the one
SURVEY §2.8 claim that had no executable evidence. Expected values are
computed here with numpy against the known global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def rehearsal(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mp")
    port = _free_port()
    env = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        # PYTHONPATH pinned to the repo drops the axon sitecustomize so
        # JAX_PLATFORMS=cpu is honored in the children
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs, outs = [], []
    for rank in range(2):
        out = tmp / f"rank{rank}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_rehearsal_worker.py"),
             str(rank), str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    results = []
    for rank, (p, out) in enumerate(zip(procs, outs)):
        try:
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
            pytest.fail(f"rank {rank} timed out\n{stdout[-3000:]}")
        assert p.returncode == 0, f"rank {rank} failed\n{stdout[-3000:]}"
        with open(out) as f:
            results.append(json.load(f))
    return results


def test_process_identity_and_mesh(rehearsal):
    r0, r1 = rehearsal
    assert r0["process_count"] == r1["process_count"] == 2
    assert r0["is_main"] and not r1["is_main"]


def test_per_host_sharding_and_jit_reduction(rehearsal):
    # global batch both hosts assembled: rows 0..7 reshaped (8, 2)
    g = np.arange(16, dtype=np.float32).reshape(8, 2)
    expected = float((g * g).mean())
    for r in rehearsal:
        assert r["mean_sq"] == pytest.approx(expected, rel=1e-6)


def test_gradient_sync_over_global_batch(rehearsal):
    g = np.arange(16, dtype=np.float32).reshape(8, 2)
    w = np.ones(2, np.float32)
    expected = 2.0 / g.shape[0] * g.T @ (g @ w)  # d/dw mean((xw)^2)
    for r in rehearsal:
        np.testing.assert_allclose(np.asarray(r["grad"]), expected,
                                   rtol=1e-5)
    # both replicas hold the SAME averaged gradient (unlike the reference,
    # which never synchronized gradients — SURVEY §2.8)
    np.testing.assert_allclose(rehearsal[0]["grad"], rehearsal[1]["grad"])


def test_eval_merge_and_metric_reduction(rehearsal):
    for r in rehearsal:
        assert r["merged"] == {"vid0": [0, 10], "vid1": [1, 11]}
        assert r["reduced"]["loss"] == pytest.approx(1.5)
        assert r["reduced"]["acc"] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# full CLI under two processes: dvc_main end-to-end (train + eval + ckpt)
# ---------------------------------------------------------------------------


def _write_tiny_experiment(root):
    import pickle

    from vidchapters_tpu.config import (
        CheckpointConfig, DataConfig, DatasetPaths, ExperimentConfig,
        GenerationConfig, MeshConfig, OptimConfig, T5Config,
        TemporalViTConfig, TrainConfig, Vid2SeqConfig, save_config,
    )

    feat_dir = root / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    ann, asr = {}, {}
    for i in range(8):
        vid = f"vvvvvvvvv{i:02d}"
        ann[vid] = {"duration": 60.0,
                    "timestamps": [[0.0, 30.0], [30.0, 60.0]],
                    "sentences": ["first half", "second half"]}
        np.save(feat_dir / f"{vid[-11:]}.npy",
                rng.normal(size=(20, 32)).astype(np.float32))
        asr[vid[-11:]] = {"text": ["hello there"], "start": [0.0],
                          "end": [29.0]}
    (root / "ann.json").write_text(json.dumps(ann))
    with open(root / "asr.pkl", "wb") as f:
        pickle.dump(asr, f)
    t5 = T5Config(vocab_size=32200, d_model=32, d_kv=8, d_ff=64,
                  num_layers=2, num_decoder_layers=2, num_heads=4,
                  relative_attention_num_buckets=8,
                  relative_attention_max_distance=16, dtype="float32",
                  dropout_rate=0.0, encoder_dropout=0.0,
                  decoder_dropout=0.0)
    vit = TemporalViTConfig(num_features=8, embed_dim=32, depth=2,
                            num_heads=2, mlp_dim=16, dtype="float32")
    cfg = ExperimentConfig(
        combine_datasets=["chapters"],
        datasets={"chapters": DatasetPaths(
            train_json_path=str(root / "ann.json"),
            val_json_path=str(root / "ann.json"),
            features_path=str(feat_dir),
            subtitles_path=str(root / "asr.pkl"))},
        data=DataConfig(max_feats=8, features_dim=32, max_input_tokens=64,
                        max_output_tokens=24),
        model=Vid2SeqConfig(t5=t5, vit=vit, num_bins=100),
        generation=GenerationConfig(num_beams=1, max_length=16),
        train=TrainConfig(
            epochs=1, batch_size=2, eval_batch_size=2, print_freq=100,
            eval_every_epochs=1,
            optim=OptimConfig(lr=1e-3, clip_max_norm=1.0,
                              fraction_warmup_steps=0.0),
            checkpoint=CheckpointConfig(save_dir=str(root / "ckpt"),
                                        best_metric="soda_c"),
            mesh=MeshConfig()),
    )
    save_config(cfg, str(root / "exp.json"))
    return root / "exp.json"


def test_dvc_main_cli_two_processes(tmp_path):
    """The actual training CLI under jax.distributed with 2 processes:
    per-host dataset shards, global-batch assembly, synchronized training,
    process_allgather eval merging, and coordinated orbax checkpointing."""
    exp = _write_tiny_experiment(tmp_path)
    port = _free_port()
    env_base = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "VIDCHAPTERS_NUM_PROCESSES": "2",
        "VIDCHAPTERS_COORDINATOR": f"localhost:{port}",
    }
    procs = []
    for rank in range(2):
        env = dict(env_base, VIDCHAPTERS_PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "vidchapters_tpu.train.dvc_main",
             "--config", str(exp)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for rank, p in enumerate(procs):
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
            for q in procs:
                q.kill()
            pytest.fail(f"rank {rank} timed out\n{stdout[-4000:]}")
        outs.append(stdout)
        assert p.returncode == 0, f"rank {rank} failed\n{stdout[-4000:]}"
    # both ranks ran 2 steps/epoch (8 videos / bs 2 / 2 hosts) and agree on
    # the final metrics line (identical replicated training)
    final0 = outs[0].strip().splitlines()[-1]
    final1 = outs[1].strip().splitlines()[-1]
    assert final0.startswith("{") and final0 == final1
    assert "soda_c" in final0
    # rank-0-only artifacts exist: log.txt, preds json, checkpoints
    ckpt_dir = tmp_path / "ckpt"
    assert (ckpt_dir / "log.txt").exists()
    assert (ckpt_dir / "last").exists()
    assert list(ckpt_dir.glob("chapters_val_preds_e*.json"))
    # the per-epoch log shows losses were finite
    log = json.loads((ckpt_dir / "log.txt").read_text().splitlines()[-1])
    assert np.isfinite(log["train_total_loss"])
