import json

import numpy as np
import pytest

from vidchapters_tpu.config import PDVCConfig
from vidchapters_tpu.train.pdvc_main import main, scheduled_sampling_prob


def test_scheduled_sampling_ramp():
    assert scheduled_sampling_prob(0) == 0.0
    assert scheduled_sampling_prob(19) == 0.0
    assert scheduled_sampling_prob(20) == pytest.approx(0.05)
    assert scheduled_sampling_prob(25) == pytest.approx(0.10)
    assert scheduled_sampling_prob(100) == pytest.approx(0.25)


@pytest.mark.slow
def test_pdvc_main_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    ann = {}
    feat_dir = tmp_path / "f"
    feat_dir.mkdir()
    for i in range(2):
        vid = f"ccccccccc{i:02d}"
        ann[vid] = {"duration": 60.0,
                    "timestamps": [[0.0, 30.0], [30.0, 60.0]],
                    "sentences": ["stir the soup", "serve the dish"]}
        np.save(feat_dir / f"{vid[-11:]}.npy",
                rng.normal(size=(25, 8)).astype(np.float32))
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))

    cfg = PDVCConfig(hidden_dim=64, nheads=4, enc_layers=1, dec_layers=2,
                     dim_feedforward=128, num_queries=6, num_feature_levels=2,
                     dec_n_points=2, enc_n_points=2, feature_dim=8,
                     frame_embedding_num=16, dropout=0.0, vocab_size=30,
                     max_caption_len=6, rnn_size=24)
    metrics = main(str(p), str(p), str(feat_dir), cfg,
                   str(tmp_path / "ckpt"), n_epochs=2, batch_size=2)
    assert "soda_c" in metrics
    info = json.loads((tmp_path / "ckpt" / "info.json").read_text())
    assert len(info["histories"]) == 2
    assert info["opt"]["hidden_dim"] == 64


@pytest.mark.slow
def test_pdvc_eval_only_cli(tmp_path):
    """PDVC/eval.py parity: (a) --eval --load scores a saved checkpoint
    standalone through the real argparse main, (b) eval_mode=test runs
    proposal+caption inference on unlabeled videos from a metadata CSV
    via the fake single-event GT (eval.py:28-35), skipping metrics."""
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(1)
    ann = {}
    feat_dir = tmp_path / "f"
    feat_dir.mkdir()
    for i in range(2):
        vid = f"ddddddddd{i:02d}"
        ann[vid] = {"duration": 60.0,
                    "timestamps": [[0.0, 30.0], [30.0, 60.0]],
                    "sentences": ["stir the soup", "serve the dish"]}
        np.save(feat_dir / f"{vid[-11:]}.npy",
                rng.normal(size=(25, 8)).astype(np.float32))
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))

    cfg = PDVCConfig(hidden_dim=64, nheads=4, enc_layers=1, dec_layers=2,
                     dim_feedforward=128, num_queries=6, num_feature_levels=2,
                     dec_n_points=2, enc_n_points=2, feature_dim=8,
                     frame_embedding_num=16, dropout=0.0, vocab_size=30,
                     max_caption_len=6, rnn_size=24)
    ckpt_dir = tmp_path / "ckpt"
    main(str(p), str(p), str(feat_dir), cfg, str(ckpt_dir),
         n_epochs=1, batch_size=2)
    assert (ckpt_dir / "translator.json").exists()

    cfg_path = tmp_path / "cfg.json"
    from vidchapters_tpu.config import save_config
    save_config(cfg, cfg_path)

    def run_cli(*extra):
        cmd = [sys.executable, "-m", "vidchapters_tpu.train.pdvc_main",
               "--eval", "--load", str(ckpt_dir),
               "--features-path", str(feat_dir),
               "--config", str(cfg_path),
               "--save-dir", str(tmp_path / "eval_out"), *extra]
        # PYTHONPATH pinned to the repo drops the axon sitecustomize so the
        # fresh interpreter honors JAX_PLATFORMS=cpu instead of leasing the
        # remote TPU (same pattern as test_dvc_main_eval_load.py)
        env = dict(os.environ, PYTHONPATH=os.getcwd(), JAX_PLATFORMS="cpu")
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    # (a) standalone eval of the checkpoint: metrics printed, results saved
    out = run_cli("--val-json", str(p))
    metrics = json.loads(out.strip().splitlines()[-1])
    assert "soda_c" in metrics
    saved = list((tmp_path / "eval_out").glob("eval_epoch*.json"))
    assert saved, "eval results json not written"
    results = json.loads(saved[0].read_text())["results"]
    assert set(results) == set(ann)

    # (b) unlabeled test mode from a metadata CSV
    csv_path = tmp_path / "meta.csv"
    csv_path.write_text(
        "filename,video-duration\n"
        + "".join(f"/x/{v}.mp4,60.0\n" for v in ann))
    out = run_cli("--test-meta-csv", str(csv_path))
    metrics = json.loads(out.strip().splitlines()[-1])
    assert metrics == {}  # skip_lang_eval: no scoring against fake GT
    dvc = json.loads((tmp_path / "eval_out" / "dvc_results.json"
                      ).read_text())["results"]
    assert set(dvc) == set(ann)
    for props in dvc.values():
        assert props and all("sentence" in pr and "timestamp" in pr
                             for pr in props)


def test_transfer_params():
    from vidchapters_tpu.train.pdvc_main import transfer_params

    src = {"a": np.ones((3, 4)), "b": {"c": np.full((2,), 7.0),
                                       "q": np.ones((5, 8))}}
    tgt = {"a": np.zeros((3, 4)), "b": {"c": np.zeros((2,)),
                                        "q": np.zeros((9, 8))}}  # query grow
    out = transfer_params(src, tgt, verbose=False)
    np.testing.assert_array_equal(out["a"], src["a"])
    np.testing.assert_array_equal(out["b"]["c"], src["b"]["c"])
    # mismatched query embedding keeps the fresh target init
    np.testing.assert_array_equal(out["b"]["q"], tgt["b"]["q"])
