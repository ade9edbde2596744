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
