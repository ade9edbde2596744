import json
import pickle

import numpy as np
import pytest

from vidchapters_tpu.zeroshot.run import run_speech_vcg, run_vcgr, run_visual_vcg


@pytest.fixture
def data(tmp_path):
    rng = np.random.default_rng(0)
    ann = {"ddddddddd01": {
        "duration": 80.0,
        "timestamps": [[0.0, 40.0], [40.0, 80.0]],
        "sentences": ["cooking the meal", "eating the meal"]}}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    subs = {"ddddddddd01"[-11:]: {
        "text": [f"talking about cooking food {i}" for i in range(4)]
        + [f"talking about eating dinner {i}" for i in range(4)],
        "start": [10.0 * i for i in range(8)],
        "end": [10.0 * i + 8 for i in range(8)]}}
    subs_path = tmp_path / "subs.pkl"
    subs_path.write_bytes(pickle.dumps(subs))
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    feats = np.concatenate([
        np.tile(rng.normal(size=(1, 8)), (40, 1)),
        np.tile(rng.normal(size=(1, 8)), (40, 1))]).astype(np.float32)
    np.save(feat_dir / "ddddddddd01"[-11:], feats)
    return str(ann_path), str(subs_path), str(feat_dir), feats


def test_run_speech_vcg(data):
    ann_path, subs_path, _, _ = data
    results, metrics = run_speech_vcg(ann_path, subs_path)
    assert "soda_c" in metrics
    assert len(results["ddddddddd01"]) >= 1


def test_run_visual_vcg(data):
    ann_path, _, feat_dir, _ = data
    results, metrics = run_visual_vcg(
        ann_path, feat_dir,
        captioner=lambda vid, t: f"scene at {int(t)} seconds")
    assert "soda_c" in metrics
    # two constant-feature blocks -> one shot boundary -> two chapters
    assert len(results["ddddddddd01"]) == 2


def test_run_vcgr_modes(data):
    ann_path, subs_path, feat_dir, feats = data

    def embed(texts):
        # deterministic fake embeddings aligned with the two feature blocks
        out = []
        for t in texts:
            out.append(feats[10] if "cook" in t else feats[60])
        return np.stack(out)

    _, m_clip = run_vcgr(ann_path, features_path=feat_dir,
                         text_embed_fn=embed)
    assert m_clip["Recall@0.3"] >= 0.0
    _, m_bert = run_vcgr(ann_path, text_embed_fn=embed,
                         subtitles_path=subs_path, mode="bert")
    assert "Recall@1s" in m_bert
    _, m_rand = run_vcgr(ann_path, subtitles_path=subs_path, mode="random")
    assert "Recall@0.9" in m_rand


def test_zeroshot_cli_speech_and_vcgr(tmp_path, dvc_fixture_paths=None):
    """Drive the zs_*.py-equivalent CLI end-to-end on synthetic data."""
    import json
    import pickle

    import numpy as np

    from vidchapters_tpu.zeroshot.run import main

    ann, asr = {}, {}
    for i in range(2):
        vid = f"video{i:02d}xyz"
        ann[vid] = {"duration": 60.0,
                    "timestamps": [[0.0, 30.0], [30.0, 60.0]],
                    "sentences": ["first half", "second half"]}
        asr[vid[-11:]] = {"text": ["alpha beta gamma delta"] * 6,
                          "start": [float(10 * j) for j in range(6)],
                          "end": [float(10 * j + 8) for j in range(6)]}
    ann_p = tmp_path / "ann.json"
    json.dump(ann, open(ann_p, "w"))
    pickle.dump(asr, open(tmp_path / "asr.pkl", "wb"))

    out = tmp_path / "preds.json"
    main(["speech", "--ann", str(ann_p), "--subtitles",
          str(tmp_path / "asr.pkl"), "--out", str(out)])
    preds = json.load(open(out))["results"]
    assert set(preds) == set(ann)

    main(["vcgr", "--ann", str(ann_p), "--mode", "random",
          "--out", str(tmp_path / "vcgr.json")])
    vc = json.load(open(tmp_path / "vcgr.json"))
    assert set(vc) == set(ann)
