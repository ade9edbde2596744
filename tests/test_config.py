"""Config (de)serialization round-trip.

Regression: under PEP 563 (``from __future__ import annotations``)
``dataclasses.fields(...).type`` is a string, so a naive isinstance check
left every nested dataclass as a raw dict after ``load_config`` — the
training CLIs then crashed on attribute access (e.g.
``cfg.model.num_bins``). The round-trip must rebuild the full typed tree,
including ``Dict[str, DatasetPaths]`` and tuple-typed fields.
"""

import dataclasses

from vidchapters_tpu.config import (
    DataConfig,
    DatasetPaths,
    ExperimentConfig,
    GroundingConfig,
    PDVCConfig,
    T5Config,
    Vid2SeqConfig,
    load_config,
    save_config,
)


def test_experiment_config_round_trip(tmp_path):
    cfg = ExperimentConfig(
        combine_datasets=["youcook", "vitt"],
        datasets={
            "youcook": DatasetPaths(train_json_path="/a/train.json",
                                    features_path="/a/feats"),
            "vitt": DatasetPaths(val_json_path="/b/val.json"),
        },
        data=DataConfig(max_feats=50, input_buckets=(64, 128)),
        model=Vid2SeqConfig(t5=T5Config(d_model=128, num_layers=3),
                            num_bins=60),
    )
    path = tmp_path / "exp.json"
    save_config(cfg, str(path))
    loaded = load_config(ExperimentConfig, str(path))

    assert isinstance(loaded.model, Vid2SeqConfig)
    assert isinstance(loaded.model.t5, T5Config)
    assert loaded.model.t5.d_model == 128
    assert loaded.model.num_bins == 60
    assert isinstance(loaded.data, DataConfig)
    assert loaded.data.input_buckets == (64, 128)
    assert isinstance(loaded.datasets["youcook"], DatasetPaths)
    assert loaded.datasets["youcook"].train_json_path == "/a/train.json"
    assert loaded == cfg


def test_unknown_keys_ignored(tmp_path):
    path = tmp_path / "exp.json"
    save_config(ExperimentConfig(), str(path))
    import json

    d = json.loads(path.read_text())
    d["bogus_key"] = 1
    d["model"]["bogus_nested"] = 2
    path.write_text(json.dumps(d))
    loaded = load_config(ExperimentConfig, str(path))
    assert isinstance(loaded.model, Vid2SeqConfig)


def test_other_config_trees_round_trip(tmp_path):
    for cls in (GroundingConfig, PDVCConfig):
        path = tmp_path / f"{cls.__name__}.json"
        save_config(cls(), str(path))
        loaded = load_config(cls, str(path))
        assert loaded == cls()
        assert all(not isinstance(getattr(loaded, f.name), dict)
                   or not dataclasses.is_dataclass(type(getattr(cls(), f.name)))
                   for f in dataclasses.fields(cls))


def test_default_dataset_paths_from_roots():
    """PathsConfig roots expand to the reference's standard per-dataset
    layout (args.py:34-103) when ExperimentConfig.datasets has no entry."""
    from vidchapters_tpu.config import PathsConfig, default_dataset_paths

    roots = PathsConfig(data_dir="/data", ssd_dir="/ssd")
    ch = default_dataset_paths(roots, "chapters")
    assert ch.train_json_path == "/data/AllChapters/chapters_dvc_train.json"
    assert ch.test_json_path == "/data/AllChapters/chapters_dvc_test.json"
    assert ch.features_path == "/ssd/chapters_clipvitl14_features"
    assert ch.subtitles_path == "/ssd/allchapters_asr"
    yc = default_dataset_paths(roots, "youcook")
    assert yc.features_path == "/data/YouCook2/clipvitl14.pth"
    assert yc.val_json_path == "/data/YouCook2/val.json"
    vt = default_dataset_paths(roots, "vitt")
    assert vt.val_json_path == "/data/ViTT/dev.json"
    htm = default_dataset_paths(roots, "htm")
    assert htm.train_json_path == "/data/howto100m/htm_vid2seq.csv"
    assert htm.features_path == "/ssd/howto100m_clip_features"
    # ssd root falls back to data_dir when unset
    only_data = default_dataset_paths(PathsConfig(data_dir="/d"), "chapters")
    assert only_data.features_path == "/d/chapters_clipvitl14_features"
    import pytest

    with pytest.raises(KeyError):
        default_dataset_paths(roots, "unknown")
