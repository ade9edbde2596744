"""Native C++ feature loader vs the numpy reference implementation."""

import time

import numpy as np
import pytest

from vidchapters_tpu.data.features import subsample_or_pad

native = pytest.importorskip("vidchapters_tpu.data.native_loader")

if not native.is_available():
    pytest.skip("g++ unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def loader():
    return native.NativeFeatureLoader(num_threads=2)


def test_shape_and_exact_load(tmp_path, loader, rng):
    arr = rng.normal(size=(37, 16)).astype(np.float32)
    p = tmp_path / "a.npy"
    np.save(p, arr)
    assert loader.shape(str(p)) == (37, 16)
    out = loader.load(str(p), max_rows=37, dim=16)
    np.testing.assert_array_equal(out, arr)


def test_subsample_matches_reference_rule(tmp_path, loader, rng):
    arr = rng.normal(size=(250, 8)).astype(np.float32)
    p = tmp_path / "b.npy"
    np.save(p, arr)
    out = loader.load(str(p), max_rows=100, dim=8)
    np.testing.assert_array_equal(out, subsample_or_pad(arr, 100, 8))


def test_pad_short(tmp_path, loader, rng):
    arr = rng.normal(size=(5, 8)).astype(np.float32)
    p = tmp_path / "c.npy"
    np.save(p, arr)
    out = loader.load(str(p), max_rows=10, dim=8)
    np.testing.assert_array_equal(out[:5], arr)
    assert out[5:].sum() == 0


def test_float64_input(tmp_path, loader, rng):
    arr = rng.normal(size=(6, 4))
    p = tmp_path / "d.npy"
    np.save(p, arr)
    out = loader.load(str(p), max_rows=6, dim=4)
    np.testing.assert_allclose(out, arr.astype(np.float32), rtol=1e-6)


def test_prefetch_populates_cache(tmp_path, loader, rng):
    paths = []
    for i in range(4):
        p = tmp_path / f"pf{i}.npy"
        np.save(p, rng.normal(size=(20, 8)).astype(np.float32))
        paths.append(str(p))
    loader.prefetch(paths)
    deadline = time.time() + 5
    while loader.cache_entries() < 4 and time.time() < deadline:
        time.sleep(0.01)
    assert loader.cache_entries() >= 4


def test_dim_mismatch_errors(tmp_path, loader, rng):
    p = tmp_path / "e.npy"
    np.save(p, rng.normal(size=(5, 8)).astype(np.float32))
    with pytest.raises(IOError):
        loader.load(str(p), max_rows=5, dim=16)


def test_feature_source_native_path_and_prefetch(tmp_path, rng):
    """FeatureSource dir mode uses the C++ loader; prefetch warms the LRU;
    output matches the numpy path bit-for-bit."""
    from vidchapters_tpu.data.features import FeatureSource

    ids = []
    for i in range(3):
        vid = f"vid{i:08d}"
        arr = rng.normal(size=(150 + i, 8)).astype(np.float32)
        np.save(tmp_path / f"{vid}.npy", arr)
        ids.append(vid)

    fs_native = FeatureSource(str(tmp_path), max_feats=100, features_dim=8,
                              native=True)
    fs_numpy = FeatureSource(str(tmp_path), max_feats=100, features_dim=8,
                             native=False)
    fs_native.prefetch(ids)
    for vid in ids:
        np.testing.assert_array_equal(fs_native(vid), fs_numpy(vid))
    assert fs_native._native_loader().cache_entries() >= 1


def test_epoch_iterator_prefetches_next_batch(tmp_path, rng):
    import json as _json

    from vidchapters_tpu.config import DataConfig
    from vidchapters_tpu.data.dvc_dataset import (
        DenseVideoCaptioningDataset,
        EpochIterator,
    )
    from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer

    ann = {}
    for i in range(4):
        vid = f"vid{i:08d}xyz"
        np.save(tmp_path / f"{vid[-11:]}.npy",
                rng.normal(size=(30, 8)).astype(np.float32))
        ann[vid] = {"duration": 20.0, "timestamps": [[0.0, 10.0]],
                    "sentences": [f"part {i}"]}
    cfg = DataConfig(max_feats=10, features_dim=8, max_input_tokens=32,
                     max_output_tokens=16)
    ds = DenseVideoCaptioningDataset(ann, str(tmp_path),
                                     ByteLevelTokenizer(), cfg)
    ds.features = type(ds.features)(str(tmp_path), 10, 8, native=True)
    it = EpochIterator(ds, batch_size=2, cfg=cfg, shuffle=False)
    batches = list(it)
    assert len(batches) == 2
    # after iterating, the native cache saw the prefetched files
    assert ds.features._native_loader().cache_entries() >= 1


def test_truncated_header_rejected(tmp_path, loader, rng):
    """A file whose npy header length field points past EOF must be
    rejected gracefully, not read out of bounds (ADVICE r1)."""
    arr = rng.normal(size=(8, 4)).astype(np.float32)
    p = tmp_path / "trunc.npy"
    np.save(p, arr)
    data = bytearray(p.read_bytes())
    data[8] = 0xFF  # header_len low byte -> far beyond file size
    data[9] = 0x7F
    q = tmp_path / "corrupt.npy"
    q.write_bytes(bytes(data[:40]))  # truncate the body too
    with pytest.raises(IOError):
        loader.load(str(q), max_rows=8, dim=4)


def test_concurrent_get_and_prefetch_accounting(tmp_path, rng):
    """Prefetch + immediate loads of the same paths must not duplicate
    cache accounting: entries stays bounded by distinct paths."""
    l = native.NativeFeatureLoader(num_threads=4)
    paths = []
    for i in range(16):
        p = tmp_path / f"r{i}.npy"
        np.save(p, rng.normal(size=(30, 8)).astype(np.float32))
        paths.append(str(p))
    for _ in range(10):
        l.prefetch(paths)
        for p in paths:
            l.load(p, max_rows=30, dim=8)
    assert l.cache_entries() <= len(paths)
