"""Host-side video feature loading: strided subsample / zero-pad to static T.

Reference semantics (dataset/dvc_dataset.py:61-86): features come either from
a directory of per-video ``<id>.npy`` / ``<id>.mp4.npy`` files or from one
consolidated mapping; long videos are subsampled with the integer stride rule
``video[(j * len) // max_feats]`` and short ones zero-padded to ``max_feats``.
Static output shape [max_feats, dim] is what XLA needs.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Union

import numpy as np


def subsample_or_pad(video: np.ndarray, max_feats: int,
                     features_dim: Optional[int] = None) -> np.ndarray:
    """[T, D] -> [max_feats, D] via integer-stride subsample or zero-pad."""
    features_dim = features_dim if features_dim is not None else video.shape[-1]
    t = len(video)
    if t > max_feats:
        idx = (np.arange(max_feats) * t) // max_feats
        return np.ascontiguousarray(video[idx])
    if t < max_feats:
        out = np.zeros((max_feats, features_dim), dtype=video.dtype)
        out[:t] = video
        return out
    return video


class FeatureSource:
    """Uniform accessor over per-video .npy dirs or consolidated feature dicts.

    In directory mode the C++ loader (native/feature_loader.cpp: mmap npy
    parse + threadpool LRU prefetch) serves ``__call__`` and ``prefetch`` when
    built — ``native=False`` forces the pure-numpy path, ``native=True``
    requires the library.
    """

    def __init__(self, features_path: Union[str, Dict[str, np.ndarray]],
                 max_feats: int = 100, features_dim: int = 768,
                 native: Optional[bool] = None):
        self.max_feats = max_feats
        self.features_dim = features_dim
        self.features: Optional[Dict[str, np.ndarray]] = None
        self.dir_path: Optional[str] = None
        self._native = None
        self._native_opt = native
        if isinstance(features_path, dict):
            self.features = features_path
        elif os.path.isdir(features_path):
            self.dir_path = features_path
        else:
            # consolidated file: torch .pth or numpy .npz mapping id -> array
            if features_path.endswith(".npz"):
                self.features = dict(np.load(features_path))
            else:
                import torch

                loaded = torch.load(features_path, map_location="cpu")
                self.features = {k: v.numpy() for k, v in loaded.items()}

    def _native_loader(self):
        """Lazy native loader: None if disabled/unbuilt."""
        if self._native_opt is False or self.dir_path is None:
            return None
        if self._native is None:
            try:
                from vidchapters_tpu.data.native_loader import (
                    NativeFeatureLoader,
                    is_available,
                )

                if not is_available():
                    raise RuntimeError("native loader not built")
                self._native = NativeFeatureLoader()
            except Exception:
                if self._native_opt is True:
                    raise
                self._native = False  # sentinel: tried, unavailable
        return self._native or None

    def _path(self, video_id: str) -> str:
        path = os.path.join(self.dir_path, video_id + ".mp4.npy")
        if not os.path.exists(path):
            path = os.path.join(self.dir_path, video_id + ".npy")
        return path

    def raw(self, video_id: str, strict: bool = True) -> np.ndarray:
        """``strict=False`` reproduces the reference's broken-video fallback
        (vc_dataset.py:47-48, zs_visualvcg.py:107-108): unreadable/missing
        features become a single zero frame instead of crashing a sweep."""
        try:
            if self.features is not None:
                assert video_id in self.features, video_id
                return np.asarray(self.features[video_id], dtype=np.float32)
            path = self._path(video_id)
            assert os.path.exists(path), path
            return np.load(path).astype(np.float32)
        except Exception:
            if strict:
                raise
            return np.zeros((1, self.features_dim), np.float32)

    def prefetch(self, video_ids) -> None:
        """Warm the native LRU for upcoming ids (no-op without the lib)."""
        loader = self._native_loader()
        if loader is not None:
            loader.prefetch([self._path(v) for v in video_ids])

    def __call__(self, video_id: str) -> np.ndarray:
        loader = self._native_loader()
        if loader is not None:
            path = self._path(video_id)
            if os.path.exists(path):
                # C++ implements the same stride rule (parity-tested)
                return loader.load(path, self.max_feats, self.features_dim)
        return subsample_or_pad(self.raw(video_id), self.max_feats, self.features_dim)
