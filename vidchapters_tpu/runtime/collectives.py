"""Cross-host gathering/reduction helpers.

Replaces the reference's pickled-tensor NCCL gathers and display-only loss
reduction (util/dist.py:25-113): python-object results gather through
``multihost_utils.process_allgather`` (or a broadcast-free local path on one
process), and scalar metric dicts reduce with a mean over hosts. Inside jit,
gradient synchronization needs none of this — XLA's collectives handle it.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def all_gather_object(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process
    (util/dist.py:25-86 equivalent). Single-process: [obj]."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the max length across hosts
    length = np.array([payload.size], np.int32)
    all_lengths = multihost_utils.process_allgather(length).reshape(-1)
    max_len = int(all_lengths.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, : int(all_lengths[i])].tobytes())
            for i in range(gathered.shape[0])]


def gather_results(results: Dict) -> Dict:
    """Merge per-host prediction dicts (the eval gather at dvc.py:214-215)."""
    merged: Dict = {}
    for part in all_gather_object(results):
        merged.update(part)
    return merged


def reduce_dict_mean(metrics: Dict[str, float]) -> Dict[str, float]:
    """Mean of scalar metrics across hosts (util/dist.py:89-113; the
    reference averages losses for display only)."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = np.array([float(metrics[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(vec)
    mean = np.asarray(gathered).reshape(jax.process_count(), -1).mean(0)
    return {k: float(v) for k, v in zip(keys, mean)}
