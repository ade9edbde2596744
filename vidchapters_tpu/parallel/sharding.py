"""Sharding rules over the (data, model) mesh.

The reference's "distributed" story is unsynchronized per-rank replicas with
NCCL loss-averaging for display only (SURVEY.md §2.8, util/dist.py). Here the
parallel layout is declared once as NamedShardings and XLA/GSPMD inserts the
collectives (gradient psum over the data axis, activation collectives for
tensor parallelism over the model axis) — they ride ICI, not host pickles.

Tensor-parallel rules follow the standard Megatron layout for T5:
- attention q/k/v and FFN up-projections column-sharded (heads / d_ff on
  the model axis);
- attention output and FFN down-projections row-sharded;
- embedding row(vocab)-sharded; norms replicated.
At model_parallel_size=1 every spec collapses to pure data parallelism.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regexp over 'path/like/this', PartitionSpec) — first match wins
_RULES: Tuple[Tuple[str, P], ...] = (
    # T5 attention
    (r".*self_attn/(q|k|v)/kernel", P(None, "model")),
    (r".*cross_attn/(q|k|v)/kernel", P(None, "model")),
    # fused_qkv packed layouts: shard the heads axis (whole heads with
    # their q/k/v together per model shard — the Megatron layout)
    (r".*self_attn/qkv/kernel", P(None, "model", None, None)),
    (r".*cross_attn/kv/kernel", P(None, "model", None, None)),
    (r".*self_attn/o/kernel", P("model", None)),
    (r".*cross_attn/o/kernel", P("model", None)),
    # T5 FFN
    (r".*ff/wi(_0|_1)?/kernel", P(None, "model")),
    (r".*ff/wo/kernel", P("model", None)),
    # embeddings / heads
    (r".*shared/embedding", P("model", None)),
    (r".*lm_head/kernel", P(None, "model")),
    # temporal ViT
    (r".*attn/qkv/kernel", P(None, "model")),
    (r".*attn/qkv/bias", P("model",)),
    (r".*attn/proj/kernel", P("model", None)),
    (r".*fc1/kernel", P(None, "model")),
    (r".*fc1/bias", P("model",)),
    (r".*fc2/kernel", P("model", None)),
)


def _spec_for(path: str, ndim: int, model_parallel: bool) -> P:
    if model_parallel:
        for pattern, spec in _RULES:
            if re.fullmatch(pattern, path):
                if "/blocks/" in path:
                    # scanned stacks (T5Config.scan_layers): leaves carry a
                    # leading [n_layers] axis — shift the rule right and
                    # replicate the layer axis
                    spec = P(*((None,) + tuple(spec)))
                if len([s for s in spec]) <= ndim:
                    return spec
    return P()  # replicated


def infer_param_specs(params: Any, model_parallel: bool = False) -> Any:
    """PartitionSpec pytree matching ``params``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            k.key if hasattr(k, "key") else str(k) for k in kp)

    specs = {}
    for kp, leaf in flat:
        specs[path_str(kp)] = _spec_for(path_str(kp), np.ndim(leaf), model_parallel)

    def map_fn(kp, leaf):
        return specs[path_str(kp)]

    return jax.tree_util.tree_map_with_path(map_fn, params)


def shard_params(params: Any, mesh: Mesh, model_parallel: bool = False) -> Any:
    specs = infer_param_specs(params, model_parallel)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs sharded along the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def batch_specs_for(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    return {k: NamedSharding(mesh, P(mesh.axis_names[0]))
            for k in batch}


def host_local_to_global(x, mesh: Mesh):
    """Assemble per-host batch shards into one global batch-sharded array.

    Single-process: a plain ``device_put`` onto the data sharding.
    Multi-process (each host's EpochIterator yields its own rows, like the
    reference's DistributedSampler, dvc.py:280-324): the global array is
    built from process-local data without any cross-host copy — each host
    contributes the rows its local devices own."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)
