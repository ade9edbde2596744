from vidchapters_tpu.runtime.mesh import create_mesh, maybe_initialize_distributed
from vidchapters_tpu.runtime.meters import SmoothedValue, MetricLogger

__all__ = [
    "create_mesh",
    "maybe_initialize_distributed",
    "SmoothedValue",
    "MetricLogger",
]
