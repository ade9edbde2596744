"""Device mesh + multi-host initialization.

Replaces the reference's NCCL/SLURM rendezvous machinery (util/dist.py:201-238)
with the JAX-native story: ``jax.distributed.initialize()`` for multi-host,
then a ``jax.sharding.Mesh`` over all devices. Gradient synchronization is
performed by XLA collectives over ICI automatically once arrays carry
``NamedSharding`` — unlike the reference, which sharded data but never
all-reduced gradients (SURVEY.md §2.8).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vidchapters_tpu.config import MeshConfig


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-host.

    No-op for single-process runs (the common test/bench path). Multi-host
    coordinates via the JAX coordinator service instead of the reference's
    env:// / SLURM-derived NCCL rendezvous (util/dist.py:207-238).
    """
    if num_processes is None:
        num_processes = int(os.environ.get("VIDCHAPTERS_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("VIDCHAPTERS_COORDINATOR", "localhost:9876"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("VIDCHAPTERS_PROCESS_ID", "0")),
    )


def create_mesh(cfg: MeshConfig = MeshConfig(),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A 2-D ``(data, model)`` mesh; model axis is 1 for pure DP.

    The data axis rides ICI within a slice; on multi-slice topologies the
    outer (data) axis maps onto DCN by virtue of device ordering.
    """
    devices = list(devices if devices is not None else jax.devices())
    dp, mp = cfg.axis_shapes(len(devices))
    device_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(device_array, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input arrays."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_main_process() -> bool:
    """Rank-0 predicate (reference: util/dist.py:190-199)."""
    return jax.process_index() == 0


def enable_sequence_parallelism(mesh: Mesh) -> bool:
    """Pin T5's *encoder* residual stream to a (data, model)-sharded layout
    between blocks (Megatron-SP): norm/dropout/residual math runs on
    sequence shards and GSPMD places the all-gather (into attention) /
    reduce-scatter (out of the block) on the model axis over ICI. The
    encoder is the long side (ASR <=1000 tokens + 100 video frames), so
    that is where the activation-memory and elementwise-FLOP savings are.

    The decoder stack is deliberately NOT constrained: L-sharding the
    decoder residual stream miscompiles on the XLA:CPU SPMD partitioner
    (second query-shard logits come out wrong in the full Vid2Seq graph —
    the ~1% loss shift recorded in round 1; see the canary in
    tests/test_sequence_parallel.py and models/t5.py SEQUENCE_SHARDING).

    MUST be called before the train step is first traced — the module
    global is read at trace time and jit's trace cache would otherwise
    keep serving the unconstrained program (tests assert the constraint
    is present in the jaxpr to keep this honest).

    No-op (returns False) when the mesh has no model axis to shard over.
    """
    if mesh.shape[mesh.axis_names[1]] <= 1:
        return False
    import vidchapters_tpu.models.t5 as t5

    t5.SEQUENCE_SHARDING = NamedSharding(
        mesh, P(mesh.axis_names[0], mesh.axis_names[1]))
    return True


def disable_sequence_parallelism() -> None:
    """Clear the module-global sharding constraint (enable_* sets process
    state; callers that trace OTHER programs afterwards — e.g. the driver
    compile-checking ``entry()`` after ``dryrun_multichip`` — must reset
    it or those traces inherit a mesh they don't run under)."""
    import vidchapters_tpu.models.t5 as t5

    t5.SEQUENCE_SHARDING = None
