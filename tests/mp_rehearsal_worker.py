"""Worker for the two-process jax.distributed rehearsal (VERDICT r2 #8).

Launched as ``python mp_rehearsal_worker.py <rank> <port> <out.json>`` with
JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=2,
giving a 2-process x 2-local-device = 4-device global CPU mesh. Exercises
the §2.8 claims that cannot run single-process:

- ``maybe_initialize_distributed`` (the JAX coordinator replacing the
  reference's NCCL env:// rendezvous, util/dist.py:201-238);
- ``create_mesh`` over global (partially non-addressable) devices;
- per-host data sharding via ``host_local_to_global``
  (make_array_from_process_local_data);
- jit'd cross-host reduction + gradient averaging over the global batch;
- ``all_gather_object`` / ``gather_results`` (the eval merge,
  dvc.py:214-215) and ``reduce_dict_mean``.
"""

import json
import sys


def main(rank: int, port: str, out_path: str) -> None:
    from vidchapters_tpu.runtime.mesh import (
        create_mesh,
        is_main_process,
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed(f"localhost:{port}", num_processes=2,
                                 process_id=rank)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidchapters_tpu.config import MeshConfig
    from vidchapters_tpu.parallel.sharding import host_local_to_global
    from vidchapters_tpu.runtime.collectives import (
        gather_results,
        reduce_dict_mean,
    )

    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == rank
    mesh = create_mesh(MeshConfig())
    assert mesh.devices.size == 4

    # per-host shard of a known global batch: rank r owns rows [4r, 4r+4)
    local = (np.arange(8, dtype=np.float32).reshape(4, 2)
             + 8.0 * rank)
    g = host_local_to_global(local, mesh)
    assert g.shape == (8, 2)

    @jax.jit
    def mean_sq(x):
        return (x * x).mean()

    val = float(mean_sq(g))  # cross-host reduction inside jit

    # gradient averaging over the global batch (the "real grad sync" claim)
    w = jnp.ones((2,), jnp.float32)

    @jax.jit
    def loss(w, x):
        return ((x @ w) ** 2).mean()

    grad = np.asarray(jax.grad(loss)(w, g))

    merged = gather_results({f"vid{rank}": [rank, rank + 10]})
    reduced = reduce_dict_mean({"loss": float(rank + 1), "acc": 0.5})

    with open(out_path, "w") as f:
        json.dump({
            "rank": rank,
            "process_count": jax.process_count(),
            "is_main": is_main_process(),
            "mean_sq": val,
            "grad": grad.tolist(),
            "merged": merged,
            "reduced": reduced,
        }, f)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3])
