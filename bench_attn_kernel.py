"""Microbenchmark the fused attention kernels at train-step shapes.

Times the fwd and merged-bwd pallas calls with an in-jit fori_loop repeat
(per-call RPC floor on axon is ~30-60 ms; see CLAUDE.md) and one host
scalar fetch.

    python bench_attn_kernel.py [--dtype bfloat16] [--reps 20]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--h", type=int, default=12)
    p.add_argument("--l", type=int, default=1152)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--reps", type=int, default=20)
    a = p.parse_args()

    from vidchapters_tpu.ops import fused_attention as fa

    dt = jnp.dtype(a.dtype)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(a.b, a.h, a.l, a.d)), dt)
    k = jnp.asarray(rng.normal(size=(a.b, a.h, a.l, a.d)), dt)
    v = jnp.asarray(rng.normal(size=(a.b, a.h, a.l, a.d)), dt)
    bias = jnp.asarray(rng.normal(size=(1, a.h, a.l, a.l)), dt)
    mask = jnp.ones((a.b, a.l), jnp.int32)
    seed = jnp.zeros((1, 1), jnp.uint32)

    def fwd_loop(q, k, v, bias, mask, seed):
        def body(_, acc):
            out = fa._fused_forward(q, k, v, bias, mask, seed, a.dropout)
            return acc + out[0, 0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, a.reps, body, jnp.float32(0))

    def bwd_loop(q, k, v, bias, mask, seed):
        out = fa._fused_forward(q, k, v, bias, mask, seed, a.dropout)

        def body(_, acc):
            res = fa._fused_backward_impl(q, k, v, bias, mask, seed,
                                          a.dropout, out, out)
            return acc + res[0][0, 0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, a.reps, body, jnp.float32(0))

    for name, fn in [("fwd", fwd_loop), ("bwd", bwd_loop)]:
        f = jax.jit(fn)
        r = f(q, k, v, bias, mask, seed)
        float(r)  # compile + run barrier
        t0 = time.perf_counter()
        r = f(q, k, v, bias, mask, seed)
        float(r)
        dt_ms = (time.perf_counter() - t0) / a.reps * 1e3
        print(f"{name}: {dt_ms:.3f} ms/call  "
              f"(B{a.b} H{a.h} L{a.l} D{a.d} {a.dtype} drop={a.dropout})",
              flush=True)


if __name__ == "__main__":
    main()
