"""Fused decode-step self-attention (Pallas).

The autoregressive decode loop is bound by per-op execution overhead, not
FLOPs or bandwidth (BENCH_NOTES.md: ~11.7 ms/step at bs16 vs a ~1 ms
roofline across ~300 small HLO ops). This kernel collapses one decoder
layer's self-attention step — cache writes (two dynamic_update_slices),
q k^T, bias add, causal mask, softmax, and p v — into a single custom
call with the KV cache updated in place (input/output aliasing), cutting
~8 ops per layer per step.

Semantics match models/t5.py's incremental branch exactly: the bias row
arrives pre-masked (rel-pos row with NEG_INF beyond the current index), so
the kernel only writes, attends, and normalizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(idx_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref, bias_ref,
            out_ref, ko_ref, vo_ref):
    # refs: q/kn/vn [1,1,1,D]; kc/vc aliased in/out [1,1,L,D]; bias [1,1,1,L]
    idx = idx_ref[0, 0]
    l, d = ko_ref.shape[2], ko_ref.shape[3]
    # masked full-block write: Mosaic cannot prove a dynamic sublane store
    # is 8-aligned, and the whole block is tiny (L x D in VMEM anyway)
    row = jax.lax.broadcasted_iota(jnp.int32, (l, d), 0) == idx
    ko_ref[0, 0] = jnp.where(row, jnp.broadcast_to(kn_ref[0, 0], (l, d)),
                             kc_ref[0, 0])
    vo_ref[0, 0] = jnp.where(row, jnp.broadcast_to(vn_ref[0, 0], (l, d)),
                             vc_ref[0, 0])
    q = q_ref[0, 0].astype(jnp.float32)          # [1, D]
    k = ko_ref[0, 0].astype(jnp.float32)         # [L, D] (includes new slot)
    v = vo_ref[0, 0].astype(jnp.float32)
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [1, L]
    scores = scores + bias_ref[0, 0].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32
                            ).astype(out_ref.dtype)


def decode_self_attention(q: Array, k_new: Array, v_new: Array,
                          k_cache: Array, v_cache: Array, bias_row: Array,
                          cache_index: Array, interpret: bool = False):
    """One self-attention decode step, caches updated in place.

    q/k_new/v_new [B, H, 1, D]; k_cache/v_cache [B, H, L, D];
    bias_row [1, H, 1, L] with NEG_INF at positions > cache_index.
    Returns (out [B, H, 1, D], k_cache', v_cache')."""
    b, h, _, d = q.shape
    l = k_cache.shape[2]
    idx = jnp.asarray(cache_index, jnp.int32).reshape(1, 1)

    kv_spec = pl.BlockSpec((1, 1, l, d), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, 1, 1, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out, k_out, v_out = pl.pallas_call(
        _kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            new_spec,                                   # q
            new_spec,                                   # k_new
            new_spec,                                   # v_new
            kv_spec,                                    # k_cache (aliased)
            kv_spec,                                    # v_cache (aliased)
            pl.BlockSpec((1, 1, 1, l), lambda i, j: (0, j, 0, 0),
                         memory_space=pltpu.VMEM),      # bias row
        ],
        out_specs=(new_spec, kv_spec, kv_spec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(idx, q, k_new, v_new, k_cache, v_cache, bias_row)
    return out, k_out, v_out


def _cross_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
    # q [1,1,g,D] (g = beams per example); k/v [1,1,Lk,D]; mask [B,Lk]
    q = q_ref[0, 0].astype(jnp.float32)                 # [g, D]
    k = k_ref[0, 0].astype(jnp.float32)                 # [Lk, D]
    v = v_ref[0, 0].astype(jnp.float32)
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [g, Lk]
    valid = mask_ref[pl.program_id(0)][None, :] > 0
    scores = jnp.where(valid, scores, -1e9)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32
                            ).astype(out_ref.dtype)


def decode_cross_attention(q: Array, k: Array, v: Array, key_mask: Array,
                           interpret: bool = False) -> Array:
    """One cross-attention decode step with per-example KV shared across
    beams: q [B*g, H, 1, D] attends k/v [B, H, Lk, D] under key_mask
    [B, Lk]; returns [B*g, H, 1, D]. Replaces the grouped-einsum block
    (scores, mask, softmax, pv) with one call per step."""
    b0, hh, lk, d = k.shape
    g = q.shape[0] // b0
    # [B*g, H, 1, D] -> [B, H, g, D]
    qg = q.reshape(b0, g, hh, d).transpose(0, 2, 1, 3)
    out = pl.pallas_call(
        _cross_kernel,
        grid=(b0, hh),
        in_specs=[
            pl.BlockSpec((1, 1, g, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b0, lk), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b0, hh, g, d), q.dtype),
        interpret=interpret,
    )(qg, k, v, key_mask)
    # [B, H, g, D] -> [B*g, H, 1, D]
    return out.transpose(0, 2, 1, 3).reshape(b0 * g, hh, 1, d)
