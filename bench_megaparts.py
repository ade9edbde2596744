"""Decompose the mega decode step's time on-chip: kernel alone vs full
step (kernel + cache DUS + logits), plus a pure-streaming floor kernel
with identical BlockSpecs.  Each timing runs a fori_loop of N iterations
INSIDE one jit program so the tunnel RPC is amortized."""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(name, f, *args, iters):
    out = f(*args)
    jax.tree_util.tree_map(
        lambda x: None, out)
    x = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(x.astype(jnp.float32)))  # host fetch barrier
    t0 = time.perf_counter()
    out = f(*args)
    x = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(x.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.3f} ms/iter", flush=True)
    return dt


def main():
    from vidchapters_tpu.config import T5Config
    from vidchapters_tpu.models.t5 import T5ForConditionalGeneration
    from vidchapters_tpu.ops import decode_megakernel as mk

    cfg = T5Config()
    model = T5ForConditionalGeneration(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.ones((1, 4), jnp.int32))["params"]
    batch, beams, steps, enc_len = 16, 4, 256, 1100
    b = batch * beams
    np_rng = np.random.default_rng(0)
    enc_out = jnp.asarray(np_rng.normal(size=(batch, enc_len, cfg.d_model)),
                          jnp.bfloat16)
    enc_mask = jnp.ones((batch, enc_len), jnp.int32)

    fns = mk.make_mega_decode_fns(cfg, params, steps, num_beams=beams)
    cache = jax.jit(lambda e: fns.init_cache(b, e))(enc_out)
    stacked = mk.stack_decoder_weights(params, cfg)
    bias_all = mk.precompute_bias_table(params, cfg, steps)
    lencp = cache["cross"]["k"].shape[2]
    mask_p = jnp.pad(enc_mask, [(0, 0), (0, lencp - enc_len)])
    x0 = jnp.asarray(np_rng.normal(size=(b, cfg.d_model)), jnp.bfloat16)
    iters = 64

    # 1) kernel only, chained through hidden (no cache update)
    @jax.jit
    def kernel_only(x, cache):
        bias_row = bias_all[100]
        bias0 = bias_all[0, :1, :]
        def body(i, x):
            h, k_new, v_new = mk.mega_decode_step(
                stacked, x, cache["self_k"], cache["self_v"],
                cache["cross"]["k"], cache["cross"]["v"],
                bias_row, bias0, mask_p, 100 + (i % 32), beams, cfg.num_heads,
                bb=8)
            return (h + k_new[:, 0] + v_new[:, 0]).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    t_kernel = timed("kernel_only", kernel_only, x0, cache, iters=iters)

    # 2) full step: kernel + cache DUS + logits + embed
    @jax.jit
    def full_step_loop(tokens, cache):
        def body(i, carry):
            tokens, cache = carry
            logits, cache = fns.step(tokens, cache, 100 + (i % 32), enc_mask)
            return jnp.argmax(logits, -1).astype(jnp.int32), cache
        return jax.lax.fori_loop(0, iters, body, (tokens, cache))

    tok0 = jnp.zeros((b,), jnp.int32)
    t_full = timed("full_step", full_step_loop, tok0, cache, iters=iters)

    # 3) streaming floor: same blocks, trivial body
    def floor_kernel(idx, x_in, ln, wqkv, wo_s, wq_c, wo_c, wi, wo_f, fln,
                     bias_row, bias0, seg, encmask, kc, vc, kx, vx,
                     x_out, knew, vnew, xs):
        x_out[...] = (x_in[...] + kc[0, 0, 0, 0] + vc[0, 0, 0, 0]
                      + kx[0, 0, 0, 0] + vx[0, 0, 0, 0]
                      + wqkv[0, 0, 0] + wi[0, 0, 0] + wo_f[0, 0, 0]
                      + wo_s[0, 0, 0] + wq_c[0, 0, 0] + wo_c[0, 0, 0])
        knew[...] = x_in[..., :knew.shape[-1]]
        vnew[...] = x_in[..., :vnew.shape[-1]]

    d = cfg.d_model
    inner = cfg.num_heads * cfg.d_kv
    n = cfg.num_decoder_layers
    l = steps
    bb = 8
    d_ff = cfg.d_ff

    def floor_call(x, cache):
        wspec = lambda *shape: pl.BlockSpec(
            (1,) + shape, lambda i, b: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM)
        const2 = lambda s0, s1: pl.BlockSpec(
            (s0, s1), lambda i, b: (0, 0), memory_space=pltpu.VMEM)
        cache_spec = pl.BlockSpec((bb, 1, l, inner),
                                  lambda i, b: (b, i, 0, 0),
                                  memory_space=pltpu.VMEM)
        cross_spec = pl.BlockSpec((2, 1, lencp, inner),
                                  lambda i, b: (b, i, 0, 0),
                                  memory_space=pltpu.VMEM)
        row_spec = pl.BlockSpec((bb, d), lambda i, b: (b, 0),
                                memory_space=pltpu.VMEM)
        new_spec = pl.BlockSpec((bb, inner), lambda i, b: (b, i),
                                memory_space=pltpu.VMEM)
        seg = jnp.asarray(mk.segment_matrix(cfg.num_heads, cfg.d_kv))
        return pl.pallas_call(
            floor_kernel, grid=(n, b // bb),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, b: (0, 0),
                             memory_space=pltpu.SMEM),
                row_spec, wspec(3, d), wspec(d, 3 * inner), wspec(inner, d),
                wspec(d, inner), wspec(inner, d), wspec(d, d_ff),
                wspec(d_ff, d), const2(1, d), const2(l, cfg.num_heads),
                const2(1, cfg.num_heads), const2(inner, cfg.num_heads),
                pl.BlockSpec((batch, lencp), lambda i, b: (0, 0),
                             memory_space=pltpu.VMEM),
                cache_spec, cache_spec, cross_spec, cross_spec,
            ],
            out_specs=(row_spec, new_spec, new_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, d), x.dtype),
                jax.ShapeDtypeStruct((b, n * inner), x.dtype),
                jax.ShapeDtypeStruct((b, n * inner), x.dtype),
            ),
            scratch_shapes=[pltpu.VMEM((b // bb, bb, d), x.dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(jnp.zeros((1, 1), jnp.int32), x, stacked["ln"], stacked["wqkv"],
          stacked["wo_self"], stacked["wq_cross"], stacked["wo_cross"],
          stacked["wi"], stacked["wo_ff"], stacked["final_ln"],
          bias_all[100], bias_all[0, :1, :], seg, mask_p,
          cache["self_k"], cache["self_v"],
          cache["cross"]["k"], cache["cross"]["v"])

    @jax.jit
    def floor_loop(x, cache):
        def body(i, x):
            h, k_new, v_new = floor_call(x, cache)
            return (h + k_new[:, :d] * 0).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    t_floor = timed("stream_floor", floor_loop, x0, cache, iters=iters)

    print(json.dumps({"kernel_ms": round(t_kernel * 1e3, 3),
                      "full_ms": round(t_full * 1e3, 3),
                      "floor_ms": round(t_floor * 1e3, 3)}))


if __name__ == "__main__":
    main()
