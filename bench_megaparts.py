"""Decompose the mega beam-decode step's device time: kernel alone, full
step+DUS, cache reorder gather, and the beam top-k — each as a fori_loop
of ``iters`` inside one jit program (the axon tunnel has a ~30-60 ms
per-call RPC floor).  Params are passed as jit arguments, never closure
constants (embedded 200 MB constants overflow the remote-compile upload).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, f, *args, iters):
    out = f(*args)
    x = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(x.astype(jnp.float32)))
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
    x0 = jnp.asarray(np_rng.normal(size=(b, cfg.d_model)), jnp.bfloat16)
    iters = 64

    cache = jax.jit(lambda p, e: mk.make_mega_decode_fns(
        cfg, p, steps, num_beams=beams).init_cache(b, e))(params, enc_out)

    # 1) kernel only, chained through hidden (no cache update)
    @jax.jit
    def kernel_only(params, x, cache):
        fns_stacked = mk.stack_decoder_weights(params, cfg)
        bias_all = mk.precompute_bias_table(params, cfg, steps)
        lencp = cache["cross"]["k"].shape[2]
        mask_p = jnp.pad(enc_mask, [(0, 0), (0, lencp - enc_len)])

        def body(i, x):
            h, k_new, v_new = mk.mega_decode_step(
                fns_stacked, x, cache["self_k"], cache["self_v"],
                cache["cross"]["k"], cache["cross"]["v"],
                bias_all[100], bias_all[0, :1, :], mask_p, 100 + (i % 32),
                beams, cfg.num_heads, bb=8)
            return (h + k_new[:, 0] + v_new[:, 0]).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    timed("kernel_only", kernel_only, params, x0, cache, iters=iters)

    # 2) full mega step (kernel + DUS + logits) + greedy argmax
    @jax.jit
    def step_loop(params, tokens, cache):
        fns = mk.make_mega_decode_fns(cfg, params, steps, num_beams=beams)

        def body(i, carry):
            tokens, cache = carry
            logits, cache = fns.step(tokens, cache, 100 + (i % 32), enc_mask)
            return jnp.argmax(logits, -1).astype(jnp.int32), cache
        return jax.lax.fori_loop(0, iters, body,
                                 (tokens, cache))

    tok0 = jnp.zeros((b,), jnp.int32)
    timed("step_dus_logits_argmax", step_loop, params, tok0, cache,
          iters=iters)

    # 3) beam-reorder gather of both self caches
    @jax.jit
    def reorder_loop(cache, src):
        def body(i, carry):
            k, v = carry
            k = jnp.take(k, src, axis=0)
            v = jnp.take(v, src, axis=0)
            return k, v
        return jax.lax.fori_loop(0, iters, body,
                                 (cache["self_k"], cache["self_v"]))

    src = jnp.asarray(np_rng.integers(0, b, (b,)), jnp.int32)
    timed("reorder_gather", reorder_loop, cache, src, iters=iters)

    # 4) the beam top-k pair over K*vocab
    @jax.jit
    def topk_loop(logits):
        def body(i, acc):
            logp = jax.nn.log_softmax(logits + acc[:, :1, None], axis=-1)
            flat = logp.reshape(batch, beams * logits.shape[-1])
            top_scores, top_idx = jax.lax.top_k(flat, 2 * beams)
            s2, i2 = jax.lax.top_k(
                jnp.concatenate([top_scores, top_scores], axis=1), beams)
            return acc + s2
        acc0 = jnp.zeros((batch, beams), jnp.float32)
        return jax.lax.fori_loop(0, iters, body, acc0)

    logits0 = jnp.asarray(
        np_rng.normal(size=(batch, beams, cfg.vocab_size)), jnp.float32)
    timed("beam_topk_pair", topk_loop, logits0, iters=iters)

    print("done", flush=True)


if __name__ == "__main__":
    main()
