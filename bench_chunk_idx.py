"""Kernel-only step time vs cache index: chunked prefix-skip benefit."""
import sys, time
import jax, jax.numpy as jnp, numpy as np

def main():
    from vidchapters_tpu.config import T5Config
    from vidchapters_tpu.ops import decode_megakernel as mk
    from vidchapters_tpu.models.t5 import T5ForConditionalGeneration

    cfg = T5Config()
    model = T5ForConditionalGeneration(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, *( [jnp.ones((1, 4), jnp.int32)]*4 ))["params"]
    batch, beams, steps, enc_len = 16, 4, 256, 1100
    b = batch * beams
    np_rng = np.random.default_rng(0)
    enc_out = jnp.asarray(np_rng.normal(size=(batch, enc_len, cfg.d_model)), jnp.bfloat16)
    enc_mask = jnp.ones((batch, enc_len), jnp.int32)
    x0 = jnp.asarray(np_rng.normal(size=(b, cfg.d_model)), jnp.bfloat16)
    iters = 64
    cache = jax.jit(lambda p, e: mk.make_mega_decode_fns(
        cfg, p, steps, num_beams=beams).init_cache(b, e))(params, enc_out)

    @jax.jit
    def kernel_only(params, x, cache, idx):
        st = mk.stack_decoder_weights(params, cfg)
        bias_all = mk.precompute_bias_table(params, cfg, steps)
        lencp = cache["cross"]["k"].shape[2]
        mask_p = jnp.pad(enc_mask, [(0, 0), (0, lencp - enc_len)])
        def body(i, x):
            h, k_new, v_new = mk.mega_decode_step(
                st, x, cache["self_k"], cache["self_v"],
                cache["cross"]["k"], cache["cross"]["v"],
                bias_all[100], bias_all[0, :1, :], mask_p, idx,
                beams, cfg.num_heads, bb=8)
            return (h + k_new[:, 0] + v_new[:, 0]).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    for idx in (8, 100, 130, 250):
        idxa = jnp.asarray(idx, jnp.int32)
        out = kernel_only(params, x0, cache, idxa); float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        out = kernel_only(params, x0, cache, idxa); float(jnp.sum(out.astype(jnp.float32)))
        print(f"idx={idx}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms/step", flush=True)

main()
