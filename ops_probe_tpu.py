"""One-shot TPU probe for Mosaic features the decode megakernel needs.

Each probe is a tiny pallas kernel compiled (and run) on the real chip;
failures print the exception and continue.  Run under the axon platform:
    python ops_probe_tpu.py
"""
import functools
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                fn()
                print(f"PROBE {name}: OK ({time.time()-t0:.1f}s)", flush=True)
            except Exception as e:
                print(f"PROBE {name}: FAIL ({time.time()-t0:.1f}s): "
                      f"{type(e).__name__}: {str(e)[:500]}", flush=True)
        return run
    return deco


@probe("reshape_split_minor")
def p1():
    def k(x_ref, o_ref):
        x = x_ref[:]                      # [8, 768]
        y = x.reshape(8, 12, 64)          # split minor dim
        z = (y * 2.0).reshape(8, 768)     # merge back
        o_ref[:] = z
    x = jnp.arange(8 * 768, dtype=jnp.float32).reshape(8, 768)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 768), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


@probe("dot_general_2batch")
def p2():
    def k(q_ref, c_ref, o_ref):
        q = q_ref[:]                      # [8, 12, 1, 64]
        c = c_ref[:]                      # [8, 12, 32, 64]
        s = jax.lax.dot_general(
            q, c, (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)   # [8, 12, 1, 32]
        o_ref[:] = s
    q = jnp.ones((8, 12, 1, 64), jnp.float32)
    c = jnp.ones((8, 12, 32, 64), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 12, 1, 32), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(q, c)
    np.testing.assert_allclose(np.asarray(out), 64.0)


@probe("dot_general_1batch_3d")
def p3():
    def k(a_ref, b_ref, o_ref):
        s = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # [12, 8, 32]
        o_ref[:] = s
    a = jnp.ones((12, 8, 64), jnp.float32)
    b = jnp.ones((12, 64, 32), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((12, 8, 32), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b)
    np.testing.assert_allclose(np.asarray(out), 64.0)


@probe("scratch_persist_dynidx")
def p4():
    # grid (2, 4): layer-major; scratch [4, 8, 128] indexed by program_id(1)
    def k(x_ref, o_ref, xs):
        i, b = pl.program_id(0), pl.program_id(1)

        @pl.when(i == 0)
        def _():
            xs[b] = x_ref[0]

        xs[b] = xs[b] + 1.0
        o_ref[0] = xs[b]
    x = jnp.zeros((4, 8, 128), jnp.float32)
    out = pl.pallas_call(
        k, grid=(2, 4),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i, b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, 8, 128), jnp.float32)])(x)
    np.testing.assert_allclose(np.asarray(out), 2.0)


@probe("blockspec_5d_bf16")
def p5():
    def k(c_ref, o_ref):
        o_ref[:] = (c_ref[0].astype(jnp.float32).sum(axis=(1, 2))
                    ).astype(jnp.float32)[:, :1]
    c = jnp.ones((3, 8, 12, 32, 64), jnp.bfloat16)
    out = pl.pallas_call(
        k, grid=(3,),
        in_specs=[pl.BlockSpec((1, 8, 12, 32, 64), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32))(c)
    np.testing.assert_allclose(np.asarray(out), 12 * 32 * 64.0)


@probe("lane_slice_64")
def p6():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:, 64:128]
    x = jnp.arange(8 * 768, dtype=jnp.float32).reshape(8, 768)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 64), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[:, 64:128])


@probe("grid_cell_overhead")
def p7():
    # 96-cell grid with one small matmul per cell, streamed weight blocks:
    # measures per-cell cost floor for the megakernel's (12 x 8) grid
    d = 768
    def k(x_ref, w_ref, o_ref):
        o_ref[0] = jnp.dot(x_ref[0], w_ref[0],
                           preferred_element_type=jnp.float32)
    x = jnp.ones((96, 8, d), jnp.float32)
    w = jnp.ones((12, d, d), jnp.float32)
    f = jax.jit(lambda x, w: pl.pallas_call(
        k, grid=(12, 8),
        in_specs=[
            pl.BlockSpec((1, 8, d), lambda i, b: (i * 8 + b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), lambda i, b: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, d), lambda i, b: (i * 8 + b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((96, 8, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))(x, w))
    out = f(x, w)
    float(jnp.sum(out))  # host fetch barrier
    t0 = time.time()
    for _ in range(20):
        out = f(x, w)
        float(jnp.sum(out))
    dt = (time.time() - t0) / 20
    print(f"  grid(12,8) one [8x768]@[768x768]/cell: {dt*1e3:.3f} ms/call "
          f"({dt*1e6/96:.1f} us/cell)", flush=True)


@probe("aliased_5d_dus_outside")
def p8():
    # stacked-cache row update: one dynamic_update_slice on [N,B,H,L,D]
    # with donated buffer (the outside-kernel cache write path)
    n, bsz, h, l, d = 12, 64, 12, 256, 64
    cache = jnp.zeros((n, bsz, h, l, d), jnp.bfloat16)
    new = jnp.ones((n, bsz, h, 1, d), jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def upd(cache, new, idx):
        return jax.lax.dynamic_update_slice(cache, new, (0, 0, 0, idx, 0))
    out = upd(cache, new, jnp.asarray(3))
    assert float(out[0, 0, 0, 3, 0]) == 1.0
    t0 = time.time()
    for i in range(50):
        out = upd(out, new, jnp.asarray(i % l))
        out.block_until_ready()
    float(jnp.sum(out[0, 0, 0, 0]))
    print(f"  stacked-cache DUS: {(time.time()-t0)/50*1e6:.0f} us/step",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for p in [p1, p2, p3, p4, p5, p6, p7, p8]:
        p()
    print("probe done", flush=True)
