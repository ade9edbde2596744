"""Relative-position-bias formulation tests.

The bias is computed as a one-hot matmul (MXU-friendly fwd AND transpose)
instead of ``emb[buckets]`` — the gather's backward is a q*k-row scatter-add
into the tiny [buckets, heads] table, measured at 14 ms/step on v5e
(BENCH_NOTES.md round-2 profile).  These tests pin (a) bit-exactness of the
one-hot contraction vs the gather semantics of the reference
(/root/reference/model/modeling_t5.py:389-446) and (b) that the table
gradient matches the gather formulation's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidchapters_tpu.config import T5Config
from vidchapters_tpu.models.t5 import RelativePositionBias, relative_position_bucket


def _gather_reference(emb, q, k, offset, bidirectional, cfg):
    ctx = jnp.arange(q)[:, None] + offset
    mem = jnp.arange(k)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, bidirectional,
        cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
    return jnp.transpose(jnp.asarray(emb)[buckets], (2, 0, 1))[None]


@pytest.mark.parametrize("bidirectional", [True, False])
@pytest.mark.parametrize("q,k,offset", [(37, 53, 0), (1, 64, 17), (128, 128, 0)])
def test_onehot_matmul_exact_vs_gather(bidirectional, q, k, offset):
    cfg = T5Config(dtype="float32")
    mod = RelativePositionBias(cfg, bidirectional=bidirectional)
    params = mod.init(jax.random.PRNGKey(0), q, k)
    out = mod.apply(params, q, k, query_offset=offset)
    ref = _gather_reference(params["params"]["rel_embedding"], q, k, offset,
                            bidirectional, cfg).astype(out.dtype)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_onehot_matmul_table_gradient_matches_gather():
    cfg = T5Config(dtype="float32")
    mod = RelativePositionBias(cfg, bidirectional=True)
    q = k = 48
    params = mod.init(jax.random.PRNGKey(1), q, k)
    cotangent = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, cfg.num_heads, q, k)),
        jnp.float32)

    def via_module(emb):
        p = {"params": {"rel_embedding": emb}}
        return jnp.vdot(mod.apply(p, q, k), cotangent)

    def via_gather(emb):
        return jnp.vdot(_gather_reference(emb, q, k, 0, True, cfg), cotangent)

    emb = params["params"]["rel_embedding"]
    g_mod = jax.grad(via_module)(emb)
    g_ref = jax.grad(via_gather)(emb)
    # matmul-order vs scatter-order f32 reduction: identical up to rounding
    np.testing.assert_allclose(np.asarray(g_mod), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
