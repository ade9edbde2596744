"""Sequence-parallel activation constraints (EXPERIMENTAL — see
runtime/mesh.enable_sequence_parallelism).

Documents two facts on the 8-device virtual CPU mesh:
1. the constraint is value-preserving in the plain forward, and
2. the primal of ``value_and_grad`` matches unconstrained in this env —
   though a ~1% shift was observed for the same program in standalone
   runs (see test_sp_full_model_primal_under_grad), which keeps the
   feature opt-in until understood.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import vidchapters_tpu.models.t5 as t5mod
from vidchapters_tpu.config import T5Config
from vidchapters_tpu.models.t5 import T5Stack


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))


@pytest.fixture
def stack_setup():
    cfg = T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_decoder_layers=2, num_heads=4, dropout_rate=0.0,
                   encoder_dropout=0.0, decoder_dropout=0.0, dtype="float32")
    enc = T5Stack(cfg, is_decoder=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 24, 32))
    mask = jnp.ones((4, 24), jnp.int32)
    params = enc.init({"params": rng}, x, mask, deterministic=True)["params"]
    return enc, params, x, mask


@pytest.fixture(autouse=True)
def _reset_sp():
    yield
    t5mod.SEQUENCE_SHARDING = None


def test_sp_constraint_preserves_forward(mesh, stack_setup):
    enc, params, x, mask = stack_setup

    def fwd(params, x, mask):
        return enc.apply({"params": params}, x, mask, deterministic=True)

    t5mod.SEQUENCE_SHARDING = None
    with mesh:
        base = np.asarray(jax.jit(fwd)(params, x, mask))
    t5mod.SEQUENCE_SHARDING = NamedSharding(mesh, P("data", "model"))
    with mesh:
        sp = np.asarray(jax.jit(fwd)(params, x, mask))
    np.testing.assert_array_equal(base, sp)


def test_sp_single_stack_primal_under_grad_is_clean(mesh, stack_setup):
    """Encoder-only constraint under value_and_grad is exact (the
    standalone-run divergence needed BOTH stacks constrained)."""
    enc, params, x, mask = stack_setup

    def loss(params, x, mask):
        out = enc.apply({"params": params}, x, mask, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.mean(out.astype(jnp.float32) ** 2)

    data_x = jax.device_put(x, NamedSharding(mesh, P("data")))
    t5mod.SEQUENCE_SHARDING = None
    with mesh:
        base, _ = jax.jit(jax.value_and_grad(loss))(params, data_x, mask)
    t5mod.SEQUENCE_SHARDING = NamedSharding(mesh, P("data", "model"))
    with mesh:
        sp, _ = jax.jit(jax.value_and_grad(loss))(params, data_x, mask)
    np.testing.assert_allclose(float(base), float(sp), rtol=1e-6)


def test_sp_full_model_primal_under_grad(mesh):
    """Guard: full-model primal under value_and_grad with both stacks
    L-sharded. A ~1% primal shift WAS observed for this exact program in
    standalone runs (env ``PYTHONPATH=/root/repo JAX_PLATFORMS=cpu``,
    no axon plugin loaded — /tmp/sp_vg_hp.py in the round-1 session); it
    does not reproduce under the suite env. Until that discrepancy is
    understood, enable_sequence_parallelism stays opt-in — this test
    guards the suite env against regressions."""
    from vidchapters_tpu.config import (T5Config, TemporalViTConfig,
                                        Vid2SeqConfig)
    from vidchapters_tpu.models.vid2seq import Vid2Seq

    # exactly the __graft_entry__._small_cfg shapes — the divergence is
    # shape-dependent (d_model 64 / vit depth 1 variants come out exact)
    cfg = Vid2SeqConfig(
        t5=T5Config(vocab_size=32200, d_model=128, d_kv=32, d_ff=256,
                    num_layers=2, num_decoder_layers=2, num_heads=4,
                    dropout_rate=0.0, encoder_dropout=0.0,
                    decoder_dropout=0.0, dtype="float32"),
        vit=TemporalViTConfig(num_features=16, embed_dim=128, depth=2,
                              num_heads=4, mlp_dim=256, dtype="float32"))
    model = Vid2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    batch, src, tgt = 8, 24, 12
    video = jnp.zeros((batch, 16, 128), jnp.float32)
    inp = jnp.ones((batch, src), jnp.int32)
    lab = jnp.ones((batch, tgt), jnp.int32)
    params = model.init({"params": rng, "dropout": rng}, video, inp,
                        jnp.ones_like(inp), lab)["params"]

    def loss(params, video, inp, lab, key):
        out = model.apply({"params": params}, video, inp,
                          jnp.ones_like(inp), lab, deterministic=False,
                          rngs={"dropout": key})
        return out["loss"]

    ds = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, NamedSharding(mesh, P()))  # replicated
    args = (params, jax.device_put(video, ds), jax.device_put(inp, ds),
            jax.device_put(lab, ds), jax.random.PRNGKey(7))
    t5mod.SEQUENCE_SHARDING = None
    with mesh:
        base, _ = jax.jit(jax.value_and_grad(loss))(*args)
    t5mod.SEQUENCE_SHARDING = NamedSharding(mesh, P("data", "model"))
    with mesh:
        sp, _ = jax.jit(jax.value_and_grad(loss))(*args)
    np.testing.assert_allclose(float(base), float(sp), rtol=1e-6)
