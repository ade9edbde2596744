"""AOT-compile the decoder-L-sharded SP program for a real v5e 2x4
topology (VERDICT r2 weak #7): does the TPU SPMD partitioner accept the
constrained-decoder program the XLA:CPU partitioner miscompiles?"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vidchapters_tpu.config import T5Config, TemporalViTConfig, Vid2SeqConfig
from vidchapters_tpu.models.vid2seq import Vid2Seq
from vidchapters_tpu.models import t5 as t5mod

topo = topologies.get_topology_desc("v5e:2x4", "tpu")
mesh = Mesh(np.array(topo.devices).reshape(4, 2), ("data", "model"))

cfg = Vid2SeqConfig(
    t5=T5Config(vocab_size=32200, d_model=128, d_kv=32, d_ff=256,
                num_layers=2, num_decoder_layers=2, num_heads=4,
                dropout_rate=0.0, encoder_dropout=0.0,
                decoder_dropout=0.0, dtype="float32"),
    vit=TemporalViTConfig(num_features=16, embed_dim=128, depth=2,
                          num_heads=4, mlp_dim=256, dtype="float32"))
model = Vid2Seq(cfg)
batch, src, tgt = 8, 24, 12
video = jax.ShapeDtypeStruct((batch, 16, 128), jnp.float32,
                             sharding=NamedSharding(mesh, P("data")))
inp = jax.ShapeDtypeStruct((batch, src), jnp.int32,
                           sharding=NamedSharding(mesh, P("data")))
lab = jax.ShapeDtypeStruct((batch, tgt), jnp.int32,
                           sharding=NamedSharding(mesh, P("data")))
params_shapes = jax.eval_shape(
    lambda k: model.init({"params": k, "dropout": k},
                         jnp.zeros((batch, 16, 128), jnp.float32),
                         jnp.ones((batch, src), jnp.int32),
                         jnp.ones((batch, src), jnp.int32),
                         jnp.ones((batch, tgt), jnp.int32))["params"],
    jax.random.PRNGKey(0))
rep = NamedSharding(mesh, P())
params_abs = jax.tree_util.tree_map(
    lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep),
    params_shapes)
key = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)


def loss(params, video, inp, lab, key):
    out = model.apply({"params": params}, video, inp, jnp.ones_like(inp),
                      lab, deterministic=False, rngs={"dropout": key})
    return out["loss"]


for label, decoder_too in [("encoder-only SP", False),
                           ("encoder+DECODER SP", True)]:
    t5mod.SEQUENCE_SHARDING = NamedSharding(mesh, P("data", "model"))
    orig = t5mod._sp_constrain
    if decoder_too:
        t5mod._sp_constrain = lambda x, is_decoder: (
            x if t5mod.SEQUENCE_SHARDING is None
            else jax.lax.with_sharding_constraint(x, t5mod.SEQUENCE_SHARDING))
    try:
        with mesh:
            lowered = jax.jit(jax.value_and_grad(loss)).lower(
                params_abs, video, inp, lab, key)
            compiled = lowered.compile()
        print(f"{label}: TPU v5e-8 AOT compile OK; "
              f"flops={compiled.cost_analysis()['flops']:.3g}")
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}")
    finally:
        t5mod._sp_constrain = orig
        t5mod.SEQUENCE_SHARDING = None
