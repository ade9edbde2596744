"""Tensor-parallel correctness at mp=4 (mesh 2x4).

The multichip dryrun exercises mesh (4x2); this pins the Megatron rules at
a WIDER model axis and asserts the sharded train step reproduces the
unsharded loss exactly — XLA's inserted collectives must be semantically
invisible (SURVEY.md §2.8).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vidchapters_tpu.config import (
    OptimConfig,
    T5Config,
    TemporalViTConfig,
    Vid2SeqConfig,
)
from vidchapters_tpu.models.vid2seq import Vid2Seq
from vidchapters_tpu.parallel.sharding import infer_param_specs
from vidchapters_tpu.train.dvc_train import TrainState, make_train_step
from vidchapters_tpu.train.schedules import build_optimizer


@pytest.mark.slow
def test_mp4_train_step_matches_unsharded():
    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    t5 = T5Config(vocab_size=256, d_model=64, d_kv=16, d_ff=128,
                  num_layers=2, num_decoder_layers=2, num_heads=4,
                  dropout_rate=0.0, encoder_dropout=0.0,
                  decoder_dropout=0.0, dtype="float32")
    vit = TemporalViTConfig(num_features=8, embed_dim=64, depth=1,
                            num_heads=4, mlp_dim=128, dtype="float32")
    model = Vid2Seq(Vid2SeqConfig(t5=t5, vit=vit))
    rng = jax.random.PRNGKey(0)
    b, src, tgt = 4, 24, 12
    np_rng = np.random.default_rng(0)
    video = jnp.asarray(np_rng.normal(size=(b, 8, 64)), jnp.float32)
    inp = jnp.asarray(np_rng.integers(2, 200, (b, src)), jnp.int32)
    out = jnp.asarray(np_rng.integers(2, 200, (b, tgt)), jnp.int32)
    params = model.init({"params": rng, "dropout": rng}, video, inp,
                        jnp.ones_like(inp), out)["params"]
    tx = build_optimizer(OptimConfig(), 100)
    train_step = make_train_step(model, tx)
    batch = {"video": video, "input_tokens": inp, "output_tokens": out,
             "denoising_input_tokens": inp, "denoising_output_tokens": out}
    key = jax.random.PRNGKey(1)

    # unsharded reference
    state = TrainState(params, tx.init(params), jnp.array(0))
    _, ref_metrics = jax.jit(train_step)(state, batch, key)
    ref_loss = float(ref_metrics["total_loss"])

    # mesh (2 data x 4 model)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "model"))
    specs = infer_param_specs(params, model_parallel=True)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs)
    params_s = jax.tree_util.tree_map(jax.device_put, params, shardings)
    data = NamedSharding(mesh, P("data"))
    batch_s = {k: jax.device_put(v, data) for k, v in batch.items()}
    state_s = TrainState(params_s, tx.init(params_s), jnp.array(0))
    with mesh:
        _, metrics = jax.jit(train_step)(state_s, batch_s, key)
        loss = float(metrics["total_loss"])
    assert loss == pytest.approx(ref_loss, rel=1e-5), (loss, ref_loss)
