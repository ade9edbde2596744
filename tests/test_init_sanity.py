"""From-scratch initialization sanity at full model width.

The reference trains Vid2Seq from (pretrained or scratch) torch modules whose
T5 stack carries the Mesh-TF factor-scaled initializers
(reference model/modeling_t5.py:797-840 `_init_weights`): q is scaled by
(d_model*d_kv)^-0.5 to absorb the absent 1/sqrt(d_kv) softmax scaling, FF by
d_model^-0.5 / d_ff^-0.5.  Round 4 found our Flax T5 initialized every kernel
with stddev 1.0 — fine when weights are always imported, but from-scratch
training at recipe width exploded (grad_norm ~1e10 on CPU, Inf on TPU, so
global-norm clipping zeroed every update and the loss never moved — the
failed first OVERFIT_TPU.json).  This canary pins init-time loss and grad
scale at full d_model so the failure mode can never come back silently.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from dataclasses import replace

from vidchapters_tpu.config import T5Config, TemporalViTConfig, Vid2SeqConfig
from vidchapters_tpu.models.vid2seq import Vid2Seq


@pytest.mark.slow
def test_from_scratch_init_grads_are_sane():
    # Full recipe width (d_model=768, d_ff=2048, 32k vocab) but shallow/short
    # so the CPU grad stays cheap; the explosion scaled with width, not length.
    cfg = Vid2SeqConfig(
        t5=T5Config(num_layers=4, num_decoder_layers=4, dtype="float32",
                    dropout_rate=0.0, encoder_dropout=0.0,
                    decoder_dropout=0.0),
        vit=TemporalViTConfig(num_features=100, depth=2, dtype="float32"))
    model = Vid2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    B, L_in, L_out = 2, 32, 24
    video = jax.random.normal(rng, (B, 100, 768), jnp.float32)
    inp = jnp.ones((B, L_in), jnp.int32)
    out = jax.random.randint(rng, (B, L_out), 10, 30000)
    params = model.init({"params": rng, "dropout": rng},
                        video, inp, jnp.ones_like(inp), out)["params"]

    def loss_fn(p):
        o = model.apply({"params": p}, video, inp, jnp.ones_like(inp), out,
                        deterministic=True)
        return o["loss"]

    loss = float(jax.jit(loss_fn)(params))
    grads = jax.jit(jax.grad(loss_fn))(params)
    gn = float(optax.global_norm(grads))

    # Untrained logits should be near-uniform: CE ~= ln(vocab) (+ smoothing).
    assert np.isfinite(loss) and 8.0 < loss < 14.0, loss
    # Old stddev-1.0 init measured ~1e10 here; factor-scaled init is O(10).
    assert np.isfinite(gn) and gn < 1e3, gn

    # Per-projection init scales match the reference _init_weights recipe
    # (unrolled blocks are named "block_{i}", t5.py T5Stack).
    t5p = params["t5"]["encoder"]["block_0"]
    q = t5p["self_attn"]["q"]["kernel"]
    k = t5p["self_attn"]["k"]["kernel"]
    d_model, d_kv = cfg.t5.d_model, cfg.t5.d_kv
    assert abs(float(jnp.std(q)) - (d_model * d_kv) ** -0.5) < 0.2 * (
        d_model * d_kv) ** -0.5
    assert abs(float(jnp.std(k)) - d_model ** -0.5) < 0.2 * d_model ** -0.5
