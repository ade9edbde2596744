"""Vid2Seq model + train step smoke/behavior tests on a tiny config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import (
    OptimConfig,
    T5Config,
    TemporalViTConfig,
    Vid2SeqConfig,
)
from vidchapters_tpu.models.vid2seq import Vid2Seq
from vidchapters_tpu.train.dvc_train import (
    TrainState,
    make_train_step,
    renorm_time_tokens,
)
from vidchapters_tpu.train.schedules import build_optimizer, build_schedule


def tiny_cfg(**kw):
    t5 = T5Config(vocab_size=200, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                  num_decoder_layers=2, num_heads=4,
                  relative_attention_num_buckets=8,
                  relative_attention_max_distance=32,
                  dropout_rate=0.1, encoder_dropout=0.1, decoder_dropout=0.1,
                  dtype="float32")
    vit = TemporalViTConfig(num_features=6, embed_dim=32, depth=1, num_heads=4,
                            mlp_dim=64, dtype="float32")
    return Vid2SeqConfig(t5=t5, vit=vit, num_bins=20, **kw)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = Vid2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    b, feats, src, tgt = 2, 6, 10, 8
    video = jnp.asarray(np.random.default_rng(0).normal(size=(b, feats, 32)),
                        jnp.float32)
    inp = jnp.ones((b, src), jnp.int32) * 5
    attn = jnp.ones((b, src), jnp.int32)
    labels = jnp.ones((b, tgt), jnp.int32) * 7
    params = model.init({"params": rng, "dropout": rng}, video, inp, attn,
                        labels)["params"]
    return cfg, model, params, (video, inp, attn, labels)


def test_forward_loss_finite(setup):
    cfg, model, params, (video, inp, attn, labels) = setup
    out = model.apply({"params": params}, video, inp, attn, labels)
    assert np.isfinite(float(out["loss"]))
    assert out["video_embeds"].shape == (2, 6, 32)


def test_video_embeds_reuse_matches(setup):
    cfg, model, params, (video, inp, attn, labels) = setup
    out1 = model.apply({"params": params}, video, inp, attn, labels)
    out2 = model.apply({"params": params}, None, inp, attn, labels,
                       video_embeds=out1["video_embeds"])
    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]), rtol=1e-6)


def test_ablations():
    for kw in ({"use_video": False}, {"use_speech": False}):
        cfg = tiny_cfg(**kw)
        model = Vid2Seq(cfg)
        rng = jax.random.PRNGKey(0)
        video = jnp.zeros((2, 6, 32), jnp.float32)
        inp = jnp.ones((2, 4), jnp.int32) * 3
        labels = jnp.ones((2, 5), jnp.int32) * 7
        params = model.init({"params": rng, "dropout": rng},
                            None if not cfg.use_video else video,
                            None if not cfg.use_speech else inp,
                            None if not cfg.use_speech else jnp.ones_like(inp),
                            labels)["params"]
        out = model.apply({"params": params},
                          None if not cfg.use_video else video,
                          None if not cfg.use_speech else inp,
                          None if not cfg.use_speech else jnp.ones_like(inp),
                          labels)
        assert np.isfinite(float(out["loss"]))


def test_train_step_decreases_loss(setup):
    cfg, model, params, (video, inp, attn, labels) = setup
    tx = build_optimizer(OptimConfig(lr=1e-3, clip_max_norm=1.0,
                                     fraction_warmup_steps=0.0), 100)
    train_step = jax.jit(make_train_step(model, tx))
    state = TrainState(params, tx.init(params), jnp.array(0))
    batch = {"video": video, "input_tokens": inp, "output_tokens": labels,
             "denoising_input_tokens": inp,
             "denoising_output_tokens": labels}
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(12):
        state, metrics = train_step(state, batch, rng)
        losses.append(float(metrics["total_loss"]))
    # dropout makes single steps noisy; compare early/late averages
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert int(state.step) == 12


def test_renorm_time_tokens(setup):
    cfg, model, params, _ = setup
    p = jax.tree_util.tree_map(lambda x: x, params)
    emb = np.asarray(p["t5"]["shared"]["embedding"]).copy()
    emb[-cfg.num_bins:] *= 100.0  # blow up time-token rows
    p["t5"]["shared"]["embedding"] = jnp.asarray(emb)
    p2 = renorm_time_tokens(p, cfg.num_bins)
    new_emb = np.asarray(p2["t5"]["shared"]["embedding"])
    frozen_norm = np.linalg.norm(new_emb[:-cfg.num_bins], axis=1).mean()
    time_norm = np.linalg.norm(new_emb[-cfg.num_bins:], axis=1).mean()
    np.testing.assert_allclose(time_norm, frozen_norm, rtol=1e-4)
    # frozen rows untouched
    np.testing.assert_array_equal(new_emb[:-cfg.num_bins], emb[:-cfg.num_bins])


def test_schedule_shapes():
    cfg = OptimConfig(lr=1.0, schedule="cosine_with_warmup",
                      fraction_warmup_steps=0.1)
    sched = build_schedule(cfg, 100)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(0.5)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)
    lin = build_schedule(OptimConfig(lr=1.0, schedule="linear_with_warmup",
                                     fraction_warmup_steps=0.1), 100)
    assert float(lin(55)) == pytest.approx(0.5)


def test_generate_decodes_time_tokens(setup):
    from vidchapters_tpu.config import GenerationConfig
    from vidchapters_tpu.train.dvc_train import make_generate_fn

    cfg, model, params, (video, inp, attn, labels) = setup
    gen = GenerationConfig(num_beams=2, max_length=6)
    generate = make_generate_fn(model, gen)
    seqs = generate(params, video, inp, jax.random.PRNGKey(0))
    assert seqs.shape == (2, 6)
    assert seqs.dtype == jnp.int32


def test_rbg_dropout_stream_loss_equivalence(setup):
    """The production trainers draw dropout with rbg keys
    (runtime/rng.fast_train_key — RngBitGenerator is ~2x cheaper than
    fused threefry on v5e, BENCH_NOTES.md round 2).  Same Bernoulli law,
    different stream: training under either key family must track the
    same loss curve within dropout noise, and the rbg stream must be
    deterministic."""
    from vidchapters_tpu.runtime.rng import fast_train_key

    cfg, model, params, (video, inp, attn, labels) = setup
    batch = {"video": video, "input_tokens": inp, "output_tokens": labels,
             "denoising_input_tokens": inp,
             "denoising_output_tokens": labels}

    def run(key):
        tx = build_optimizer(OptimConfig(lr=1e-3, clip_max_norm=1.0,
                                         fraction_warmup_steps=0.0), 100)
        train_step = jax.jit(make_train_step(model, tx))
        state = TrainState(params, tx.init(params), jnp.array(0))
        losses = []
        for _ in range(12):
            state, metrics = train_step(state, batch, key)
            losses.append(float(metrics["total_loss"]))
        return np.asarray(losses)

    threefry = run(jax.random.PRNGKey(0))
    rbg = run(fast_train_key(0))
    rbg2 = run(fast_train_key(0))
    np.testing.assert_array_equal(rbg, rbg2)  # deterministic stream
    assert not np.array_equal(rbg, threefry)  # different stream
    # same law: both decrease, curves stay within dropout noise of each
    # other (loss starts ~5+; per-step dropout noise is ~0.1 here)
    assert np.mean(rbg[-3:]) < np.mean(rbg[:3])
    assert abs(np.mean(rbg) - np.mean(threefry)) < 0.25 * np.mean(threefry)


def test_dense_remat_attention_branch(setup, monkeypatch):
    """The dense-remat training attention (decoder self-attn at recipe
    scale) must train like the saved-probs path: finite decreasing loss,
    deterministic under a fixed key, and a ~(1-rate) keep fraction in its
    hash mask."""
    from vidchapters_tpu.models import t5 as t5_mod

    monkeypatch.setattr(t5_mod, "DENSE_REMAT_MIN_ELEMS", 1)
    cfg, model, params, (video, inp, attn, labels) = setup
    tx = build_optimizer(OptimConfig(lr=1e-3, clip_max_norm=1.0,
                                     fraction_warmup_steps=0.0), 100)
    train_step = jax.jit(make_train_step(model, tx))
    state = TrainState(params, tx.init(params), jnp.array(0))
    batch = {"video": video, "input_tokens": inp, "output_tokens": labels,
             "denoising_input_tokens": inp,
             "denoising_output_tokens": labels}
    key = jax.random.PRNGKey(3)
    losses = []
    for _ in range(12):
        state, metrics = train_step(state, batch, key)
        losses.append(float(metrics["total_loss"]))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    # determinism of the rematerialized dropout
    state2 = TrainState(params, tx.init(params), jnp.array(0))
    _, m2 = jax.jit(make_train_step(model, tx))(state2, batch, key)
    np.testing.assert_allclose(float(m2["total_loss"]), losses[0], rtol=1e-6)

    # mask statistics
    keep = t5_mod._dense_keep_scale(jnp.asarray([7], jnp.uint32),
                                    (2, 3, 64, 64), 0.1)
    frac = float((np.asarray(keep) > 0).mean())
    assert abs(frac - 0.9) < 0.02
    np.testing.assert_allclose(np.asarray(keep)[np.asarray(keep) > 0],
                               1 / 0.9, rtol=1e-6)
