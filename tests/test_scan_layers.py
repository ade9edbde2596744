"""Scanned (layer-stacked) T5 stacks vs the unrolled layout.

``T5Config.scan_layers`` stores each stack's blocks as ONE nn.scan-lifted
block with [n_layers, ...] params. Same math as the unrolled per-block
layout — these tests pin forward/loss/grad/decode equality on identical
weights, the megakernel weight-stacking equivalence, and the
tensor-parallel spec shift for the leading layer axis.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidchapters_tpu.config import T5Config
from vidchapters_tpu.models.t5 import (
    T5ForConditionalGeneration,
    label_smoothed_cross_entropy,
)
from vidchapters_tpu.models.torch_import import scan_t5_params


def tiny_cfg(**kw):
    base = dict(vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=3,
                num_decoder_layers=3, num_heads=4, dropout_rate=0.0,
                encoder_dropout=0.0, decoder_dropout=0.0, dtype="float32",
                remat=False)
    base.update(kw)
    return T5Config(**base)


@pytest.fixture(scope="module")
def models():
    cfg_u = tiny_cfg()
    cfg_s = dataclasses.replace(cfg_u, scan_layers=True)
    m_u = T5ForConditionalGeneration(cfg_u)
    m_s = T5ForConditionalGeneration(cfg_s)
    rng = jax.random.PRNGKey(0)
    batch = {
        "input_ids": jax.random.randint(rng, (2, 9), 1, 64),
        "attention_mask": jnp.asarray([[1] * 9, [1] * 6 + [0] * 3], jnp.int32),
        "decoder_input_ids": jax.random.randint(rng, (2, 5), 1, 64),
        "decoder_attention_mask": jnp.ones((2, 5), jnp.int32),
    }
    p_u = m_u.init({"params": rng, "dropout": rng}, **batch)["params"]
    p_s = jax.tree.map(jnp.asarray, scan_t5_params(
        jax.tree.map(np.asarray, p_u)))
    return m_u, m_s, p_u, p_s, batch


def test_param_tree_shapes(models):
    m_u, m_s, p_u, p_s, batch = models
    # scanned tree must initialize with the exact converted structure
    rng = jax.random.PRNGKey(1)
    init_s = m_s.init({"params": rng, "dropout": rng}, **batch)["params"]
    ref = jax.tree_util.tree_map(lambda a: jnp.asarray(a).shape, p_s)
    got = jax.tree_util.tree_map(lambda a: a.shape, init_s)
    assert ref == got
    assert p_s["encoder"]["blocks"]["self_attn"]["q"]["kernel"].shape == (3, 16, 16)
    # leaf count collapses (the optimizer-tail motivation)
    assert (len(jax.tree_util.tree_leaves(p_s))
            < len(jax.tree_util.tree_leaves(p_u)) / 2)


def test_forward_matches_unrolled(models):
    m_u, m_s, p_u, p_s, batch = models
    out_u = m_u.apply({"params": p_u}, **batch, deterministic=True)
    out_s = m_s.apply({"params": p_s}, **batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_unrolled(models):
    m_u, m_s, p_u, p_s, batch = models
    labels = jnp.where(batch["decoder_attention_mask"] == 1,
                       batch["decoder_input_ids"], -100)

    def loss(model, params):
        logits = model.apply({"params": params}, **batch, deterministic=True)
        return label_smoothed_cross_entropy(logits, labels, 0.1)

    l_u, g_u = jax.value_and_grad(lambda p: loss(m_u, p))(p_u)
    l_s, g_s = jax.value_and_grad(lambda p: loss(m_s, p))(p_s)
    np.testing.assert_allclose(float(l_s), float(l_u), rtol=1e-6)
    g_u_stacked = scan_t5_params(jax.tree.map(np.asarray, g_u))
    # criterion calibrated against a float64 oracle: BOTH layouts deviate
    # from the f64 grads by ~5e-4 max-abs on this fixture (f32 accumulation
    # order) and from each other by less — i.e. scan reorders the f32 sums,
    # it does not change the math. Near-zero elements make element-wise
    # rtol meaningless, so bound the error relative to the leaf's scale.
    def close(path, a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        err = np.abs(a - b).max()
        assert err <= 1e-3 * scale, (path, err, scale)

    jax.tree_util.tree_map_with_path(
        close, g_s, jax.tree.map(jnp.asarray, g_u_stacked))


def test_remat_dropout_path_runs_and_matches_no_remat_loss(models):
    m_u, m_s, p_u, p_s, batch = models
    cfg_r = dataclasses.replace(m_s.cfg, remat=True, dropout_rate=0.1,
                                encoder_dropout=0.1, decoder_dropout=0.1)
    m_r = T5ForConditionalGeneration(cfg_r)
    rng = jax.random.PRNGKey(3)
    out = m_r.apply({"params": p_s}, **batch, deterministic=False,
                    rngs={"dropout": rng})
    assert np.isfinite(np.asarray(out)).all()
    # grads through remat+scan+dropout are finite
    labels = jnp.where(batch["decoder_attention_mask"] == 1,
                       batch["decoder_input_ids"], -100)

    def loss(p):
        logits = m_r.apply({"params": p}, **batch, deterministic=False,
                           rngs={"dropout": rng})
        return label_smoothed_cross_entropy(logits, labels, 0.1)

    g = jax.grad(loss)(p_s)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_greedy_and_beam_decode_match_unrolled(models):
    from vidchapters_tpu.ops.decoding import (
        beam_search,
        greedy_decode,
        make_decode_fns,
    )

    m_u, m_s, p_u, p_s, batch = models
    enc_mask = batch["attention_mask"]
    enc_u = m_u.apply({"params": p_u}, input_ids=batch["input_ids"],
                      attention_mask=enc_mask, method=m_u.encode)
    enc_s = m_s.apply({"params": p_s}, input_ids=batch["input_ids"],
                      attention_mask=enc_mask, method=m_s.encode)
    np.testing.assert_allclose(np.asarray(enc_s), np.asarray(enc_u),
                               rtol=2e-5, atol=2e-5)
    fns_u = make_decode_fns(m_u, p_u, 8)
    fns_s = make_decode_fns(m_s, p_s, 8)
    g_u = greedy_decode(fns_u, enc_u, enc_mask, 8)
    g_s = greedy_decode(fns_s, enc_u, enc_mask, 8)
    np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_u))
    b_u = beam_search(fns_u, enc_u, enc_mask, 8, num_beams=4)
    b_s = beam_search(fns_s, enc_u, enc_mask, 8, num_beams=4)
    np.testing.assert_array_equal(np.asarray(b_s), np.asarray(b_u))


def test_unscan_roundtrip(models):
    """scan -> unscan is the identity on every leaf (layout migration for
    checkpoints trained under the other layout)."""
    from vidchapters_tpu.models.torch_import import (
        unscan_t5_params,
        unscan_stacked_layers,
        stack_scanned_layers,
    )

    m_u, _, p_u, p_s, _ = models
    p_np = jax.tree.map(np.asarray, p_u)
    back = unscan_t5_params(scan_t5_params(p_np))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        back, p_np)
    # idempotent on already-unrolled trees
    assert unscan_t5_params(p_np)["encoder"] is not None
    # vit-style single stack roundtrip
    blk = {"pos": np.ones((3,)), "block_0": {"w": np.ones((2, 2))},
           "block_1": {"w": np.zeros((2, 2))}}
    rt = unscan_stacked_layers(stack_scanned_layers(blk))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), rt, blk)


def test_migrate_ckpt_cli_roundtrip(tmp_path, models):
    """utils/migrate_ckpt: unrolled best-checkpoint -> scanned params-only
    checkpoint restorable under a scan_layers template, and back."""
    from vidchapters_tpu.runtime.checkpoint import CheckpointManager
    from vidchapters_tpu.utils.migrate_ckpt import main as migrate_main

    m_u, m_s, p_u, p_s, _ = models
    tree = {"t5": p_u}
    src = tmp_path / "ckpt"
    CheckpointManager(str(src))._save_tree("best", (tree,), {})
    dst = tmp_path / "ckpt_scanned"
    migrate_main(["--src", str(src), "--name", "best", "--dst", str(dst),
                  "--to", "scanned"])
    template = {"t5": p_s}
    restored = CheckpointManager(str(dst)).restore_params("best", template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), restored, template)
    back = tmp_path / "ckpt_back"
    migrate_main(["--src", str(dst), "--name", "best", "--dst", str(back),
                  "--to", "unrolled"])
    restored_u = CheckpointManager(str(back)).restore_params("best", tree)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), restored_u, tree)

    # mixed layout: scanned T5 + unrolled ViT (--vit keep)
    vit_tree = {"t5": p_u,
                "visual_encoder": {"block_0": {"w": np.ones((2, 2))},
                                   "norm": {"scale": np.ones((2,))}}}
    src2 = tmp_path / "ckpt2"
    CheckpointManager(str(src2))._save_tree("best", (vit_tree,), {})
    dst2 = tmp_path / "ckpt2_scanned"
    migrate_main(["--src", str(src2), "--name", "best", "--dst", str(dst2),
                  "--to", "scanned", "--t5-stacks", "decoder",
                  "--vit", "keep"])
    import orbax.checkpoint as ocp

    raw = ocp.StandardCheckpointer().restore(
        (dst2 / "best").absolute())
    got = raw[0] if isinstance(raw, (list, tuple)) else raw
    assert "blocks" in got["t5"]["decoder"]
    assert "block_0" in got["t5"]["encoder"]          # decoder-only scan
    assert "block_0" in got["visual_encoder"]         # vit kept unrolled

    # missing checkpoint -> clear error
    with pytest.raises(SystemExit, match="not found"):
        migrate_main(["--src", str(src2), "--name", "nope", "--dst",
                      str(dst2), "--to", "scanned"])


def test_megakernel_weight_stacking_matches(models):
    from vidchapters_tpu.ops.decode_megakernel import stack_decoder_weights

    m_u, m_s, p_u, p_s, batch = models
    w_u = stack_decoder_weights(p_u, m_u.cfg)
    w_s = stack_decoder_weights(p_s, m_s.cfg)
    assert set(w_u) == set(w_s)
    for k in w_u:
        np.testing.assert_allclose(np.asarray(w_s[k]), np.asarray(w_u[k]),
                                   rtol=0, atol=0, err_msg=k)


@pytest.mark.parametrize("which", ["decoder", "encoder"])
def test_per_stack_scan_matches_unrolled(models, which):
    """Per-stack granularity: scan_layers="decoder" scans only the decoder
    (the throughput recipe — the L=1024 encoder stays unrolled/non-remat);
    "encoder" the converse."""
    from vidchapters_tpu.models.torch_import import stack_scanned_layers

    m_u, _, p_u, _, batch = models
    cfg_d = dataclasses.replace(m_u.cfg, scan_layers=which)
    m_d = T5ForConditionalGeneration(cfg_d)
    other = "encoder" if which == "decoder" else "decoder"
    p_d = dict(p_u)
    p_d[which] = jax.tree.map(jnp.asarray, stack_scanned_layers(
        jax.tree.map(np.asarray, p_u[which])))
    rng = jax.random.PRNGKey(2)
    init_d = m_d.init({"params": rng, "dropout": rng}, **batch)["params"]
    assert "blocks" in init_d[which] and "block_0" in init_d[other]
    out_u = m_u.apply({"params": p_u}, **batch, deterministic=True)
    out_d = m_d.apply({"params": p_d}, **batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_u),
                               rtol=2e-5, atol=2e-5)


def test_vit_scan_matches_unrolled():
    from vidchapters_tpu.config import TemporalViTConfig
    from vidchapters_tpu.models.torch_import import stack_scanned_layers
    from vidchapters_tpu.models.vit import TemporalViT

    mk = lambda s: TemporalViTConfig(embed_dim=16, depth=3, num_heads=4,
                                     mlp_dim=32, num_features=6,
                                     dtype="float32", scan_layers=s)
    m_u, m_s = TemporalViT(mk(False)), TemporalViT(mk(True))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 6, 16))
    p_u = m_u.init({"params": rng, "dropout": rng}, x)["params"]
    p_s = jax.tree.map(jnp.asarray, stack_scanned_layers(
        jax.tree.map(np.asarray, p_u)))
    # scanned init shape-matches the converted tree
    init_s = m_s.init({"params": rng, "dropout": rng}, x)["params"]
    assert (jax.tree_util.tree_map(lambda a: jnp.asarray(a).shape, p_s)
            == jax.tree_util.tree_map(lambda a: a.shape, init_s))
    out_u = m_u.apply({"params": p_u}, x, deterministic=True)
    out_s = m_s.apply({"params": p_s}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=2e-5, atol=2e-5)


def test_vid2seq_train_step_and_generate_scanned(models):
    """End-to-end: the Vid2Seq train step and jit'd generation run under
    scan_layers, and the dropout-free loss matches the unrolled layout."""
    import optax

    from vidchapters_tpu.config import (
        GenerationConfig,
        TemporalViTConfig,
        Vid2SeqConfig,
    )
    from vidchapters_tpu.models.vid2seq import Vid2Seq
    from vidchapters_tpu.train.dvc_train import (
        TrainState,
        make_generate_fn,
        make_train_step,
    )

    mk_vit = lambda s: TemporalViTConfig(
        embed_dim=16, depth=2, num_heads=4, mlp_dim=32, num_features=6,
        drop_rate=0.0, dtype="float32", scan_layers=s)
    t5_u = tiny_cfg(vocab_size=120)
    cfg_u = Vid2SeqConfig(t5=t5_u, vit=mk_vit(False), num_bins=10)
    cfg_s = Vid2SeqConfig(t5=dataclasses.replace(t5_u, scan_layers=True),
                          vit=mk_vit(True), num_bins=10)
    m_u, m_s = Vid2Seq(cfg_u), Vid2Seq(cfg_s)
    rng = jax.random.PRNGKey(0)
    batch = {
        "video": jax.random.normal(rng, (2, 6, 16)),
        "input_tokens": jax.random.randint(rng, (2, 7), 1, 110),
        "output_tokens": jax.random.randint(rng, (2, 5), 1, 110),
        "denoising_input_tokens": jax.random.randint(rng, (2, 7), 1, 110),
        "denoising_output_tokens": jax.random.randint(rng, (2, 5), 1, 110),
    }
    p_u = m_u.init({"params": rng, "dropout": rng}, batch["video"],
                   batch["input_tokens"],
                   jnp.ones_like(batch["input_tokens"]),
                   batch["output_tokens"])["params"]
    from vidchapters_tpu.models.torch_import import scan_vid2seq_params

    p_s = jax.tree.map(jnp.asarray, scan_vid2seq_params(
        jax.tree.map(np.asarray, p_u)))
    tx = optax.adam(1e-3)
    metrics = {}
    for name, model, params in (("u", m_u, p_u), ("s", m_s, p_s)):
        step = make_train_step(model, tx)
        state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
        state, m = jax.jit(step)(state, batch, rng)
        assert np.isfinite(float(m["total_loss"]))
        metrics[name] = float(m["total_loss"])
    np.testing.assert_allclose(metrics["s"], metrics["u"], rtol=1e-5)

    gen = GenerationConfig(num_beams=2, max_length=6)
    out_u = make_generate_fn(m_u, gen)(p_u, batch["video"],
                                       batch["input_tokens"],
                                       jax.random.PRNGKey(1))
    out_s = make_generate_fn(m_s, gen)(p_s, batch["video"],
                                       batch["input_tokens"],
                                       jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_u))


@pytest.mark.slow
def test_mp4_train_step_matches_unsharded_scanned():
    """Tensor parallelism at mp=4 with scanned stacks: the shifted specs
    (layer axis replicated, Megatron axes moved right) must keep the
    sharded train step loss-exact vs unsharded (test_tensor_parallel.py
    pins the unrolled layout; this pins scan_layers)."""
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vidchapters_tpu.config import (
        OptimConfig,
        TemporalViTConfig,
        Vid2SeqConfig,
    )
    from vidchapters_tpu.models.vid2seq import Vid2Seq
    from vidchapters_tpu.parallel.sharding import infer_param_specs
    from vidchapters_tpu.train.dvc_train import TrainState, make_train_step
    from vidchapters_tpu.train.schedules import build_optimizer

    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    t5 = T5Config(vocab_size=256, d_model=64, d_kv=16, d_ff=128,
                  num_layers=2, num_decoder_layers=2, num_heads=4,
                  dropout_rate=0.0, encoder_dropout=0.0,
                  decoder_dropout=0.0, dtype="float32", scan_layers=True)
    vit = TemporalViTConfig(num_features=8, embed_dim=64, depth=2,
                            num_heads=4, mlp_dim=128, dtype="float32",
                            scan_layers=True)
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

    state = TrainState(params, tx.init(params), jnp.array(0))
    _, ref_metrics = jax.jit(train_step)(state, batch, key)
    ref_loss = float(ref_metrics["total_loss"])

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


def test_sequence_parallel_constraint_and_exactness_scanned():
    """Encoder SP under scan_layers: the sharding constraint sits inside
    the scan body (non-vacuity via jaxpr), and the constrained program
    reproduces the unconstrained encoder output on the (4,2) mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import vidchapters_tpu.models.t5 as t5mod
    from vidchapters_tpu.models.t5 import T5Stack

    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    cfg = tiny_cfg(scan_layers=True, d_model=32, num_heads=4, d_kv=8)
    enc = T5Stack(cfg, is_decoder=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 24, 32))
    mask = jnp.ones((4, 24), jnp.int32)
    params = enc.init({"params": rng}, x, mask, deterministic=True)["params"]
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    try:
        t5mod.SEQUENCE_SHARDING = None
        with mesh:
            ref = jax.jit(lambda p, a, m: enc.apply(
                {"params": p}, a, m, deterministic=True))(params, x, mask)
        t5mod.SEQUENCE_SHARDING = NamedSharding(mesh, P("data", "model"))
        with mesh:
            jaxpr = str(jax.make_jaxpr(
                lambda p, a, m: enc.apply({"params": p}, a, m,
                                          deterministic=True))(
                                              params, x, mask))
            # one constraint after input dropout + one inside the scan body
            assert jaxpr.count("sharding_constraint") >= 2
            out = jax.jit(lambda p, a, m: enc.apply(
                {"params": p}, a, m, deterministic=True))(params, x, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
    finally:
        t5mod.SEQUENCE_SHARDING = None


def test_generate_fn_picks_mega_under_scan_and_matches(models):
    """Eval decode with scan_layers routes through the megakernel
    (stack_decoder_weights on the stacked tree) and stays token-identical
    to the unrolled standard path (fp32, beam 4, interpret mode)."""
    from vidchapters_tpu.config import (
        GenerationConfig,
        TemporalViTConfig,
        Vid2SeqConfig,
    )
    from vidchapters_tpu.models import t5 as t5_mod
    from vidchapters_tpu.models.torch_import import scan_vid2seq_params
    from vidchapters_tpu.models.vid2seq import Vid2Seq
    from vidchapters_tpu.train.dvc_train import make_generate_fn

    t5_u = tiny_cfg(vocab_size=150, d_model=256, d_kv=64, d_ff=512,
                    num_layers=2, num_decoder_layers=2, num_heads=4)
    vit = TemporalViTConfig(num_features=8, embed_dim=256, depth=1,
                            num_heads=4, mlp_dim=64, dtype="float32")
    cfg_u = Vid2SeqConfig(t5=t5_u, vit=vit)
    cfg_s = Vid2SeqConfig(t5=dataclasses.replace(t5_u, scan_layers=True),
                          vit=vit)
    m_u, m_s = Vid2Seq(cfg_u), Vid2Seq(cfg_s)
    rng = jax.random.PRNGKey(0)
    video = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 8, 256)).astype(np.float32))
    toks = jnp.ones((8, 6), jnp.int32)
    p_u = m_u.init({"params": rng, "dropout": rng}, video, toks,
                   jnp.ones_like(toks), toks)["params"]
    p_s = jax.tree.map(jnp.asarray, scan_vid2seq_params(
        jax.tree.map(np.asarray, p_u), vit=False))
    gen = GenerationConfig(num_beams=4, max_length=12)
    ref_out = np.asarray(make_generate_fn(m_u, gen)(p_u, video, toks, rng))
    t5_mod.USE_MEGA_DECODE = True
    try:
        mega_out = np.asarray(make_generate_fn(m_s, gen)(
            p_s, video, toks, rng))
    finally:
        t5_mod.USE_MEGA_DECODE = False
    np.testing.assert_array_equal(mega_out, ref_out)


def test_tensor_parallel_specs_shift_for_layer_axis(models):
    from jax.sharding import PartitionSpec as P

    from vidchapters_tpu.parallel.sharding import infer_param_specs

    _, m_s, _, p_s, _ = models
    specs = infer_param_specs({"t5": p_s}, model_parallel=True)
    t5 = specs["t5"]
    assert (t5["encoder"]["blocks"]["self_attn"]["q"]["kernel"]
            == P(None, None, "model"))
    assert (t5["decoder"]["blocks"]["ff"]["wo"]["kernel"]
            == P(None, "model", None))
    assert t5["encoder"]["blocks"]["self_attn_norm"]["weight"] == P()
    assert t5["shared"]["embedding"] == P("model", None)
