"""Fused attention-projection params (``T5Config.fused_qkv``) vs the
separate-q/k/v layout.

With ``fused_qkv`` each attention stores its projections as ONE packed
param — self-attention ``qkv`` [d_model, heads, 3, d_kv], cross-attention
``kv`` [d_model, heads, 2, d_kv] — so a projection group is one matmul and
one optimizer leaf instead of 3/2 (the round-2 train profile charged
~8 ms/step to per-leaf XLA memory-space staging across the 1.1k-leaf
tree). Same math as the separate layout: these tests pin forward/loss/
grad/decode equality on identical weights (packed via
``fuse_t5_attention_params``), the megakernel weight-stacking
equivalence, the scan_layers combination, checkpoint migration both ways,
and the head-axis tensor-parallel specs.

Reference parity note: released .pth checkpoints store separate q/k/v
(model/modeling_t5.py T5Attention); ``torch_import.apply_param_layouts``
packs them on load so checkpoint fidelity is preserved bit-exactly.
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
from vidchapters_tpu.models.torch_import import (
    fuse_t5_attention_params,
    scan_t5_params,
    unfuse_t5_attention_params,
)


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
    cfg_f = dataclasses.replace(cfg_u, fused_qkv=True)
    m_u = T5ForConditionalGeneration(cfg_u)
    m_f = T5ForConditionalGeneration(cfg_f)
    rng = jax.random.PRNGKey(0)
    batch = {
        "input_ids": jax.random.randint(rng, (2, 9), 1, 64),
        "attention_mask": jnp.asarray([[1] * 9, [1] * 6 + [0] * 3], jnp.int32),
        "decoder_input_ids": jax.random.randint(rng, (2, 5), 1, 64),
        "decoder_attention_mask": jnp.ones((2, 5), jnp.int32),
    }
    p_u = m_u.init({"params": rng, "dropout": rng}, **batch)["params"]
    p_f = jax.tree.map(jnp.asarray, fuse_t5_attention_params(
        jax.tree.map(np.asarray, p_u), cfg_u.num_heads, cfg_u.d_kv))
    return m_u, m_f, p_u, p_f, batch


def test_param_tree_shapes_and_leaf_count(models):
    m_u, m_f, p_u, p_f, batch = models
    rng = jax.random.PRNGKey(1)
    init_f = m_f.init({"params": rng, "dropout": rng}, **batch)["params"]
    ref = jax.tree_util.tree_map(lambda a: jnp.asarray(a).shape, p_f)
    got = jax.tree_util.tree_map(lambda a: a.shape, init_f)
    assert ref == got
    enc_attn = p_f["encoder"]["block_0"]["self_attn"]
    assert set(enc_attn) == {"qkv", "o"}
    assert enc_attn["qkv"]["kernel"].shape == (16, 4, 3, 4)
    dec_cross = p_f["decoder"]["block_0"]["cross_attn"]
    assert set(dec_cross) == {"q", "kv", "o"}
    assert dec_cross["kv"]["kernel"].shape == (16, 4, 2, 4)
    # the optimizer-leaf motivation: 2 fewer leaves per self-attn,
    # 1 per cross-attn
    n_u = len(jax.tree_util.tree_leaves(p_u))
    n_f = len(jax.tree_util.tree_leaves(p_f))
    assert n_u - n_f == 2 * (3 + 3) + 1 * 3


def test_fused_init_scales_match_mesh_tf(models):
    """The packed init must keep the per-projection Mesh-TF factor scales
    (q absorbs 1/sqrt(d_kv)); from-scratch training diverges otherwise."""
    m_u, m_f, p_u, p_f, batch = models
    rng = jax.random.PRNGKey(7)
    init_f = m_f.init({"params": rng, "dropout": rng}, **batch)["params"]
    cfg = m_f.cfg
    q_std = (cfg.d_model * cfg.d_kv) ** -0.5
    kv_std = cfg.d_model ** -0.5
    # pool across blocks for a stable std estimate at tiny dims
    qkv = np.stack([np.asarray(
        init_f["encoder"][f"block_{i}"]["self_attn"]["qkv"]["kernel"])
        for i in range(3)])
    for i, expect in enumerate((q_std, kv_std, kv_std)):
        got = qkv[..., i, :].std()
        assert abs(got - expect) < 0.15 * expect, (i, got, expect)
    kv = np.stack([np.asarray(
        init_f["decoder"][f"block_{i}"]["cross_attn"]["kv"]["kernel"])
        for i in range(3)])
    assert abs(kv.std() - kv_std) < 0.15 * kv_std


def test_forward_and_loss_match_unfused(models):
    m_u, m_f, p_u, p_f, batch = models
    out_u = m_u.apply({"params": p_u}, **batch, deterministic=True)
    out_f = m_f.apply({"params": p_f}, **batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_unfused(models):
    m_u, m_f, p_u, p_f, batch = models
    labels = jnp.where(batch["decoder_attention_mask"] == 1,
                       batch["decoder_input_ids"], -100)

    def loss(model, params):
        logits = model.apply({"params": params}, **batch, deterministic=True)
        return label_smoothed_cross_entropy(logits, labels, 0.1)

    l_u, g_u = jax.value_and_grad(lambda p: loss(m_u, p))(p_u)
    l_f, g_f = jax.value_and_grad(lambda p: loss(m_f, p))(p_f)
    np.testing.assert_allclose(float(l_f), float(l_u), rtol=1e-6)
    g_u_fused = fuse_t5_attention_params(
        jax.tree.map(np.asarray, g_u), m_u.cfg.num_heads, m_u.cfg.d_kv)

    def close(path, a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() <= 1e-3 * scale, path

    jax.tree_util.tree_map_with_path(close, g_f, jax.tree.map(
        jnp.asarray, g_u_fused))


def test_unfuse_roundtrip_and_idempotence(models):
    m_u, m_f, p_u, p_f, batch = models
    p_np = jax.tree.map(np.asarray, p_u)
    back = unfuse_t5_attention_params(jax.tree.map(np.asarray, p_f))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        back, p_np)
    # fuse is a no-op on already-fused trees; unfuse on unfused trees
    refused = fuse_t5_attention_params(
        jax.tree.map(np.asarray, p_f), 4, 4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), refused,
        jax.tree.map(np.asarray, p_f))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        unfuse_t5_attention_params(p_np), p_np)


def test_greedy_and_beam_decode_match_unfused(models):
    from vidchapters_tpu.ops.decoding import (
        beam_search,
        greedy_decode,
        make_decode_fns,
    )

    m_u, m_f, p_u, p_f, batch = models
    enc_mask = batch["attention_mask"]
    enc = m_u.apply({"params": p_u}, input_ids=batch["input_ids"],
                    attention_mask=enc_mask, method=m_u.encode)
    fns_u = make_decode_fns(m_u, p_u, 8)
    fns_f = make_decode_fns(m_f, p_f, 8)
    g_u = greedy_decode(fns_u, enc, enc_mask, 8)
    g_f = greedy_decode(fns_f, enc, enc_mask, 8)
    np.testing.assert_array_equal(np.asarray(g_f), np.asarray(g_u))
    b_u = beam_search(fns_u, enc, enc_mask, 8, num_beams=4)
    b_f = beam_search(fns_f, enc, enc_mask, 8, num_beams=4)
    np.testing.assert_array_equal(np.asarray(b_f), np.asarray(b_u))


def test_scanned_fused_combination(models):
    """fused_qkv composes with scan_layers: fuse first, then stack —
    forward parity and init-shape match on the combined layout."""
    m_u, m_f, p_u, p_f, batch = models
    cfg_fs = dataclasses.replace(m_f.cfg, scan_layers=True)
    m_fs = T5ForConditionalGeneration(cfg_fs)
    p_np = jax.tree.map(np.asarray, p_u)
    p_fs = jax.tree.map(jnp.asarray, scan_t5_params(
        fuse_t5_attention_params(p_np, 4, 4)))
    rng = jax.random.PRNGKey(2)
    init_fs = m_fs.init({"params": rng, "dropout": rng}, **batch)["params"]
    assert (jax.tree_util.tree_map(lambda a: jnp.asarray(a).shape, p_fs)
            == jax.tree_util.tree_map(lambda a: a.shape, init_fs))
    out_u = m_u.apply({"params": p_u}, **batch, deterministic=True)
    out_fs = m_fs.apply({"params": p_fs}, **batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_fs), np.asarray(out_u),
                               rtol=2e-5, atol=2e-5)


def test_megakernel_weight_stacking_matches(models):
    from vidchapters_tpu.ops.decode_megakernel import stack_decoder_weights

    m_u, m_f, p_u, p_f, batch = models
    cfg_fs = dataclasses.replace(m_f.cfg, scan_layers=True)
    p_fs = jax.tree.map(jnp.asarray, scan_t5_params(fuse_t5_attention_params(
        jax.tree.map(np.asarray, p_u), 4, 4)))
    w_u = stack_decoder_weights(p_u, m_u.cfg)
    for p, c in ((p_f, m_f.cfg), (p_fs, cfg_fs)):
        w = stack_decoder_weights(p, c)
        assert set(w) == set(w_u)
        for k in w:
            np.testing.assert_allclose(np.asarray(w[k]),
                                       np.asarray(w_u[k]),
                                       rtol=0, atol=0, err_msg=k)


def test_apply_param_layouts_fuse_and_scan():
    """The shared .pth-load hook packs + stacks per the model config
    (dvc_main --load, serve --ckpt, demo_vid2seq all route through it)."""
    from vidchapters_tpu.config import TemporalViTConfig, Vid2SeqConfig
    from vidchapters_tpu.models.torch_import import apply_param_layouts
    from vidchapters_tpu.models.vid2seq import Vid2Seq

    t5 = tiny_cfg(vocab_size=120)
    vit = TemporalViTConfig(embed_dim=16, depth=2, num_heads=4, mlp_dim=32,
                            num_features=6, drop_rate=0.0, dtype="float32")
    cfg_u = Vid2SeqConfig(t5=t5, vit=vit, num_bins=10)
    model = Vid2Seq(cfg_u)
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (2, 6, 16))
    toks = jnp.ones((2, 7), jnp.int32)
    p_u = model.init({"params": rng, "dropout": rng}, video, toks,
                     jnp.ones_like(toks), toks)["params"]
    p_np = jax.tree.map(np.asarray, p_u)

    # identity at the default config
    same = apply_param_layouts(p_np, cfg_u)
    assert "q" in same["t5"]["encoder"]["block_0"]["self_attn"]

    cfg_f = dataclasses.replace(
        cfg_u, t5=dataclasses.replace(t5, fused_qkv=True))
    fused = apply_param_layouts(p_np, cfg_f)
    assert "qkv" in fused["t5"]["encoder"]["block_0"]["self_attn"]
    m_f = Vid2Seq(cfg_f)
    out_u = model.apply({"params": p_u}, video, toks,
                        jnp.ones_like(toks), toks, deterministic=True)
    out_f = m_f.apply({"params": jax.tree.map(jnp.asarray, fused)}, video,
                      toks, jnp.ones_like(toks), toks, deterministic=True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        out_f, out_u)

    # fused + scanned in one call
    cfg_b = dataclasses.replace(
        cfg_u,
        t5=dataclasses.replace(t5, fused_qkv=True, scan_layers=True),
        vit=dataclasses.replace(vit, scan_layers=True))
    both = apply_param_layouts(p_np, cfg_b)
    assert "qkv" in both["t5"]["encoder"]["blocks"]["self_attn"]
    assert both["t5"]["encoder"]["blocks"]["self_attn"]["qkv"][
        "kernel"].shape == (3, 16, 4, 3, 4)


def test_migrate_ckpt_cli_fuse_roundtrip(tmp_path, models):
    """utils/migrate_ckpt --fuse fuse/unfuse: separate-layout checkpoint ->
    fused params-only checkpoint restorable under a fused_qkv template,
    and back bit-exactly."""
    from vidchapters_tpu.runtime.checkpoint import CheckpointManager
    from vidchapters_tpu.utils.migrate_ckpt import main as migrate_main

    m_u, m_f, p_u, p_f, batch = models
    tree = {"t5": p_u}
    src = tmp_path / "ckpt"
    CheckpointManager(str(src))._save_tree("best", (tree,), {})
    dst = tmp_path / "ckpt_fused"
    migrate_main(["--src", str(src), "--name", "best", "--dst", str(dst),
                  "--to", "unrolled", "--fuse", "fuse",
                  "--num-heads", "4", "--d-kv", "4"])
    template = {"t5": p_f}
    restored = CheckpointManager(str(dst)).restore_params("best", template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), restored, template)
    back = tmp_path / "ckpt_back"
    migrate_main(["--src", str(dst), "--name", "best", "--dst", str(back),
                  "--to", "unrolled", "--fuse", "unfuse"])
    restored_u = CheckpointManager(str(back)).restore_params("best", tree)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), restored_u, tree)


def test_tensor_parallel_specs_head_axis(models):
    from jax.sharding import PartitionSpec as P

    from vidchapters_tpu.parallel.sharding import infer_param_specs

    m_u, m_f, p_u, p_f, batch = models
    specs = infer_param_specs({"t5": p_f}, model_parallel=True)
    t5 = specs["t5"]
    assert (t5["encoder"]["block_0"]["self_attn"]["qkv"]["kernel"]
            == P(None, "model", None, None))
    assert (t5["decoder"]["block_0"]["cross_attn"]["kv"]["kernel"]
            == P(None, "model", None, None))
    assert (t5["decoder"]["block_0"]["cross_attn"]["q"]["kernel"]
            == P(None, "model"))
    # scanned + fused: layer axis replicated, rule shifted right
    p_fs = scan_t5_params(jax.tree.map(np.asarray, p_f))
    specs_s = infer_param_specs({"t5": p_fs}, model_parallel=True)
    assert (specs_s["t5"]["encoder"]["blocks"]["self_attn"]["qkv"]["kernel"]
            == P(None, None, "model", None, None))


@pytest.mark.slow
def test_mp4_train_step_matches_unsharded_fused():
    """Tensor parallelism at mp=4 with fused_qkv: head-axis column
    sharding keeps the sharded train step loss-exact vs unsharded."""
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
                  decoder_dropout=0.0, dtype="float32", fused_qkv=True)
    vit = TemporalViTConfig(num_features=8, embed_dim=64, depth=2,
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
