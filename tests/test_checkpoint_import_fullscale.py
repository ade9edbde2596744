"""Full-scale checkpoint-import dry run (VERDICT r1 missing #1 / next #5).

Synthesizes a t5-base-scale torch checkpoint with the exact layout a
released Vid2Seq ``.pth`` has — including the vocab surgery footprint: the
reference calls ``resize_token_embeddings`` twice (32128 -> 32100 -> 32200,
model/vid2seq.py:39-40), so the shipped embedding is [32200, 768] — and
drives the precise code path a real 1.1 GB checkpoint takes:

    torch.save -> load_torch_checkpoint -> convert_vid2seq_state_dict
    -> Vid2Seq(t5-base + 12-layer ViT) beam eval -> eval_dvc + SODA.

The parameter pytree from the import must match model.init leaf-for-leaf
(structure AND shapes), which is the mechanical gate a released checkpoint
has to clear.
"""

import json

import numpy as np
import pytest

import jax

from vidchapters_tpu.config import (
    DataConfig,
    GenerationConfig,
    Vid2SeqConfig,
)

VOCAB = 32200  # 32128 -> 32100 -> +100 time tokens (vid2seq.py:39-40)
D, HEADS, DKV, DFF, LAYERS = 768, 12, 64, 3072, 12
VIT_MLP, VIT_DEPTH = 2048, 12


def _synth_reference_state_dict(rng, vocab=VOCAB, d=D, heads=HEADS, dkv=DKV,
                                dff=DFF, layers=LAYERS, rel_buckets=32,
                                vit_mlp=VIT_MLP, vit_depth=VIT_DEPTH,
                                vit_d=None, vit_feats=100) -> dict:
    """Random weights in the released checkpoint's exact key layout
    (parameterized so a tiny variant can drive the CLI --load path)."""
    sd = {}
    inner = heads * dkv
    vit_d = vit_d if vit_d is not None else d

    def w(key, *shape):
        sd[key] = rng.normal(scale=0.02, size=shape).astype(np.float32)

    w("t5_model.shared.weight", vocab, d)
    # HF also serializes the tied copies; the importer must tolerate them
    sd["t5_model.encoder.embed_tokens.weight"] = sd["t5_model.shared.weight"]
    sd["t5_model.decoder.embed_tokens.weight"] = sd["t5_model.shared.weight"]
    sd["t5_model.lm_head.weight"] = sd["t5_model.shared.weight"]
    for stack in ("encoder", "decoder"):
        w(f"t5_model.{stack}.block.0.layer.0.SelfAttention."
          f"relative_attention_bias.weight", rel_buckets, heads)
        for i in range(layers):
            b = f"t5_model.{stack}.block.{i}"
            for x in ("q", "k", "v"):
                w(f"{b}.layer.0.SelfAttention.{x}.weight", inner, d)
            w(f"{b}.layer.0.SelfAttention.o.weight", d, inner)
            w(f"{b}.layer.0.layer_norm.weight", d)
            if stack == "decoder":
                for x in ("q", "k", "v"):
                    w(f"{b}.layer.1.EncDecAttention.{x}.weight", inner, d)
                w(f"{b}.layer.1.EncDecAttention.o.weight", d, inner)
                w(f"{b}.layer.1.layer_norm.weight", d)
                ff = 2
            else:
                ff = 1
            w(f"{b}.layer.{ff}.DenseReluDense.wi.weight", dff, d)
            w(f"{b}.layer.{ff}.DenseReluDense.wo.weight", d, dff)
            w(f"{b}.layer.{ff}.layer_norm.weight", d)
        w(f"t5_model.{stack}.final_layer_norm.weight", d)

    w("visual_encoder.pos_embed", 1, vit_feats, vit_d)
    for i in range(vit_depth):
        b = f"visual_encoder.blocks.{i}"
        w(f"{b}.norm1.weight", vit_d)
        w(f"{b}.norm1.bias", vit_d)
        w(f"{b}.attn.qkv.weight", 3 * vit_d, vit_d)
        w(f"{b}.attn.qkv.bias", 3 * vit_d)
        w(f"{b}.attn.proj.weight", vit_d, vit_d)
        w(f"{b}.attn.proj.bias", vit_d)
        w(f"{b}.norm2.weight", vit_d)
        w(f"{b}.norm2.bias", vit_d)
        w(f"{b}.mlp.fc1.weight", vit_mlp, vit_d)
        w(f"{b}.mlp.fc1.bias", vit_mlp)
        w(f"{b}.mlp.fc2.weight", vit_d, vit_mlp)
        w(f"{b}.mlp.fc2.bias", vit_d)
    w("visual_encoder.norm.weight", vit_d)
    w("visual_encoder.norm.bias", vit_d)
    return sd


@pytest.mark.slow
def test_released_checkpoint_path_at_full_scale(tmp_path):
    import torch

    from vidchapters_tpu.models.torch_import import (
        convert_vid2seq_state_dict,
        load_torch_checkpoint,
    )
    from vidchapters_tpu.models.vid2seq import Vid2Seq

    rng = np.random.default_rng(0)
    sd = _synth_reference_state_dict(rng)
    ckpt_path = tmp_path / "model.pth"
    torch.save({"model": {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
                "epoch": 9, "args": {"num_bins": 100}}, ckpt_path)

    loaded = load_torch_checkpoint(str(ckpt_path))
    assert loaded["t5_model.shared.weight"].shape == (VOCAB, D)  # surgery
    params = convert_vid2seq_state_dict(loaded)

    cfg = Vid2SeqConfig()  # t5-base + 12-layer temporal ViT, the flagship
    model = Vid2Seq(cfg)
    import jax.numpy as jnp

    video = jnp.zeros((1, 100, 768), jnp.float32)
    inp = jnp.ones((1, 8), jnp.int32)
    ref_params = model.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(0)},
                            video, inp, jnp.ones_like(inp),
                            jnp.ones((1, 8), jnp.int32))["params"]

    # the mechanical gate: identical pytree structure and leaf shapes
    def flat_shapes(tree):
        return {"/".join(str(getattr(k, "key", k)) for k in p): v.shape
                for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    ref_flat = flat_shapes(ref_params)
    imp_flat = flat_shapes(params)
    assert set(ref_flat) == set(imp_flat), (
        set(ref_flat) ^ set(imp_flat))
    for k in ref_flat:
        assert ref_flat[k] == imp_flat[k], (k, ref_flat[k], imp_flat[k])

    # end-to-end: beam-4 eval over a tiny DVC set -> eval_dvc + SODA
    from vidchapters_tpu.data.dvc_dataset import (
        DenseVideoCaptioningDataset,
        EpochIterator,
    )
    from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer
    from vidchapters_tpu.train.dvc_train import evaluate

    ann = {}
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(2):
        vid = f"fullscale{i:02d}"
        ann[vid] = {"duration": 60.0,
                    "timestamps": [[0.0, 30.0], [30.0, 60.0]],
                    "sentences": ["intro section", "main section"]}
        np.save(feat_dir / f"{vid[-11:]}.npy",
                rng.normal(size=(40, 768)).astype(np.float32))
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    d = DataConfig(max_feats=100, features_dim=768, max_input_tokens=32,
                   max_output_tokens=24)
    ds = DenseVideoCaptioningDataset(str(ann_path), str(feat_dir),
                                     ByteLevelTokenizer(), d)
    it = EpochIterator(ds, 2, d, shuffle=False, drop_last=False)
    preds, metrics = evaluate(model, params, it, ByteLevelTokenizer(),
                              GenerationConfig(num_beams=4, max_length=10),
                              num_bins=100, references=[str(ann_path)])
    assert set(preds) == set(ann)
    assert "soda_c" in metrics and np.isfinite(metrics["soda_c"])
    assert "CIDEr" in metrics and np.isfinite(metrics["CIDEr"])
