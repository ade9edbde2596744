"""BLIP-2 (ViT-g + Q-Former + FLAN-T5) in Flax — the zero-shot visual
captioner.

The reference loads ``Salesforce/blip2-flan-t5-xl`` for two paths: captioning
the midpoint frame of each detected shot in zero-shot visual VCG
(zs_visualvcg.py:249-260, prompt at 256, ``max_new_tokens=20``) and the
BLIP-2 eval dispatch for GT-boundary chapter titling (vc.py:268-272,
eval at vc.py:109-131).  This module implements the three towers from
scratch:

- vision model: CLIP/EVA-style pre-LN ViT with class token, learned absolute
  position embeddings, fused qkv (k-bias fixed at zero, the BLIP-2 tweak)
  and a final post-layernorm;
- Q-Former: BERT-style stack over ``num_query_tokens`` learned queries with
  cross-attention into the frozen image sequence every
  ``cross_attention_frequency`` layers and query-specific feed-forward;
- language model: the in-repo Flax T5 (models/t5.py — flan-t5 uses the
  gated-GELU / untied-head variant), fed with the projected query embeddings
  concatenated before the prompt token embeddings.

Weight import from the HF ``Blip2ForConditionalGeneration`` state_dict;
parity-tested against transformers on random weights (tests/test_blip2.py).
Generation reuses the jit'd static-shape decoders in ops/decoding.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vidchapters_tpu.config import T5Config
from vidchapters_tpu.models.t5 import T5ForConditionalGeneration

Array = jax.Array

# CLIP normalization used by the HF Blip2Processor (OPENAI_CLIP_MEAN/STD)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class Blip2VisionConfig:
    hidden_size: int = 1408
    intermediate_size: int = 6144
    num_layers: int = 39
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    dtype: str = "float32"


@dataclass(frozen=True)
class QFormerConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    cross_attention_frequency: int = 2
    encoder_hidden_size: int = 1408
    layer_norm_eps: float = 1e-12
    dtype: str = "float32"


@dataclass(frozen=True)
class Blip2Config:
    vision: Blip2VisionConfig = field(default_factory=Blip2VisionConfig)
    qformer: QFormerConfig = field(default_factory=QFormerConfig)
    # flan-t5-xl: d_model 2048, gated act, untied lm head
    t5: T5Config = field(default_factory=lambda: T5Config(
        vocab_size=32128, d_model=2048, d_kv=64, d_ff=5120, num_layers=24,
        num_decoder_layers=24, num_heads=32, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, label_smoothing=0.0, dropout_rate=0.0,
        encoder_dropout=0.0, decoder_dropout=0.0))
    num_query_tokens: int = 32


class Blip2VisionModel(nn.Module):
    """Pre-LN ViT over (image_size/patch)^2 patches + class token
    (HF Blip2VisionModel; qkv fused with a zero k-bias)."""

    cfg: Blip2VisionConfig

    @nn.compact
    def __call__(self, pixel_values: Array) -> Array:
        """pixel_values [B, 3, H, W] (processor layout) -> [B, N+1, D]."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        b = pixel_values.shape[0]
        p, d = cfg.patch_size, cfg.hidden_size
        n_side = cfg.image_size // p

        patch_kernel = self.param(
            "patch_kernel", nn.initializers.normal(0.02), (d, 3 * p * p),
            jnp.float32)
        patch_bias = self.param("patch_bias", nn.initializers.zeros, (d,),
                                jnp.float32)
        x = pixel_values.reshape(b, 3, n_side, p, n_side, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, n_side * n_side,
                                                  3 * p * p)
        x = (jnp.einsum("bnp,dp->bnd", x.astype(dt),
                        patch_kernel.astype(dt))
             + patch_bias.astype(dt))

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (1, 1, d), jnp.float32)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1, n_side * n_side + 1, d), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (b, 1, d)), x], axis=1)
        x = x + pos.astype(dt)

        n_heads = cfg.num_heads
        d_head = d // n_heads
        l = x.shape[1]
        for i in range(cfg.num_layers):
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                             name=f"layer_{i}_norm1")(x)
            qkv = nn.Dense(3 * d, dtype=dt, name=f"layer_{i}_qkv")(h)
            q, k, v = jnp.split(qkv.reshape(b, l, 3, n_heads, d_head), 3,
                                axis=2)
            q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            probs = jax.nn.softmax(scores / np.sqrt(d_head), axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dt), v)
            attn = attn.reshape(b, l, d)
            x = x + nn.Dense(d, dtype=dt, name=f"layer_{i}_proj")(attn)
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                             name=f"layer_{i}_norm2")(x)
            h = nn.Dense(cfg.intermediate_size, dtype=dt,
                         name=f"layer_{i}_fc1")(h)
            h = jax.nn.gelu(h, approximate=False)
            x = x + nn.Dense(d, dtype=dt, name=f"layer_{i}_fc2")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                            name="post_layernorm")(x)


class QFormerLayer(nn.Module):
    cfg: QFormerConfig
    has_cross: bool

    @nn.compact
    def __call__(self, x: Array, enc: Array) -> Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        h_n = cfg.num_heads
        d = cfg.hidden_size
        d_head = d // h_n
        b, q_len, _ = x.shape

        def mha(q_in: Array, kv_in: Array, prefix: str) -> Array:
            q = nn.Dense(d, dtype=dt, name=f"{prefix}_q")(q_in)
            k = nn.Dense(d, dtype=dt, name=f"{prefix}_k")(kv_in)
            v = nn.Dense(d, dtype=dt, name=f"{prefix}_v")(kv_in)
            lq, lk = q.shape[1], k.shape[1]
            q = q.reshape(b, lq, h_n, d_head)
            k = k.reshape(b, lk, h_n, d_head)
            v = v.reshape(b, lk, h_n, d_head)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            probs = jax.nn.softmax(scores / np.sqrt(d_head), axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dt), v)
            out = nn.Dense(d, dtype=dt,
                           name=f"{prefix}_out")(attn.reshape(b, lq, d))
            return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                                name=f"{prefix}_norm")(out + q_in)

        x = mha(x, x, "self")
        if self.has_cross:
            x = mha(x, enc.astype(dt), "cross")
        h = nn.Dense(cfg.intermediate_size, dtype=dt,
                     name="intermediate_query")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=dt, name="output_query")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                            name="ff_norm")(h + x)


class QFormer(nn.Module):
    """Query-only Q-Former (the captioning path feeds no text,
    HF Blip2QFormerModel with ``query_embeds`` only)."""

    cfg: QFormerConfig

    @nn.compact
    def __call__(self, query_embeds: Array, enc: Array) -> Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                         name="embed_norm")(query_embeds.astype(dt))
        for i in range(cfg.num_layers):
            x = QFormerLayer(cfg, i % cfg.cross_attention_frequency == 0,
                             name=f"layer_{i}")(x, enc)
        return x


class Blip2(nn.Module):
    """HF ``Blip2ForConditionalGeneration`` with a FLAN-T5 language model
    (the reference's blip2-flan-t5-xl, vc.py:268-272)."""

    cfg: Blip2Config

    def setup(self):
        self.vision = Blip2VisionModel(self.cfg.vision)
        self.qformer = QFormer(self.cfg.qformer)
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, self.cfg.num_query_tokens, self.cfg.qformer.hidden_size),
            jnp.float32)
        self.language_projection = nn.Dense(
            self.cfg.t5.d_model, dtype=jnp.dtype(self.cfg.t5.dtype),
            name="language_projection")
        self.t5 = T5ForConditionalGeneration(self.cfg.t5)

    def encode_image(self, pixel_values: Array) -> Array:
        """-> projected query embeddings [B, Q, d_model]."""
        image_embeds = self.vision(pixel_values)
        queries = jnp.broadcast_to(
            jnp.asarray(self.query_tokens),
            (pixel_values.shape[0],) + self.query_tokens.shape[1:])
        query_out = self.qformer(queries, image_embeds)
        return self.language_projection(query_out)

    def encode(self, pixel_values: Array, input_ids: Array,
               attn_mask: Array) -> Tuple[Array, Array]:
        """T5-encode [image queries ; prompt tokens] -> (enc_out, enc_mask)."""
        lang = self.encode_image(pixel_values)
        tok = self.t5.embed(input_ids)
        embeds = jnp.concatenate([lang, tok.astype(lang.dtype)], axis=1)
        q = lang.shape[1]
        mask = jnp.concatenate(
            [jnp.ones((input_ids.shape[0], q), attn_mask.dtype), attn_mask],
            axis=1)
        return self.t5.encode(inputs_embeds=embeds, attention_mask=mask), mask

    def __call__(self, pixel_values: Array, input_ids: Array,
                 attn_mask: Array, decoder_input_ids: Array,
                 decoder_attn_mask: Optional[Array] = None) -> Array:
        enc_out, enc_mask = self.encode(pixel_values, input_ids, attn_mask)
        if decoder_attn_mask is None:
            decoder_attn_mask = jnp.ones_like(decoder_input_ids)
        return self.t5.decode(decoder_input_ids, decoder_attn_mask, enc_out,
                              enc_mask)


def blip2_generate(model: Blip2, params, pixel_values: Array,
                   input_ids: Array, attn_mask: Array,
                   max_new_tokens: int = 20, num_beams: int = 1,
                   eos_token_id: int = 1) -> Array:
    """Greedy (or beam) caption generation — the reference's
    ``model.generate(**inputs, max_new_tokens=20)`` (zs_visualvcg.py:264,
    vc.py:118).  Returns [B, max_new_tokens] token ids, 0-padded after EOS."""
    from vidchapters_tpu.ops import decoding

    enc_out, enc_mask = model.apply(
        {"params": params}, pixel_values, input_ids, attn_mask,
        method=model.encode)
    t5 = T5ForConditionalGeneration(model.cfg.t5)
    fns = decoding.make_decode_fns(t5, params["t5"], max_new_tokens)
    if num_beams > 1:
        seqs, _ = decoding.beam_search(fns, enc_out, enc_mask, max_new_tokens,
                                       num_beams=num_beams,
                                       eos_token_id=eos_token_id)
        return seqs
    return decoding.greedy_decode(fns, enc_out, enc_mask, max_new_tokens,
                                  eos_token_id=eos_token_id)


def preprocess_frames(frames: np.ndarray) -> np.ndarray:
    """uint8 [B, H, W, 3] (decoded video frames, 224x224) -> normalized
    [B, 3, H, W] float32, matching Blip2Processor's CLIP normalization."""
    x = frames.astype(np.float32) / 255.0
    x = (x - IMAGE_MEAN) / IMAGE_STD
    return np.ascontiguousarray(x.transpose(0, 3, 1, 2))


# ---------------------------------------------------------------------------
# HF weight import
# ---------------------------------------------------------------------------


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)


def convert_hf_blip2(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF ``Blip2ForConditionalGeneration`` (flan-t5 variant) state_dict ->
    Flax params for :class:`Blip2`."""
    from vidchapters_tpu.models.torch_import import convert_t5_state_dict

    g = lambda k: np.asarray(sd[k], dtype=np.float32)

    patch_w = g("vision_model.embeddings.patch_embedding.weight")  # [D,3,p,p]
    vision: Dict[str, Any] = {
        "patch_kernel": patch_w.reshape(patch_w.shape[0], -1),
        "patch_bias": g("vision_model.embeddings.patch_embedding.bias"),
        "class_embedding":
            g("vision_model.embeddings.class_embedding").reshape(1, 1, -1),
        "position_embedding":
            g("vision_model.embeddings.position_embedding"),
        "post_layernorm": {"scale": g("vision_model.post_layernorm.weight"),
                           "bias": g("vision_model.post_layernorm.bias")},
    }
    i = 0
    while f"vision_model.encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"vision_model.encoder.layers.{i}."
        vision.update({
            f"layer_{i}_norm1": {"scale": g(lp + "layer_norm1.weight"),
                                 "bias": g(lp + "layer_norm1.bias")},
            f"layer_{i}_norm2": {"scale": g(lp + "layer_norm2.weight"),
                                 "bias": g(lp + "layer_norm2.bias")},
            f"layer_{i}_qkv": {"kernel": _t(g(lp + "self_attn.qkv.weight")),
                               "bias": g(lp + "self_attn.qkv.bias")},
            f"layer_{i}_proj": {
                "kernel": _t(g(lp + "self_attn.projection.weight")),
                "bias": g(lp + "self_attn.projection.bias")},
            f"layer_{i}_fc1": {"kernel": _t(g(lp + "mlp.fc1.weight")),
                               "bias": g(lp + "mlp.fc1.bias")},
            f"layer_{i}_fc2": {"kernel": _t(g(lp + "mlp.fc2.weight")),
                               "bias": g(lp + "mlp.fc2.bias")},
        })
        i += 1

    def qattn(lp: str, prefix: str) -> Dict[str, Any]:
        return {
            f"{prefix}_q": {"kernel": _t(g(lp + "attention.query.weight")),
                            "bias": g(lp + "attention.query.bias")},
            f"{prefix}_k": {"kernel": _t(g(lp + "attention.key.weight")),
                            "bias": g(lp + "attention.key.bias")},
            f"{prefix}_v": {"kernel": _t(g(lp + "attention.value.weight")),
                            "bias": g(lp + "attention.value.bias")},
            f"{prefix}_out": {"kernel": _t(g(lp + "output.dense.weight")),
                              "bias": g(lp + "output.dense.bias")},
            f"{prefix}_norm": {"scale": g(lp + "output.LayerNorm.weight"),
                               "bias": g(lp + "output.LayerNorm.bias")},
        }

    qformer: Dict[str, Any] = {
        "embed_norm": {"scale": g("qformer.layernorm.weight"),
                       "bias": g("qformer.layernorm.bias")},
    }
    i = 0
    while f"qformer.encoder.layer.{i}.attention.attention.query.weight" in sd:
        lp = f"qformer.encoder.layer.{i}."
        layer = qattn(lp + "attention.", "self")
        if lp + "crossattention.attention.query.weight" in sd:
            layer.update(qattn(lp + "crossattention.", "cross"))
        layer.update({
            "intermediate_query": {
                "kernel": _t(g(lp + "intermediate_query.dense.weight")),
                "bias": g(lp + "intermediate_query.dense.bias")},
            "output_query": {
                "kernel": _t(g(lp + "output_query.dense.weight")),
                "bias": g(lp + "output_query.dense.bias")},
            "ff_norm": {"scale": g(lp + "output_query.LayerNorm.weight"),
                        "bias": g(lp + "output_query.LayerNorm.bias")},
        })
        qformer[f"layer_{i}"] = layer
        i += 1

    return {
        "vision": vision,
        "qformer": qformer,
        "query_tokens": g("query_tokens"),
        "language_projection": {"kernel": _t(g("language_projection.weight")),
                                "bias": g("language_projection.bias")},
        "t5": convert_t5_state_dict(sd, prefix="language_model.",
                                    gated=True),
    }


def build_blip2_captioner(model_dir: str, max_new_tokens: int = 20):
    """Executable end-to-end path for the zero-shot visual captioner hook:
    load an HF BLIP-2 checkpoint directory into Flax and return
    ``caption_fn(frames_uint8 [B, 224, 224, 3], prompt) -> list[str]``."""
    import torch
    from transformers import AutoTokenizer, Blip2ForConditionalGeneration

    tok = AutoTokenizer.from_pretrained(model_dir)
    hf = Blip2ForConditionalGeneration.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    hf_cfg = hf.config
    cfg = Blip2Config(
        vision=Blip2VisionConfig(
            hidden_size=hf_cfg.vision_config.hidden_size,
            intermediate_size=hf_cfg.vision_config.intermediate_size,
            num_layers=hf_cfg.vision_config.num_hidden_layers,
            num_heads=hf_cfg.vision_config.num_attention_heads,
            image_size=hf_cfg.vision_config.image_size,
            patch_size=hf_cfg.vision_config.patch_size,
            dtype="bfloat16"),
        qformer=QFormerConfig(
            hidden_size=hf_cfg.qformer_config.hidden_size,
            num_layers=hf_cfg.qformer_config.num_hidden_layers,
            num_heads=hf_cfg.qformer_config.num_attention_heads,
            intermediate_size=hf_cfg.qformer_config.intermediate_size,
            cross_attention_frequency=
                hf_cfg.qformer_config.cross_attention_frequency,
            encoder_hidden_size=hf_cfg.qformer_config.encoder_hidden_size,
            dtype="bfloat16"),
        t5=T5Config(
            vocab_size=hf_cfg.text_config.vocab_size,
            d_model=hf_cfg.text_config.d_model,
            d_kv=hf_cfg.text_config.d_kv, d_ff=hf_cfg.text_config.d_ff,
            num_layers=hf_cfg.text_config.num_layers,
            num_decoder_layers=hf_cfg.text_config.num_decoder_layers,
            num_heads=hf_cfg.text_config.num_heads,
            feed_forward_proj="gated-gelu",
            tie_word_embeddings=hf_cfg.text_config.tie_word_embeddings,
            label_smoothing=0.0, dropout_rate=0.0, encoder_dropout=0.0,
            decoder_dropout=0.0, dtype="bfloat16"),
        num_query_tokens=hf_cfg.num_query_tokens)
    params = convert_hf_blip2({k: v.numpy() for k, v in
                               hf.state_dict().items()})
    del hf
    model = Blip2(cfg)
    gen = jax.jit(lambda px, ids, mask: blip2_generate(
        model, params, px, ids, mask, max_new_tokens=max_new_tokens))

    def caption_fn(frames: np.ndarray, prompt: str) -> list:
        px = jnp.asarray(preprocess_frames(frames))
        enc = tok([prompt] * frames.shape[0], return_tensors="np",
                  padding=True)
        toks = np.asarray(gen(px, jnp.asarray(enc["input_ids"], jnp.int32),
                              jnp.asarray(enc["attention_mask"], jnp.int32)))
        return tok.batch_decode(toks, skip_special_tokens=True)

    return caption_fn
