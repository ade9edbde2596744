"""CLIP image + text towers in Flax.

TPU-native replacement for the CLIP uses across the reference: frame feature
extraction with ViT-L/14 (demo_vid2seq.py:98-99, BASELINE.json fused-feature
target), the frozen text encoder inside Moment-DETR
(moment_detr/moment_detr/model.py:53-56,94-107 — token-level features
projected through ``text_projection``), zero-shot grounding similarity
(zs_vcgr.py), and the run_on_video demo's ViT-B/32 extractor
(moment_detr/run_on_video/data_utils.py:9-49).

Architecture is OpenAI CLIP: conv patchify + class token + pre-norm
transformer with QuickGELU, causal text transformer with EOT pooling.
Weight import supports both the OpenAI ``clip`` pip state_dict layout and HF
``transformers.CLIPModel`` layout (used for offline parity tests).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    output_dim: int = 768
    mlp_dim: int = 0  # 0 = 4 * width
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 768
    mlp_dim: int = 0  # 0 = 4 * width
    dtype: str = "bfloat16"


VIT_L14 = CLIPVisionConfig()
VIT_B32 = CLIPVisionConfig(patch_size=32, width=768, layers=12, heads=12,
                           output_dim=512)
TEXT_L14 = CLIPTextConfig()
TEXT_B32 = CLIPTextConfig(width=512, layers=12, heads=8, output_dim=512)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


# Route the (non-causal) vision attention through the fused Pallas kernel.
# MEASURED NEGATIVE on v5e (round 3): at CLIP's 257-token sequences the
# kernel's (B*H, q-blocks) grid is 2048+ tiny cells at batch 128 and
# throughput DROPS 565 -> 453 frames/s — the same overhead mode as the
# per-layer decode kernels. XLA's fused einsum+softmax chain wins at short
# sequences; the flag stays for long-sequence towers.
USE_FUSED_ATTENTION: Optional[bool] = False


def _fused_enabled() -> bool:
    if USE_FUSED_ATTENTION is not None:
        return USE_FUSED_ATTENTION
    return jax.default_backend() not in ("cpu", "gpu")


class ResidualBlock(nn.Module):
    width: int
    heads: int
    dtype: Any
    mlp_dim: int = 0

    @nn.compact
    def __call__(self, x: Array, causal_mask: Optional[Array] = None) -> Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        b, l, _ = h.shape
        d_head = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="attn_in")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, self.heads, d_head)
        k = k.reshape(b, l, self.heads, d_head)
        v = v.reshape(b, l, self.heads, d_head)
        if causal_mask is None and _fused_enabled():
            from vidchapters_tpu.ops.fused_attention import (
                fused_attention_padded,
            )

            # CLIP scales scores by 1/sqrt(d); the kernel computes the
            # T5-style unscaled q k^T, so fold the scale into q
            qh = jnp.swapaxes(q * np.float32(1.0 / np.sqrt(d_head)), 1, 2)
            kh = jnp.swapaxes(k, 1, 2)
            vh = jnp.swapaxes(v, 1, 2)
            mask = jnp.ones((b, l), jnp.int32)
            attn = fused_attention_padded(qh.astype(self.dtype),
                                          kh.astype(self.dtype),
                                          vh.astype(self.dtype),
                                          None, mask)
            attn = jnp.swapaxes(attn, 1, 2).reshape(b, l, self.width)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            scores = scores / np.sqrt(d_head)
            if causal_mask is not None:
                scores = jnp.where(causal_mask[None, None], scores, -1e9)
            probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs,
                              v).reshape(b, l, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="attn_out")(attn)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(self.mlp_dim or 4 * self.width, dtype=self.dtype,
                     name="mlp_fc")(h)
        h = quick_gelu(h)
        return x + nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)


class CLIPImageEncoder(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: Array) -> Array:
        """pixels [B, H, W, 3] (normalized) -> [B, output_dim] features."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=dt, name="patch_embed")(pixels.astype(dt))
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.width,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None].astype(dt), (b, 1, cfg.width)), x],
            axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (x.shape[1], cfg.width), jnp.float32)
        x = x + pos[None].astype(dt)
        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = ResidualBlock(cfg.width, cfg.heads, dt, cfg.mlp_dim,
                              name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (cfg.width, cfg.output_dim), jnp.float32)
        return (x @ proj.astype(dt)).astype(jnp.float32)


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, tokens: Array, return_tokens: bool = False) -> Array:
        """tokens [B, L] -> pooled [B, output_dim]; with ``return_tokens``,
        per-token projected features [B, L, output_dim] (the Moment-DETR
        usage, model.py:94-107)."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.width), jnp.float32)
        x = emb[tokens].astype(dt)
        l = tokens.shape[1]
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width), jnp.float32)
        x = x + pos[None, :l].astype(dt)
        causal = jnp.tril(jnp.ones((l, l), bool))
        for i in range(cfg.layers):
            x = ResidualBlock(cfg.width, cfg.heads, dt, cfg.mlp_dim,
                              name=f"block_{i}")(x, causal_mask=causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ln_final")(x)
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (cfg.width, cfg.output_dim), jnp.float32)
        projected = (x @ proj.astype(dt)).astype(jnp.float32)
        if return_tokens:
            return projected
        eot = jnp.argmax(tokens, axis=-1)  # EOT token = highest id
        return jnp.take_along_axis(projected, eot[:, None, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------
# Weight import
# ---------------------------------------------------------------------------


def _t(x):
    return np.ascontiguousarray(np.asarray(x).T)


def convert_openai_clip_visual(sd: Mapping[str, np.ndarray],
                               prefix: str = "visual.") -> Dict[str, Any]:
    """OpenAI ``clip`` pip state_dict (visual tower) -> Flax params."""
    g = lambda k: np.asarray(sd[prefix + k], dtype=np.float32)
    p: Dict[str, Any] = {
        "class_embedding": g("class_embedding"),
        "positional_embedding": g("positional_embedding"),
        "proj": g("proj"),
        # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
        "patch_embed": {"kernel": np.transpose(g("conv1.weight"), (2, 3, 1, 0))},
        "ln_pre": {"scale": g("ln_pre.weight"), "bias": g("ln_pre.bias")},
        "ln_post": {"scale": g("ln_post.weight"), "bias": g("ln_post.bias")},
    }
    i = 0
    while f"{prefix}transformer.resblocks.{i}.ln_1.weight" in sd:
        rb = f"transformer.resblocks.{i}"
        p[f"block_{i}"] = {
            "ln_1": {"scale": g(f"{rb}.ln_1.weight"), "bias": g(f"{rb}.ln_1.bias")},
            "ln_2": {"scale": g(f"{rb}.ln_2.weight"), "bias": g(f"{rb}.ln_2.bias")},
            "attn_in": {"kernel": _t(g(f"{rb}.attn.in_proj_weight")),
                        "bias": g(f"{rb}.attn.in_proj_bias")},
            "attn_out": {"kernel": _t(g(f"{rb}.attn.out_proj.weight")),
                         "bias": g(f"{rb}.attn.out_proj.bias")},
            "mlp_fc": {"kernel": _t(g(f"{rb}.mlp.c_fc.weight")),
                       "bias": g(f"{rb}.mlp.c_fc.bias")},
            "mlp_proj": {"kernel": _t(g(f"{rb}.mlp.c_proj.weight")),
                         "bias": g(f"{rb}.mlp.c_proj.bias")},
        }
        i += 1
    return p


def convert_openai_clip_text(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    g = lambda k: np.asarray(sd[k], dtype=np.float32)
    p: Dict[str, Any] = {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
        "text_projection": g("text_projection"),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        rb = f"transformer.resblocks.{i}"
        p[f"block_{i}"] = {
            "ln_1": {"scale": g(f"{rb}.ln_1.weight"), "bias": g(f"{rb}.ln_1.bias")},
            "ln_2": {"scale": g(f"{rb}.ln_2.weight"), "bias": g(f"{rb}.ln_2.bias")},
            "attn_in": {"kernel": _t(g(f"{rb}.attn.in_proj_weight")),
                        "bias": g(f"{rb}.attn.in_proj_bias")},
            "attn_out": {"kernel": _t(g(f"{rb}.attn.out_proj.weight")),
                         "bias": g(f"{rb}.attn.out_proj.bias")},
            "mlp_fc": {"kernel": _t(g(f"{rb}.mlp.c_fc.weight")),
                       "bias": g(f"{rb}.mlp.c_fc.bias")},
            "mlp_proj": {"kernel": _t(g(f"{rb}.mlp.c_proj.weight")),
                         "bias": g(f"{rb}.mlp.c_proj.bias")},
        }
        i += 1
    return p


def convert_hf_clip_visual(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF ``transformers.CLIPModel`` vision tower -> Flax params."""
    g = lambda k: np.asarray(sd[k], dtype=np.float32)
    p: Dict[str, Any] = {
        "class_embedding": g("vision_model.embeddings.class_embedding"),
        "positional_embedding": g("vision_model.embeddings.position_embedding.weight"),
        "proj": _t(g("visual_projection.weight")),
        "patch_embed": {"kernel": np.transpose(
            g("vision_model.embeddings.patch_embedding.weight"), (2, 3, 1, 0))},
        "ln_pre": {"scale": g("vision_model.pre_layrnorm.weight"),
                   "bias": g("vision_model.pre_layrnorm.bias")},
        "ln_post": {"scale": g("vision_model.post_layernorm.weight"),
                    "bias": g("vision_model.post_layernorm.bias")},
    }
    i = 0
    while f"vision_model.encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"vision_model.encoder.layers.{i}"
        w = np.concatenate([g(f"{lp}.self_attn.q_proj.weight"),
                            g(f"{lp}.self_attn.k_proj.weight"),
                            g(f"{lp}.self_attn.v_proj.weight")], axis=0)
        b = np.concatenate([g(f"{lp}.self_attn.q_proj.bias"),
                            g(f"{lp}.self_attn.k_proj.bias"),
                            g(f"{lp}.self_attn.v_proj.bias")], axis=0)
        p[f"block_{i}"] = {
            "ln_1": {"scale": g(f"{lp}.layer_norm1.weight"),
                     "bias": g(f"{lp}.layer_norm1.bias")},
            "ln_2": {"scale": g(f"{lp}.layer_norm2.weight"),
                     "bias": g(f"{lp}.layer_norm2.bias")},
            "attn_in": {"kernel": _t(w), "bias": b},
            "attn_out": {"kernel": _t(g(f"{lp}.self_attn.out_proj.weight")),
                         "bias": g(f"{lp}.self_attn.out_proj.bias")},
            "mlp_fc": {"kernel": _t(g(f"{lp}.mlp.fc1.weight")),
                       "bias": g(f"{lp}.mlp.fc1.bias")},
            "mlp_proj": {"kernel": _t(g(f"{lp}.mlp.fc2.weight")),
                         "bias": g(f"{lp}.mlp.fc2.bias")},
        }
        i += 1
    return p


def convert_hf_clip_text(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF ``transformers.CLIPModel`` text tower -> Flax params (q/k/v are
    separate in HF; concatenated into the fused in-projection)."""
    g = lambda k: np.asarray(sd[k], dtype=np.float32)
    p: Dict[str, Any] = {
        "token_embedding": g("text_model.embeddings.token_embedding.weight"),
        "positional_embedding": g("text_model.embeddings.position_embedding.weight"),
        "text_projection": _t(g("text_projection.weight")),
        "ln_final": {"scale": g("text_model.final_layer_norm.weight"),
                     "bias": g("text_model.final_layer_norm.bias")},
    }
    i = 0
    while f"text_model.encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"text_model.encoder.layers.{i}"
        w = np.concatenate([g(f"{lp}.self_attn.q_proj.weight"),
                            g(f"{lp}.self_attn.k_proj.weight"),
                            g(f"{lp}.self_attn.v_proj.weight")], axis=0)
        b = np.concatenate([g(f"{lp}.self_attn.q_proj.bias"),
                            g(f"{lp}.self_attn.k_proj.bias"),
                            g(f"{lp}.self_attn.v_proj.bias")], axis=0)
        p[f"block_{i}"] = {
            "ln_1": {"scale": g(f"{lp}.layer_norm1.weight"),
                     "bias": g(f"{lp}.layer_norm1.bias")},
            "ln_2": {"scale": g(f"{lp}.layer_norm2.weight"),
                     "bias": g(f"{lp}.layer_norm2.bias")},
            "attn_in": {"kernel": _t(w), "bias": b},
            "attn_out": {"kernel": _t(g(f"{lp}.self_attn.out_proj.weight")),
                         "bias": g(f"{lp}.self_attn.out_proj.bias")},
            "mlp_fc": {"kernel": _t(g(f"{lp}.mlp.fc1.weight")),
                       "bias": g(f"{lp}.mlp.fc1.bias")},
            "mlp_proj": {"kernel": _t(g(f"{lp}.mlp.fc2.weight")),
                         "bias": g(f"{lp}.mlp.fc2.bias")},
        }
        i += 1
    return p
