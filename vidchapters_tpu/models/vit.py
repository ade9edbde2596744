"""Temporal visual transformer over per-frame CLIP features.

Flax counterpart of the reference's 12-layer frame-level transformer
(model/vit.py:79-133): learned temporal position embedding (nearest-neighbor
interpolated on length mismatch, vit.py:117-125), pre-norm blocks with
standard scaled attention + GELU MLP, final LayerNorm. No patchify — inputs
are already CLIP features [B, T, 768].
"""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp

from vidchapters_tpu.config import TemporalViTConfig

Array = jax.Array


class ViTAttention(nn.Module):
    cfg: TemporalViTConfig

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        b, n, c = x.shape
        head_dim = cfg.embed_dim // cfg.num_heads
        qkv = nn.Dense(3 * cfg.embed_dim, use_bias=cfg.qkv_bias, dtype=dt, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, cfg.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * (head_dim ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        probs = nn.Dropout(cfg.attn_drop_rate, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, c)
        out = nn.Dense(cfg.embed_dim, dtype=dt, name="proj")(out)
        return nn.Dropout(cfg.drop_rate, deterministic=deterministic)(out)


class ViTBlock(nn.Module):
    cfg: TemporalViTConfig

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm1")(x)
        x = x + ViTAttention(cfg, name="attn")(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm2")(x)
        h = nn.Dense(cfg.mlp_dim, dtype=dt, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(cfg.drop_rate, deterministic=deterministic)(h)
        h = nn.Dense(cfg.embed_dim, dtype=dt, name="fc2")(h)
        h = nn.Dropout(cfg.drop_rate, deterministic=deterministic)(h)
        return x + h


class TemporalViT(nn.Module):
    cfg: TemporalViTConfig

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = x.astype(dt)
        pos = self.param("pos_embed",
                         nn.initializers.truncated_normal(0.02),
                         (1, cfg.num_features, cfg.embed_dim), jnp.float32)
        t = x.shape[1]
        if t != cfg.num_features:
            # nearest interpolation along time (vit.py:117-125)
            idx = (jnp.arange(t) * cfg.num_features) // t
            pos_t = pos[:, idx]
        else:
            pos_t = pos
        x = x + pos_t.astype(dt)
        x = nn.Dropout(cfg.drop_rate, deterministic=deterministic)(x)
        if cfg.scan_layers:
            # layer-stacked [depth, ...] params (see T5Config.scan_layers)
            def body(blk, h):
                return blk(h, deterministic), None

            x, _ = nn.scan(
                body, variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.depth)(ViTBlock(cfg, name="blocks"), x)
        else:
            for i in range(cfg.depth):
                x = ViTBlock(cfg, name=f"block_{i}")(x, deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm")(x)
