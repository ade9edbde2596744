"""Whisper encoder-decoder in Flax — the TPU ASR path.

Replaces the reference's whisper/whisperx GPU inference (asr_extract/
whisper_inference.py:28-50, demo_asr.py:16-26) with a JAX model: log-mel
spectrogram -> 2x conv (GELU) -> sinusoidal-position transformer encoder;
text decoder with learned positions, causal self-attention + cross-attention
and tied output embeddings. The decoder exposes the same
``init_cache``/``decode_step`` API as models.t5, so the jit'd greedy/beam
loops in ops.decoding drive it unchanged.

Weight import from the HF ``transformers.WhisperForConditionalGeneration``
state_dict (parity-tested offline against random weights); OpenAI ``.pt``
checkpoints can be converted through HF's layout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
NEG_INF = -1e9


@dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    max_source_positions: int = 1500  # 30 s at 100 Hz, conv-stride 2
    max_target_positions: int = 448
    d_model: int = 1280
    encoder_layers: int = 32
    decoder_layers: int = 32
    num_heads: int = 20
    d_ff: int = 5120
    dtype: str = "bfloat16"


LARGE_V2 = WhisperConfig()
TINY = WhisperConfig(d_model=384, encoder_layers=4, decoder_layers=4,
                     num_heads=6, d_ff=1536)


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed audio position embedding."""
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)


class WhisperAttention(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        d = self.cfg.d_model
        dt = jnp.dtype(self.cfg.dtype)
        self.q = nn.Dense(d, dtype=dt, name="q")
        self.k = nn.Dense(d, use_bias=False, dtype=dt, name="k")
        self.v = nn.Dense(d, dtype=dt, name="v")
        self.out = nn.Dense(d, dtype=dt, name="out")

    def _split(self, x):
        b, l, _ = x.shape
        h = self.cfg.num_heads
        return x.reshape(b, l, h, self.cfg.d_model // h).transpose(0, 2, 1, 3)

    def _merge(self, x):
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    def __call__(self, hidden: Array, kv: Array, causal: bool = False,
                 key_mask: Optional[Array] = None,
                 cache: Optional[Dict[str, Array]] = None,
                 cache_index: Optional[Array] = None
                 ) -> Tuple[Array, Optional[Dict[str, Array]]]:
        d_head = self.cfg.d_model // self.cfg.num_heads
        q = self._split(self.q(hidden)) * (d_head ** -0.5)
        if cache is not None and "k" in cache and kv is hidden:
            k_new = self._split(self.k(hidden))
            v_new = self._split(self.v(hidden))
            k = jax.lax.dynamic_update_slice(cache["k"], k_new,
                                             (0, 0, cache_index, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v_new,
                                             (0, 0, cache_index, 0))
            cache = {"k": k, "v": v}
        elif cache is not None:
            k, v = cache["k"], cache["v"]
            if k.shape[0] != q.shape[0]:
                # beam decode with per-example cross KV shared across beams
                # (same grouping as models.t5): the encoder output is
                # beam-invariant, so neither duplicating the ~245 MB/example
                # large-v2 cross cache K-fold nor permuting it per step is
                # necessary
                b0 = k.shape[0]
                group = q.shape[0] // b0
                h = self.cfg.num_heads
                dh = d_head
                qg = q.reshape(b0, group, h, q.shape[2], dh)
                scores = jnp.einsum("bghqd,bhkd->bghqk", qg, k
                                    ).astype(jnp.float32)
                probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
                out = jnp.einsum("bghqk,bhkd->bghqd", probs, v)
                out = out.reshape(q.shape[0], h, q.shape[2], dh)
                return self.out(self._merge(out)), cache
        else:
            k = self._split(self.k(kv))
            v = self._split(self.v(kv))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        if causal and cache is None:
            l = hidden.shape[1]
            mask = jnp.tril(jnp.ones((l, l), bool))
            scores = jnp.where(mask[None, None], scores, NEG_INF)
        if cache is not None and cache_index is not None:
            pos = jnp.arange(k.shape[2])[None, None, None, :]
            scores = jnp.where(pos <= cache_index, scores, NEG_INF)
        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, None, :].astype(bool),
                               scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        self.sow("intermediates", "attn_probs", probs.astype(jnp.float32))
        return self.out(self._merge(out)), cache

    def precompute_kv(self, kv: Array) -> Dict[str, Array]:
        return {"k": self._split(self.k(kv)), "v": self._split(self.v(kv))}


class WhisperLayer(nn.Module):
    cfg: WhisperConfig
    is_decoder: bool

    def setup(self):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        self.self_attn_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt,
                                           name="self_attn_norm")
        self.self_attn = WhisperAttention(cfg, name="self_attn")
        if self.is_decoder:
            self.cross_attn_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt,
                                                name="cross_attn_norm")
            self.cross_attn = WhisperAttention(cfg, name="cross_attn")
        self.ff_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ff_norm")
        self.fc1 = nn.Dense(cfg.d_ff, dtype=dt, name="fc1")
        self.fc2 = nn.Dense(cfg.d_model, dtype=dt, name="fc2")

    def __call__(self, x: Array, enc_out: Optional[Array] = None,
                 cache: Optional[Dict[str, Any]] = None,
                 cache_index: Optional[Array] = None
                 ) -> Tuple[Array, Optional[Dict[str, Any]]]:
        new_cache: Dict[str, Any] = {}
        normed = self.self_attn_norm(x)
        h, self_kv = self.self_attn(
            normed, normed, causal=self.is_decoder,
            cache=None if cache is None else cache.get("self"),
            cache_index=cache_index)
        x = x + h
        if cache is not None:
            new_cache["self"] = self_kv
        has_cross_cache = cache is not None and "cross" in cache
        if self.is_decoder and (enc_out is not None or has_cross_cache):
            h, _ = self.cross_attn(
                self.cross_attn_norm(x), enc_out,
                cache=cache.get("cross") if has_cross_cache else None)
            x = x + h
            if cache is not None:
                new_cache["cross"] = cache.get("cross")
        h = self.fc2(jax.nn.gelu(self.fc1(self.ff_norm(x)), approximate=False))
        return x + h, (new_cache if cache is not None else None)


class WhisperEncoder(nn.Module):
    cfg: WhisperConfig

    @nn.compact
    def __call__(self, mel: Array) -> Array:
        """mel [B, num_mel_bins, 3000] -> [B, 1500, d_model]."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = jnp.swapaxes(mel, 1, 2).astype(dt)  # [B, T, mels]
        x = jax.nn.gelu(nn.Conv(cfg.d_model, (3,), padding=[(1, 1)], dtype=dt,
                                name="conv1")(x), approximate=False)
        x = jax.nn.gelu(nn.Conv(cfg.d_model, (3,), strides=(2,),
                                padding=[(1, 1)], dtype=dt,
                                name="conv2")(x), approximate=False)
        pos = jnp.asarray(sinusoids(cfg.max_source_positions, cfg.d_model),
                          dt)
        x = x + pos[None, : x.shape[1]]
        for i in range(cfg.encoder_layers):
            x, _ = WhisperLayer(cfg, is_decoder=False, name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ln_post")(x)


class WhisperDecoder(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.d_model,
                                     dtype=jnp.dtype(cfg.dtype),
                                     name="embed_tokens")
        self.embed_positions = self.param(
            "embed_positions", nn.initializers.normal(0.02),
            (cfg.max_target_positions, cfg.d_model), jnp.float32)
        self.layers = [WhisperLayer(cfg, is_decoder=True, name=f"layer_{i}")
                       for i in range(cfg.decoder_layers)]
        self.ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.dtype(cfg.dtype),
                               name="ln")

    def _logits(self, x: Array) -> Array:
        emb = self.embed_tokens.embedding
        return jnp.einsum("bld,vd->blv", x, emb.astype(x.dtype)).astype(
            jnp.float32)

    def __call__(self, tokens: Array, enc_out: Array) -> Array:
        dt = jnp.dtype(self.cfg.dtype)
        x = self.embed_tokens(tokens)
        x = x + self.embed_positions[None, : tokens.shape[1]].astype(dt)
        for layer in self.layers:
            x, _ = layer(x, enc_out=enc_out.astype(dt))
        return self._logits(self.ln(x))

    # ops.decoding cache API ---------------------------------------------

    def init_cache(self, batch: int, max_len: int, enc_out: Array
                   ) -> Dict[str, Any]:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        d_head = cfg.d_model // cfg.num_heads
        cache: Dict[str, Any] = {}
        for i, layer in enumerate(self.layers):
            cache[f"layer_{i}"] = {
                "self": {"k": jnp.zeros((batch, cfg.num_heads, max_len, d_head), dt),
                         "v": jnp.zeros((batch, cfg.num_heads, max_len, d_head), dt)},
                "cross": layer.cross_attn.precompute_kv(enc_out.astype(dt)),
            }
        return cache

    def decode_step(self, token_ids: Array, cache: Dict[str, Any],
                    cache_index: Array, enc_mask: Array, max_len: int
                    ) -> Tuple[Array, Dict[str, Any]]:
        del enc_mask  # Whisper attends to the full 1500-frame encoding
        dt = jnp.dtype(self.cfg.dtype)
        x = self.embed_tokens(token_ids[:, None])
        pos = jax.lax.dynamic_slice_in_dim(self.embed_positions, cache_index,
                                           1, axis=0)
        x = x + pos[None].astype(dt)
        new_cache: Dict[str, Any] = {}
        for i, layer in enumerate(self.layers):
            x, c = layer(x, cache=cache[f"layer_{i}"], cache_index=cache_index)
            new_cache[f"layer_{i}"] = c
        return self._logits(self.ln(x))[:, 0], new_cache


class Whisper(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        self.encoder = WhisperEncoder(self.cfg, name="encoder")
        self.decoder = WhisperDecoder(self.cfg, name="decoder")

    def encode(self, mel: Array) -> Array:
        return self.encoder(mel)

    def __call__(self, mel: Array, tokens: Array) -> Array:
        return self.decoder(tokens, self.encoder(mel))

    def init_cache(self, batch: int, max_len: int, enc_out: Array):
        return self.decoder.init_cache(batch, max_len, enc_out)

    def decode_step(self, token_ids, cache, cache_index, enc_mask, max_len):
        return self.decoder.decode_step(token_ids, cache, cache_index,
                                        enc_mask, max_len)


# ---------------------------------------------------------------------------
# HF weight import
# ---------------------------------------------------------------------------


def _t(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)


def _attn(sd, p):
    g = lambda k: np.asarray(sd[p + k], dtype=np.float32)
    return {
        "q": {"kernel": _t(g("q_proj.weight")), "bias": g("q_proj.bias")},
        "k": {"kernel": _t(g("k_proj.weight"))},
        "v": {"kernel": _t(g("v_proj.weight")), "bias": g("v_proj.bias")},
        "out": {"kernel": _t(g("out_proj.weight")), "bias": g("out_proj.bias")},
    }


def _ln(sd, p):
    return {"scale": np.asarray(sd[p + "weight"], np.float32),
            "bias": np.asarray(sd[p + "bias"], np.float32)}


def convert_hf_whisper(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF WhisperForConditionalGeneration (model.* prefix optional) -> params."""
    if any(k.startswith("model.") for k in sd):
        sd = {k.removeprefix("model."): v for k, v in sd.items()}
    g = lambda k: np.asarray(sd[k], dtype=np.float32)
    enc: Dict[str, Any] = {
        # torch conv1d [out, in, k] -> flax [k, in, out]
        "conv1": {"kernel": np.transpose(g("encoder.conv1.weight"), (2, 1, 0)),
                  "bias": g("encoder.conv1.bias")},
        "conv2": {"kernel": np.transpose(g("encoder.conv2.weight"), (2, 1, 0)),
                  "bias": g("encoder.conv2.bias")},
        "ln_post": _ln(sd, "encoder.layer_norm."),
    }
    i = 0
    while f"encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        lp = f"encoder.layers.{i}."
        enc[f"layer_{i}"] = {
            "self_attn": _attn(sd, lp + "self_attn."),
            "self_attn_norm": _ln(sd, lp + "self_attn_layer_norm."),
            "ff_norm": _ln(sd, lp + "final_layer_norm."),
            "fc1": {"kernel": _t(g(lp + "fc1.weight")), "bias": g(lp + "fc1.bias")},
            "fc2": {"kernel": _t(g(lp + "fc2.weight")), "bias": g(lp + "fc2.bias")},
        }
        i += 1
    dec: Dict[str, Any] = {
        "embed_tokens": {"embedding": g("decoder.embed_tokens.weight")},
        "embed_positions": g("decoder.embed_positions.weight"),
        "ln": _ln(sd, "decoder.layer_norm."),
    }
    i = 0
    while f"decoder.layers.{i}.self_attn.q_proj.weight" in sd:
        lp = f"decoder.layers.{i}."
        dec[f"layer_{i}"] = {
            "self_attn": _attn(sd, lp + "self_attn."),
            "self_attn_norm": _ln(sd, lp + "self_attn_layer_norm."),
            "cross_attn": _attn(sd, lp + "encoder_attn."),
            "cross_attn_norm": _ln(sd, lp + "encoder_attn_layer_norm."),
            "ff_norm": _ln(sd, lp + "final_layer_norm."),
            "fc1": {"kernel": _t(g(lp + "fc1.weight")), "bias": g(lp + "fc1.bias")},
            "fc2": {"kernel": _t(g(lp + "fc2.weight")), "bias": g(lp + "fc2.bias")},
        }
        i += 1
    return {"encoder": enc, "decoder": dec}


def load_hf_whisper(name_or_path: str):
    """HF WhisperForConditionalGeneration checkpoint -> (Whisper, params).

    The demo/factory ASR entry (reference demo_asr.py:16 loads whisper
    large-v2); weights come from the local HF cache — no downloads here.
    """
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf = WhisperForConditionalGeneration.from_pretrained(name_or_path)
    c: HFConfig = hf.config
    cfg = WhisperConfig(
        vocab_size=c.vocab_size, num_mel_bins=c.num_mel_bins,
        max_source_positions=c.max_source_positions,
        max_target_positions=c.max_target_positions,
        d_model=c.d_model, encoder_layers=c.encoder_layers,
        decoder_layers=c.decoder_layers,
        num_heads=c.encoder_attention_heads, d_ff=c.encoder_ffn_dim)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    return Whisper(cfg), convert_hf_whisper(sd)

