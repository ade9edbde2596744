"""LLaMA decoder-only LM in Flax — the zero-shot speech-VCG titler.

The reference loads ``LlamaForCausalLM`` (LLaMA-7B) and greedily generates a
chapter title per TextTiling segment with the prompt at
zs_speechvcg.py:190-199 (``max_new_tokens=20``, batched, left-padded with the
``<s>`` token reused as pad, zs_speechvcg.py:131-133); vc.py:275-279 uses the
same model for GT-boundary chapter titling.  This module implements the
architecture from scratch (RMSNorm, rotary position embeddings, SwiGLU MLP,
optional grouped-query attention, untied LM head) with an HF state_dict
converter and a static-shape KV-cached batched greedy decoder that jits to a
single XLA program (prefill + ``lax.scan`` over steps).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
NEG_INF = -1e9


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32  # < num_heads => grouped-query attention
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    bos_id: int = 1
    eos_id: int = 2
    dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


LLAMA_7B = LlamaConfig()


def _rms_norm(x: Array, scale: Array, eps: float) -> Array:
    # HF LlamaRMSNorm: variance in fp32, scale applied in input dtype.
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale.astype(x.dtype)


def rope_cos_sin(positions: Array, head_dim: int, theta: float
                 ) -> Tuple[Array, Array]:
    """positions [B, L] -> (cos, sin) each [B, L, head_dim] (HF half-split
    convention: frequencies duplicated across the two halves)."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32)
                           / head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv  # [B, L, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """x [B, L, H, d]; rotate_half([a, b]) = [-b, a] (HF convention)."""
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    x1, x2 = jnp.split(x, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * c + rotated * s


class LlamaLayer(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x: Array, cos: Array, sin: Array, mask_bias: Array,
                 cache: Optional[Dict[str, Array]] = None,
                 cache_index: Optional[Array] = None
                 ) -> Tuple[Array, Optional[Dict[str, Array]]]:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        b, l, _ = x.shape
        d = cfg.head_dim
        h = _rms_norm(x, self.param("input_norm", nn.initializers.ones,
                                    (cfg.hidden_size,), jnp.float32),
                      cfg.rms_norm_eps)
        q = nn.Dense(cfg.num_heads * d, use_bias=False, dtype=dt,
                     name="q_proj")(h).reshape(b, l, cfg.num_heads, d)
        k = nn.Dense(cfg.num_kv_heads * d, use_bias=False, dtype=dt,
                     name="k_proj")(h).reshape(b, l, cfg.num_kv_heads, d)
        v = nn.Dense(cfg.num_kv_heads * d, use_bias=False, dtype=dt,
                     name="v_proj")(h).reshape(b, l, cfg.num_kv_heads, d)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if cache is not None:
            k = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, cache_index, 0, 0))
            v = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, cache_index, 0, 0))
            cache = {"k": k, "v": v}

        if cfg.num_kv_heads != cfg.num_heads:
            rep = cfg.num_heads // cfg.num_kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores / np.sqrt(d) + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(dt))
        attn = attn.reshape(b, l, cfg.num_heads * d)
        x = x + nn.Dense(cfg.hidden_size, use_bias=False, dtype=dt,
                         name="o_proj")(attn)

        h = _rms_norm(x, self.param("post_attn_norm", nn.initializers.ones,
                                    (cfg.hidden_size,), jnp.float32),
                      cfg.rms_norm_eps)
        gate = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=dt,
                        name="gate_proj")(h)
        up = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=dt,
                      name="up_proj")(h)
        down = nn.Dense(cfg.hidden_size, use_bias=False, dtype=dt,
                        name="down_proj")(jax.nn.silu(gate) * up)
        return x + down, cache


class LlamaForCausalLM(nn.Module):
    """Returns logits [B, L, V] (+ updated cache when one is passed).

    Without a cache: plain causal self-attention over the padded prompt
    (pad key columns masked via ``attn_mask``).  With a cache: the ``l``
    input tokens are written at slots ``cache_index..cache_index+l-1`` of a
    static-size cache and queries attend over all written-and-valid slots —
    the same code path serves prefill (l = prompt length, cache_index = 0)
    and single-token decode steps.
    """

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, input_ids: Array,
                 attn_mask: Optional[Array] = None,
                 position_ids: Optional[Array] = None,
                 cache: Optional[Dict[str, Dict[str, Array]]] = None,
                 cache_index: Optional[Array] = None,
                 kv_pad_mask: Optional[Array] = None):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        b, l = input_ids.shape
        embed = self.param("embed_tokens", nn.initializers.normal(0.02),
                           (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        x = jnp.asarray(embed)[input_ids].astype(dt)

        if attn_mask is None:
            attn_mask = jnp.ones((b, l), jnp.int32)
        if position_ids is None:
            position_ids = jnp.clip(jnp.cumsum(attn_mask, axis=1) - 1, 0, None)
        cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)

        if cache is None:
            # [B, 1, Lq, Lk] additive bias: causal AND key-not-pad
            causal = jnp.tril(jnp.ones((l, l), bool))
            ok = causal[None] & attn_mask[:, None, :].astype(bool)
            mask_bias = jnp.where(ok[:, None], 0.0, NEG_INF)
        else:
            c = cache["layer_0"]["k"].shape[1]
            key_slot = jnp.arange(c)
            q_slot = cache_index + jnp.arange(l)
            causal = key_slot[None, :] <= q_slot[:, None]          # [Lq, C]
            if kv_pad_mask is None:
                kv_pad_mask = jnp.ones((b, c), jnp.int32)
            ok = causal[None] & kv_pad_mask[:, None, :].astype(bool)
            mask_bias = jnp.where(ok[:, None], 0.0, NEG_INF)

        new_cache = {} if cache is not None else None
        for i in range(cfg.num_layers):
            layer_cache = cache[f"layer_{i}"] if cache is not None else None
            x, updated = LlamaLayer(cfg, name=f"layer_{i}")(
                x, cos, sin, mask_bias, layer_cache, cache_index)
            if new_cache is not None:
                new_cache[f"layer_{i}"] = updated
        x = _rms_norm(x, self.param("final_norm", nn.initializers.ones,
                                    (cfg.hidden_size,), jnp.float32),
                      cfg.rms_norm_eps)
        lm_head = self.param("lm_head", nn.initializers.normal(0.02),
                             (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        logits = jnp.einsum("bld,vd->blv", x, jnp.asarray(lm_head).astype(dt))
        logits = logits.astype(jnp.float32)
        if cache is None:
            return logits
        return logits, new_cache


def init_cache(cfg: LlamaConfig, batch: int, max_len: int,
               dtype: Optional[str] = None) -> Dict[str, Dict[str, Array]]:
    dt = jnp.dtype(dtype or cfg.dtype)
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {f"layer_{i}": {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}
            for i in range(cfg.num_layers)}


def llama_greedy_generate(model: LlamaForCausalLM, params,
                          input_ids: Array, attn_mask: Array,
                          max_new_tokens: int) -> Array:
    """Batched greedy continuation of left-padded prompts (the reference's
    ``model.generate(input_ids, max_new_tokens=20)`` at zs_speechvcg.py:199).

    input_ids/attn_mask: [B, P] with pads on the LEFT.  Returns [B, T] new
    tokens; positions after the first EOS are filled with EOS.
    """
    cfg = model.cfg
    b, p = input_ids.shape
    total = p + max_new_tokens
    cache = init_cache(cfg, b, total)

    positions = jnp.clip(jnp.cumsum(attn_mask, axis=1) - 1, 0, None)
    n_real = attn_mask.sum(axis=1)  # [B]
    kv_pad = jnp.concatenate(
        [attn_mask, jnp.ones((b, max_new_tokens), attn_mask.dtype)], axis=1)

    logits, cache = model.apply(
        {"params": params}, input_ids, attn_mask=attn_mask,
        position_ids=positions, cache=cache,
        cache_index=jnp.asarray(0), kv_pad_mask=kv_pad)
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    done0 = first == cfg.eos_id

    def body(carry, t):
        tok, done, cache = carry
        pos = (n_real + t)[:, None]
        logits, cache = model.apply(
            {"params": params}, tok[:, None],
            attn_mask=jnp.ones((b, 1), jnp.int32), position_ids=pos,
            cache=cache, cache_index=p + t, kv_pad_mask=kv_pad)
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.eos_id, nxt)
        return (nxt, done | (nxt == cfg.eos_id), cache), nxt

    if max_new_tokens == 1:
        return first[:, None]
    (_, _, _), toks = jax.lax.scan(
        body, (first, done0, cache), jnp.arange(max_new_tokens - 1))
    return jnp.concatenate([first[:, None], toks.T], axis=1)


def convert_hf_llama(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF ``LlamaForCausalLM`` state_dict -> Flax params (torch Linear
    weights are [out, in] -> transpose to Flax kernels)."""
    if any(k.startswith("model.model.") for k in sd):
        sd = {k.removeprefix("model."): v for k, v in sd.items()}
    g = lambda k: np.asarray(sd[k], dtype=np.float32)
    t = lambda k: np.ascontiguousarray(g(k).T)
    p: Dict[str, Any] = {
        "embed_tokens": g("model.embed_tokens.weight"),
        "final_norm": g("model.norm.weight"),
        "lm_head": g("lm_head.weight"),
    }
    i = 0
    while f"model.layers.{i}.input_layernorm.weight" in sd:
        lp = f"model.layers.{i}."
        p[f"layer_{i}"] = {
            "input_norm": g(lp + "input_layernorm.weight"),
            "post_attn_norm": g(lp + "post_attention_layernorm.weight"),
            "q_proj": {"kernel": t(lp + "self_attn.q_proj.weight")},
            "k_proj": {"kernel": t(lp + "self_attn.k_proj.weight")},
            "v_proj": {"kernel": t(lp + "self_attn.v_proj.weight")},
            "o_proj": {"kernel": t(lp + "self_attn.o_proj.weight")},
            "gate_proj": {"kernel": t(lp + "mlp.gate_proj.weight")},
            "up_proj": {"kernel": t(lp + "mlp.up_proj.weight")},
            "down_proj": {"kernel": t(lp + "mlp.down_proj.weight")},
        }
        i += 1
    return p


def build_llama_titler(model_dir: str, max_new_tokens: int = 20,
                       batch_size: int = 8, max_length: int = 512):
    """Executable end-to-end path for ``make_llm_titler``: load an HF LLaMA
    checkpoint directory (tokenizer + torch weights) into the Flax model and
    return ``generate_fn(prompt) -> str`` (zs_speechvcg.py:150-200 semantics:
    left pad with ``<s>``, truncate at ``max_length``, greedy 20 tokens)."""
    import torch
    from transformers import AutoConfig, LlamaTokenizer

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    tok = LlamaTokenizer.from_pretrained(model_dir)
    tok.pad_token = "<s>"
    tok.padding_side = "left"
    cfg = LlamaConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        num_kv_heads=getattr(hf_cfg, "num_key_value_heads",
                             hf_cfg.num_attention_heads),
        max_position_embeddings=hf_cfg.max_position_embeddings,
        rms_norm_eps=hf_cfg.rms_norm_eps,
        rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
        bos_id=hf_cfg.bos_token_id, eos_id=hf_cfg.eos_token_id,
        dtype="bfloat16")
    from transformers import LlamaForCausalLM as HFLlama

    hf = HFLlama.from_pretrained(model_dir, torch_dtype=torch.float32)
    params = convert_hf_llama({k: v.numpy() for k, v in
                               hf.state_dict().items()})
    del hf
    model = LlamaForCausalLM(cfg)
    gen = jax.jit(lambda ids, mask: llama_greedy_generate(
        model, params, ids, mask, max_new_tokens))

    def generate_fn(prompt: str) -> str:
        enc = tok([prompt], padding="max_length", truncation=True,
                  max_length=max_length, return_tensors="np")
        toks = np.asarray(gen(jnp.asarray(enc["input_ids"], jnp.int32),
                              jnp.asarray(enc["attention_mask"], jnp.int32)))
        return tok.decode(toks[0], skip_special_tokens=True)

    return generate_fn
