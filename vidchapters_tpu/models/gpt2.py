"""GPT-2 language model in Flax — PDVC's 'gpt2' caption-head option.

The reference can swap its LSTM captioner for HF GPT-2 conditioned on a
projected event-query prefix (PDVC/pdvc/pdvc.py:56-57, 414-427:
``inputs_embeds = [query2cap(event); wte(seq)]`` with -100 on the prefix
label). This module implements GPT-2 from scratch (LayerNorm-pre blocks,
fused qkv, tanh-GELU MLP, tied LM head) with an HF weight converter, plus
the prefix-conditioned caption loss / greedy sampling used by PDVC.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
NEG_INF = -1e9


@dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    dtype: str = "float32"


class GPT2Block(nn.Module):
    cfg: GPT2Config

    @nn.compact
    def __call__(self, x: Array, attn_mask: Optional[Array] = None) -> Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        b, l, _ = x.shape
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=dt,
                         name="ln_1")(x)
        qkv = nn.Dense(3 * cfg.n_embd, dtype=dt, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d_head = cfg.n_embd // cfg.n_head
        q = q.reshape(b, l, cfg.n_head, d_head)
        k = k.reshape(b, l, cfg.n_head, d_head)
        v = v.reshape(b, l, cfg.n_head, d_head)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores / np.sqrt(d_head)
        causal = jnp.tril(jnp.ones((l, l), bool))
        scores = jnp.where(causal[None, None], scores, NEG_INF)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None, None, :].astype(bool),
                               scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, cfg.n_embd)
        x = x + nn.Dense(cfg.n_embd, dtype=dt, name="c_proj")(attn)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=dt,
                         name="ln_2")(x)
        h = nn.Dense(4 * cfg.n_embd, dtype=dt, name="mlp_fc")(h)
        h = jax.nn.gelu(h, approximate=True)  # GPT-2 uses gelu_new
        return x + nn.Dense(cfg.n_embd, dtype=dt, name="mlp_proj")(h)


class GPT2(nn.Module):
    cfg: GPT2Config

    @nn.compact
    def __call__(self, inputs_embeds: Optional[Array] = None,
                 attn_mask: Optional[Array] = None,
                 position_offset: int = 0,
                 tokens: Optional[Array] = None,
                 prefix_embeds: Optional[Array] = None) -> Array:
        """inputs_embeds [B, L, D] -> logits [B, L, V] (tied head).

        Alternatively pass ``tokens`` [B, T] (+ optional ``prefix_embeds``
        [B, P, D] prepended) and the embed happens here with the tied wte —
        the prefix-conditioned form PDVC's gpt2 caption head uses
        (PDVC/pdvc/pdvc.py:413-416)."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        wte = self.param("wte", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.n_embd), jnp.float32)
        wpe = self.param("wpe", nn.initializers.normal(0.01),
                         (cfg.n_positions, cfg.n_embd), jnp.float32)
        if tokens is not None:
            tok = wte[tokens]
            inputs_embeds = (tok if prefix_embeds is None else
                             jnp.concatenate(
                                 [prefix_embeds.astype(tok.dtype), tok],
                                 axis=1))
        l = inputs_embeds.shape[1]
        x = inputs_embeds.astype(dt) + wpe[None,
                                           position_offset:position_offset + l].astype(dt)
        for i in range(cfg.n_layer):
            x = GPT2Block(cfg, name=f"block_{i}")(x, attn_mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=dt,
                         name="ln_f")(x)
        return jnp.einsum("bld,vd->blv", x, wte.astype(dt)).astype(jnp.float32)

    def embed(self, tokens: Array) -> Array:
        wte = self.get_variable("params", "wte")
        return jnp.asarray(wte)[tokens]


def gpt2_caption_loss(model: GPT2, params, prefix_embeds: Array, seq: Array,
                      pad_id: int = 0) -> Array:
    """Prefix-conditioned caption NLL (pdvc.py:414-427): inputs =
    [prefix ; wte(seq)], labels = [-100 ; seq with pad masked]."""
    wte = params["wte"]
    tok_embeds = jnp.asarray(wte)[seq]
    inputs = jnp.concatenate([prefix_embeds, tok_embeds], axis=1)
    logits = model.apply({"params": params}, inputs)
    p = prefix_embeds.shape[1]
    # next-token prediction: logits at position i predict token i+1
    shift_logits = logits[:, p - 1: -1]
    labels = jnp.where(seq == pad_id, -100, seq)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    mask = labels != -100
    safe = jnp.where(mask, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.where(mask, nll, 0.0).sum() / jnp.maximum(mask.sum(), 1)


def gpt2_greedy_sample(model: GPT2, params, prefix_embeds: Array,
                       max_len: int, eos_id: int = 50256) -> Array:
    """Greedy continuation after the prefix (eval path, pdvc.py gpt2)."""
    wte = jnp.asarray(params["wte"])
    b, p, d = prefix_embeds.shape

    def body(carry, _):
        embeds, length, done = carry
        logits = model.apply({"params": params}, embeds)
        last = jax.lax.dynamic_slice_in_dim(logits, length - 1, 1,
                                            axis=1)[:, 0]
        nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, nxt)
        done = done | (nxt == eos_id)
        embeds = jax.lax.dynamic_update_slice(
            embeds, wte[nxt][:, None].astype(embeds.dtype), (0, length, 0))
        return (embeds, length + 1, done), nxt

    total = p + max_len
    embeds0 = jnp.zeros((b, total, d), prefix_embeds.dtype)
    embeds0 = embeds0.at[:, :p].set(prefix_embeds)
    init = (embeds0, jnp.asarray(p), jnp.zeros(b, bool))
    _, toks = jax.lax.scan(body, init, None, length=max_len)
    return toks.T  # [B, max_len]


def convert_hf_gpt2(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF GPT2Model/GPT2LMHeadModel state_dict -> Flax params. HF stores
    Conv1D weights as [in, out], which is already Flax kernel layout."""
    if any(k.startswith("transformer.") for k in sd):
        sd = {k.removeprefix("transformer."): v for k, v in sd.items()}
    g = lambda k: np.asarray(sd[k], dtype=np.float32)
    p: Dict[str, Any] = {
        "wte": g("wte.weight"),
        "wpe": g("wpe.weight"),
        "ln_f": {"scale": g("ln_f.weight"), "bias": g("ln_f.bias")},
    }
    i = 0
    while f"h.{i}.ln_1.weight" in sd:
        lp = f"h.{i}."
        p[f"block_{i}"] = {
            "ln_1": {"scale": g(lp + "ln_1.weight"), "bias": g(lp + "ln_1.bias")},
            "ln_2": {"scale": g(lp + "ln_2.weight"), "bias": g(lp + "ln_2.bias")},
            "c_attn": {"kernel": g(lp + "attn.c_attn.weight"),
                       "bias": g(lp + "attn.c_attn.bias")},
            "c_proj": {"kernel": g(lp + "attn.c_proj.weight"),
                       "bias": g(lp + "attn.c_proj.bias")},
            "mlp_fc": {"kernel": g(lp + "mlp.c_fc.weight"),
                       "bias": g(lp + "mlp.c_fc.bias")},
            "mlp_proj": {"kernel": g(lp + "mlp.c_proj.weight"),
                         "bias": g(lp + "mlp.c_proj.bias")},
        }
        i += 1
    return p
