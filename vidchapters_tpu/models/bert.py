"""BERT encoder in Flax (bert-base-uncased architecture).

Backs the reference's two BERT uses: the optional speech branch in
Moment-DETR (moment_detr/moment_detr/model.py:46-52,131-139 — last hidden
states projected into the transformer input) and the zero-shot BERT
grounding baseline (zs_vcgr.py:268-282 — CLS embeddings of queries vs ASR
lines). Weight import from the HF ``transformers.BertModel`` state_dict;
parity-tested offline against random weights.
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
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: str = "float32"


BERT_BASE = BertConfig()


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        h = cfg.num_heads
        d_head = cfg.hidden_size // h
        b, l, _ = x.shape
        q = nn.Dense(cfg.hidden_size, dtype=dt, name="q")(x).reshape(b, l, h, d_head)
        k = nn.Dense(cfg.hidden_size, dtype=dt, name="k")(x).reshape(b, l, h, d_head)
        v = nn.Dense(cfg.hidden_size, dtype=dt, name="v")(x).reshape(b, l, h, d_head)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d_head)
        scores = scores + (1.0 - mask.astype(jnp.float32))[:, None, None, :] * NEG_INF
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, cfg.hidden_size)
        attn = nn.Dense(cfg.hidden_size, dtype=dt, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                         name="attn_norm")(x + attn)
        hmid = nn.Dense(cfg.intermediate_size, dtype=dt, name="ff1")(x)
        hmid = jax.nn.gelu(hmid, approximate=False)
        out = nn.Dense(cfg.hidden_size, dtype=dt, name="ff2")(hmid)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                            name="ff_norm")(x + out)


class BertModel(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids: Array,
                 attention_mask: Optional[Array] = None,
                 token_type_ids: Optional[Array] = None) -> Array:
        """-> last hidden states [B, L, D] (CLS pooling is ``out[:, 0]``)."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        word = self.param("word_embeddings", nn.initializers.normal(0.02),
                          (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         jnp.float32)
        typ = self.param("token_type_embeddings", nn.initializers.normal(0.02),
                         (cfg.type_vocab_size, cfg.hidden_size), jnp.float32)
        l = input_ids.shape[1]
        x = (word[input_ids] + pos[None, :l] + typ[token_type_ids]).astype(dt)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                         name="embed_norm")(x)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(x, attention_mask)
        return x


def _t(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)


def convert_hf_bert(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF BertModel state_dict -> Flax params (pooler not used)."""
    g = lambda k: np.asarray(sd[k], dtype=np.float32)
    p: Dict[str, Any] = {
        "word_embeddings": g("embeddings.word_embeddings.weight"),
        "position_embeddings": g("embeddings.position_embeddings.weight"),
        "token_type_embeddings": g("embeddings.token_type_embeddings.weight"),
        "embed_norm": {"scale": g("embeddings.LayerNorm.weight"),
                       "bias": g("embeddings.LayerNorm.bias")},
    }
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        lp = f"encoder.layer.{i}."
        p[f"layer_{i}"] = {
            "q": {"kernel": _t(g(lp + "attention.self.query.weight")),
                  "bias": g(lp + "attention.self.query.bias")},
            "k": {"kernel": _t(g(lp + "attention.self.key.weight")),
                  "bias": g(lp + "attention.self.key.bias")},
            "v": {"kernel": _t(g(lp + "attention.self.value.weight")),
                  "bias": g(lp + "attention.self.value.bias")},
            "attn_out": {"kernel": _t(g(lp + "attention.output.dense.weight")),
                         "bias": g(lp + "attention.output.dense.bias")},
            "attn_norm": {"scale": g(lp + "attention.output.LayerNorm.weight"),
                          "bias": g(lp + "attention.output.LayerNorm.bias")},
            "ff1": {"kernel": _t(g(lp + "intermediate.dense.weight")),
                    "bias": g(lp + "intermediate.dense.bias")},
            "ff2": {"kernel": _t(g(lp + "output.dense.weight")),
                    "bias": g(lp + "output.dense.bias")},
            "ff_norm": {"scale": g(lp + "output.LayerNorm.weight"),
                        "bias": g(lp + "output.LayerNorm.bias")},
        }
        i += 1
    return p
