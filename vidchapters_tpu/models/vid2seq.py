"""Vid2Seq: temporal ViT + T5, fused by sequence concatenation.

Flax counterpart of model/vid2seq.py:20-167 — the visual encoder output is
concatenated in front of the T5-encoded ASR hidden states (vid2seq.py:77-79),
with ``use_video`` / ``use_speech`` ablations (80-84), label-smoothed CE
training loss on time+text output sequences, and cached-KV generation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidchapters_tpu.config import Vid2SeqConfig
from vidchapters_tpu.models.t5 import (
    SEQ_PAD_BLOCK,
    T5ForConditionalGeneration,
    label_smoothed_cross_entropy,
    shift_right,
)
from vidchapters_tpu.models.vit import TemporalViT

Array = jax.Array


class Vid2Seq(nn.Module):
    cfg: Vid2SeqConfig

    def setup(self):
        self.t5 = T5ForConditionalGeneration(self.cfg.t5, name="t5")
        if self.cfg.use_video:
            self.visual_encoder = TemporalViT(self.cfg.vit, name="visual_encoder")
            if self.cfg.t5.d_model != self.cfg.vit.embed_dim:
                self.proj_v2t = nn.Dense(self.cfg.t5.d_model, name="proj_v2t")

    def encode_video(self, video: Array, deterministic: bool = True) -> Array:
        feats = self.visual_encoder(video, deterministic=deterministic)
        if self.cfg.t5.d_model != self.cfg.vit.embed_dim:
            feats = self.proj_v2t(feats)
        return feats

    def encode(self, video: Optional[Array], input_ids: Optional[Array],
               attention_mask: Optional[Array],
               deterministic: bool = True,
               video_embeds: Optional[Array] = None,
               ) -> Tuple[Array, Array]:
        """Fused encoder states + mask; ``video_embeds`` short-circuits the
        visual tower (the denoising second forward reuses it, dvc.py:78-100)."""
        cfg = self.cfg
        parts, masks = [], []
        if cfg.use_video:
            v = video_embeds if video_embeds is not None else self.encode_video(
                video, deterministic=deterministic)
            parts.append(v)
            masks.append(jnp.ones(v.shape[:2], jnp.int32))
        if cfg.use_speech:
            enc = self.t5.encode(input_ids=input_ids, attention_mask=attention_mask,
                                 deterministic=deterministic)
            parts.append(enc)
            masks.append(attention_mask.astype(jnp.int32))
        enc_out = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        enc_mask = jnp.concatenate(masks, axis=1) if len(masks) > 1 else masks[0]
        # Pad the fused states to the attention block quantum once so the
        # decoder's cross-attention never pads K/V per layer (12 layers x
        # fwd+bwd x 2 passes at the reference recipe's 1100-token fusion).
        # Padded keys carry mask 0 — consumers are mask-correct by contract.
        l = enc_out.shape[1]
        lp = -(-l // SEQ_PAD_BLOCK) * SEQ_PAD_BLOCK
        if lp != l:
            enc_out = jnp.pad(enc_out, ((0, 0), (0, lp - l), (0, 0)))
            enc_mask = jnp.pad(enc_mask, ((0, 0), (0, lp - l)))
        return enc_out, enc_mask

    def __call__(self, video: Optional[Array], input_ids: Optional[Array],
                 attention_mask: Optional[Array], labels: Array,
                 deterministic: bool = True,
                 video_embeds: Optional[Array] = None,
                 ) -> Dict[str, Array]:
        """Training forward: returns {"loss", "video_embeds"}.

        ``labels`` are output token ids with 0-padding; pad positions are
        ignored in the loss (vid2seq.py:86-88 masked_fill to -100).
        """
        enc_out, enc_mask = self.encode(video, input_ids, attention_mask,
                                        deterministic, video_embeds)
        targets = jnp.where(labels == 0, -100, labels)
        decoder_input_ids = shift_right(labels)
        decoder_mask = (labels != 0).astype(jnp.int32)
        logits = self.t5.decode(decoder_input_ids, decoder_mask, enc_out, enc_mask,
                                deterministic=deterministic)
        loss = label_smoothed_cross_entropy(
            logits, targets, self.cfg.t5.label_smoothing)
        out = {"loss": loss}
        if self.cfg.use_video:
            out["video_embeds"] = (video_embeds if video_embeds is not None
                                   else enc_out[:, : video.shape[1]])
        return out

    # ----- generation support (driven by ops.decoding) -----

    def encode_for_generation(self, video: Optional[Array],
                              input_ids: Optional[Array],
                              attention_mask: Optional[Array]
                              ) -> Tuple[Array, Array]:
        return self.encode(video, input_ids, attention_mask, deterministic=True)

    def init_cache(self, batch: int, max_len: int, enc_out: Array) -> Dict[str, Any]:
        return self.t5.init_cache(batch, max_len, enc_out)

    def decode_step(self, token_ids: Array, cache: Dict[str, Any], cache_index: Array,
                    enc_mask: Array, max_len: int) -> Tuple[Array, Dict[str, Any]]:
        return self.t5.decode_step(token_ids, cache, cache_index, enc_mask, max_len)


def build_vid2seq_model(cfg: Vid2SeqConfig) -> Vid2Seq:
    """Factory mirroring model/__init__.py:4-19."""
    return Vid2Seq(cfg)
