"""T5 encoder-decoder in Flax, numerically matching the reference's fork.

The reference vendors HF 4.28 T5 with per-stack dropout overrides and
label-smoothed CE (model/modeling_t5.py:1497-1760). This is a from-scratch
Flax implementation of the same math, TPU-first:

- RMSNorm ("T5LayerNorm", modeling_t5.py:254) computed in float32;
- relative attention bias on the first self-attention layer of each stack,
  shared by later layers (modeling_t5.py:357-589); no cross-attention bias;
- unscaled attention (T5 folds 1/sqrt(d_kv) into initialization);
- ReLU (t5-base) or gated-GELU (t5-v1_1) feed-forward (modeling_t5.py:314-342);
- tied embeddings with ``d_model**-0.5`` logit rescale (modeling_t5.py:1710-1712);
- label-smoothed cross-entropy with -100 ignore positions (modeling_t5.py:1721).

Decode-time KV caching is explicit: ``decode_step`` consumes and returns a
cache pytree of static shape so the whole autoregressive loop stays inside
one jit (no HF-style dynamic shapes).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vidchapters_tpu.config import T5Config

Array = jax.Array

NEG_INF = -1e9  # large-negative additive mask (safe in bf16)

# Residual-stream pad quantum: T5Stack pads sequences to this multiple once
# at stack entry (and Vid2Seq pads the fused encoder states once) so the
# attention kernels' 128-row blocking never pads per layer.
SEQ_PAD_BLOCK = 128

# Training attentions with Lq*Lk at or above this rematerialize their
# probs (hash-mask dropout, no O(L^2) residual) instead of letting XLA
# save + layout-copy the f32 score tensor; below it the plain dense path
# with saved probs is cheaper.
DENSE_REMAT_MIN_ELEMS = 256 * 256

# gradient checkpointing of each T5 block during training; disable on chips
# with HBM to spare for ~25% fewer recomputed FLOPs
REMAT_BLOCKS = True
# None = recompute everything; dots_with_no_batch_dims_saveable keeps matmul
# outputs resident (faster, more memory)
REMAT_POLICY = None

# fused-attention Pallas kernel for long-sequence self-attention:
# True / False / None (auto: only on TPU backends)
USE_FUSED_ATTENTION = None

# Megatron-style sequence parallelism (set via
# runtime/mesh.enable_sequence_parallelism, never directly): a
# NamedSharding with spec (data_axis, model_axis) pinning the residual
# stream's [B, L, D] activations to batch x sequence shards between
# blocks. Norm/dropout/residual math then runs on L-shards and GSPMD
# places the all-gather (into attention, which needs full L) and the
# reduce-scatter (out of the block) on the model axis over ICI. None
# disables the constraint entirely.
#
# ENCODER STACKS ONLY. Constraining the *decoder* residual stream
# miscompiles on the XLA:CPU SPMD partitioner: in the full Vid2Seq graph
# (not in an isolated decoder subgraph) the logits of every query position
# in the second L-shard come out wrong (~1% loss shift; first shard
# bit-exact — /tmp-era repro now in tests/test_sequence_parallel.py).
# Our graph contains only global-shape ops, so a resharding constraint
# cannot legally change values; until the upstream bug is fixed the
# constraint is applied only where it matters anyway — the long encoder
# side (ASR <=1000 tokens + 100 video frames vs 256 decoder steps).
#
# NOTE: read at TRACE time. enable_sequence_parallelism must run before
# the train step is first traced; jit's trace cache will otherwise keep
# serving the unconstrained program.
SEQUENCE_SHARDING = None


def _sp_constrain(x: Array, is_decoder: bool) -> Array:
    """Pin x ([B, L, D]) to the sequence-parallel layout when enabled."""
    if SEQUENCE_SHARDING is None or is_decoder:
        return x
    return jax.lax.with_sharding_constraint(x, SEQUENCE_SHARDING)


def _fused_attention_enabled() -> bool:
    if USE_FUSED_ATTENTION is not None:
        return USE_FUSED_ATTENTION
    return jax.default_backend() not in ("cpu", "gpu")


# fused decode-step attention kernels (cache write + attend in one custom
# call per layer). Measured SLOWER on v5e (3.75 vs 5.32 videos/s, beam-4
# bs16): the per-(batch*beam, head) grid makes ~768 tiny programs per call
# and dispatch dominates the ~8 removed XLA ops. Kept as an experiment —
# a useful megakernel must fuse across heads and layers. Default OFF.
USE_FUSED_DECODE = False


def _fused_decode_enabled() -> bool:
    return bool(USE_FUSED_DECODE)


# cross-layer decode megakernel (ops/decode_megakernel.py): ONE Pallas
# program per decode step over all decoder layers, with the beam cache
# permutation folded into the kernel's streaming pass. 15.85 vs 5.33
# videos/s (beam-4/256/bs16) on v5e — BENCH_NOTES.md round 2.
# True / False / None (auto: only on TPU backends); make_generate_fn
# falls back to the standard path when the batch/beam geometry doesn't
# tile (beams not in {1,2,4,8} or batch*beams % block != 0).
USE_MEGA_DECODE = None


def _mega_decode_enabled() -> bool:
    if USE_MEGA_DECODE is not None:
        return USE_MEGA_DECODE
    return jax.default_backend() not in ("cpu", "gpu")


def _dense_keep_scale(seed: Array, shape, rate: float) -> Array:
    """Recomputable dropout keep/(1-rate) mask over a [B, H, Lq, Lk] score
    tensor — murmur3-finalizer over absolute positions, the same family as
    ops/fused_attention._keep_scale, so a jax.checkpoint around attention
    carries no O(L^2) residual (fwd and bwd rebuild the identical mask)."""
    b, h, lq, lk = shape
    pos = jax.lax.broadcasted_iota(jnp.uint32, (b * h, lq * lk), 1)
    row = jax.lax.broadcasted_iota(jnp.uint32, (b * h, lq * lk), 0)
    x = pos + row * jnp.uint32(lq * lk)
    x = x ^ (seed[0] * jnp.uint32(0x9E3779B1))
    x = x * jnp.uint32(0xCC9E2D51)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    keep = jnp.where(x >= thresh, 1.0 / (1.0 - rate), 0.0)
    return keep.astype(jnp.float32).reshape(shape)


def _apply_dropout(module: nn.Module, x: Array, rate: float,
                   deterministic: bool) -> Array:
    """Functional dropout usable inside setup-style module methods."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(module.make_rng("dropout"), keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _dtype(cfg: T5Config):
    return jnp.dtype(cfg.dtype)


def stack_is_scanned(cfg: T5Config, is_decoder: bool) -> bool:
    """Resolve T5Config.scan_layers (True | False | "encoder" | "decoder")
    for one stack. Per-stack granularity exists because scanning the
    L=1024 encoder forces remat (stacked residuals OOM v5e HBM) while the
    short decoder scans fine without it."""
    s = cfg.scan_layers
    if isinstance(s, str):
        return s == ("decoder" if is_decoder else "encoder")
    return bool(s)


class RMSNorm(nn.Module):
    """T5LayerNorm: scale-only RMS norm, stats in fp32."""

    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (weight * y).astype(self.dtype)


def relative_position_bucket(relative_position: Array, bidirectional: bool,
                             num_buckets: int, max_distance: int) -> Array:
    """HF-equivalent bucketing of relative positions (modeling_t5.py:389-427)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    ret += jnp.where(is_small, n, val_if_large)
    return ret


class RelativePositionBias(nn.Module):
    cfg: T5Config
    bidirectional: bool

    @nn.compact
    def __call__(self, query_length: int, key_length: int,
                 query_offset: int = 0) -> Array:
        """[1, heads, q_len, k_len] additive bias."""
        cfg = self.cfg
        emb = self.param(
            "rel_embedding", nn.initializers.normal(cfg.d_model ** -0.5),
            (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32)
        ctx = jnp.arange(query_length)[:, None] + query_offset
        mem = jnp.arange(key_length)[None, :]
        rel_pos = mem - ctx  # key - query
        buckets = relative_position_bucket(
            rel_pos, self.bidirectional,
            cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
        # One-hot matmul instead of emb[buckets]: a gather here is cheap
        # forward but its transpose is a q*k-row scatter-add into the tiny
        # [buckets, heads] table — measured 14 ms/step on v5e (73% of the
        # 1024x1024 encoder bias' total cost).  The one-hot contraction is
        # exact in f32 (one 1.0 per row; 31 zero products) and both its
        # forward and transpose are MXU matmuls.
        onehot = (buckets[..., None] ==
                  jnp.arange(cfg.relative_attention_num_buckets)).astype(jnp.float32)
        bias = jnp.einsum("qkb,bh->qkh", onehot, emb,
                          preferred_element_type=jnp.float32)
        return jnp.transpose(bias, (2, 0, 1))[None].astype(_dtype(cfg))


def _fused_proj_init(scales, d_kv):
    """Per-projection Mesh-TF init scales for a fused [d_model, heads, P,
    d_kv] kernel (P = packed projections). Flax's DenseGeneral initializes
    the kernel on a FLATTENED (d_model, heads*P*d_kv) shape and reshapes
    afterwards, so the scales are tiled along the flat feature axis."""
    import numpy as _np

    scales = _np.asarray(scales, _np.float32)
    block = _np.repeat(scales, d_kv)  # [P * d_kv], one head's columns

    def init(key, shape, dtype=jnp.float32):
        w = jax.random.normal(key, shape, dtype)
        if len(shape) >= 3:  # full [.., heads, P, d_kv] layout
            s = jnp.asarray(scales, dtype).reshape(
                (1,) * (len(shape) - 2) + (len(scales), 1))
            return w * s
        heads = shape[-1] // block.size
        s = jnp.asarray(_np.tile(block, heads), dtype)
        return w * s

    return init


class T5Attention(nn.Module):
    """Multi-head attention, unscaled QK^T, optional additive position bias.

    With ``T5Config.fused_qkv`` the projections are stored as packed params —
    self-attention ``qkv`` [d_model, heads, 3, d_kv], cross-attention ``kv``
    [d_model, heads, 2, d_kv] — so each projection group is ONE matmul and
    ONE optimizer leaf (the round-2 profile charged ~8 ms/step to XLA
    memory-space staging across the per-leaf tree). Head-major packing keeps
    the Megatron column-sharding rule exact: sharding the heads axis gives
    every model shard whole heads with their q/k/v together.
    """

    cfg: T5Config
    role: str = "self"  # "self" | "cross"

    def setup(self):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        # Mesh-TF factor-scaled init (reference model/modeling_t5.py:829-838,
        # T5Attention branch of _init_weights): q absorbs the absent 1/sqrt(d_kv)
        # softmax scaling; from-scratch training diverges without this.
        q_std = (cfg.d_model * cfg.d_kv) ** -0.5
        kv_std = cfg.d_model ** -0.5
        dt = _dtype(cfg)
        self._fused = bool(getattr(cfg, "fused_qkv", False))
        if self._fused and self.role == "self":
            self.qkv = nn.DenseGeneral(
                (cfg.num_heads, 3, cfg.d_kv), use_bias=False, dtype=dt,
                kernel_init=_fused_proj_init((q_std, kv_std, kv_std),
                                             cfg.d_kv),
                name="qkv")
        elif self._fused:
            self.q = nn.Dense(inner, use_bias=False, dtype=dt,
                              kernel_init=nn.initializers.normal(q_std),
                              name="q")
            self.kv = nn.DenseGeneral(
                (cfg.num_heads, 2, cfg.d_kv), use_bias=False, dtype=dt,
                kernel_init=_fused_proj_init((kv_std, kv_std), cfg.d_kv),
                name="kv")
        else:
            self.q = nn.Dense(inner, use_bias=False, dtype=dt,
                              kernel_init=nn.initializers.normal(q_std),
                              name="q")
            self.k = nn.Dense(inner, use_bias=False, dtype=dt,
                              kernel_init=nn.initializers.normal(kv_std),
                              name="k")
            self.v = nn.Dense(inner, use_bias=False, dtype=dt,
                              kernel_init=nn.initializers.normal(kv_std),
                              name="v")
        self.o = nn.Dense(cfg.d_model, use_bias=False, dtype=dt,
                          kernel_init=nn.initializers.normal(
                              (cfg.num_heads * cfg.d_kv) ** -0.5),
                          name="o")

    def _split(self, x: Array) -> Array:
        b, l, _ = x.shape
        return x.reshape(b, l, self.cfg.num_heads, self.cfg.d_kv).transpose(0, 2, 1, 3)

    def _qkv_self(self, x: Array) -> Tuple[Array, Array, Array]:
        """(q, k, v) each [b, h, l, d] projected from ONE tensor (self-attn)."""
        if self._fused:
            y = self.qkv(x)  # [b, l, h, 3, d_kv]
            return (y[..., 0, :].transpose(0, 2, 1, 3),
                    y[..., 1, :].transpose(0, 2, 1, 3),
                    y[..., 2, :].transpose(0, 2, 1, 3))
        return (self._split(self.q(x)), self._split(self.k(x)),
                self._split(self.v(x)))

    def _kv_cross(self, x: Array) -> Tuple[Array, Array]:
        """(k, v) each [b, h, l, d] from the encoder states (cross-attn)."""
        if self._fused:
            y = self.kv(x)  # [b, l, h, 2, d_kv]
            return (y[..., 0, :].transpose(0, 2, 1, 3),
                    y[..., 1, :].transpose(0, 2, 1, 3))
        return self._split(self.k(x)), self._split(self.v(x))

    def _merge(self, x: Array) -> Array:
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    def __call__(self, hidden: Array, kv: Array, bias: Optional[Array],
                 dropout_rate: float, deterministic: bool,
                 cache: Optional[Dict[str, Array]] = None,
                 cache_index: Optional[Array] = None,
                 key_mask: Optional[Array] = None,
                 ) -> Tuple[Array, Optional[Dict[str, Array]]]:
        """``bias`` is batch-independent ([1, h, q, k] rel-pos (+ causal));
        the [B, K] ``key_mask`` is applied separately so no [B, h, L, L]
        bias tensor is ever materialized in HBM (the v5e OOMs otherwise)."""
        if cache is not None and "k" in cache and kv is hidden:
            # incremental self-attention: write new kv at cache_index
            q, k_new, v_new = self._qkv_self(hidden)
            if _fused_decode_enabled() and bias is not None:
                # one custom call per layer step: cache writes + attention
                # (the decode loop is op-overhead-bound, BENCH_NOTES.md)
                from vidchapters_tpu.ops.decode_attention import (
                    decode_self_attention,
                )

                out, k, v = decode_self_attention(
                    q, k_new, v_new, cache["k"], cache["v"], bias,
                    cache_index, jax.default_backend() == "cpu")
                return self.o(self._merge(out)), {"k": k, "v": v}
            k = jax.lax.dynamic_update_slice(cache["k"], k_new, (0, 0, cache_index, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v_new, (0, 0, cache_index, 0))
            cache = {"k": k, "v": v}
        elif cache is not None:  # precomputed cross-attention kv
            q = self._split(self.q(hidden))
            k, v = cache["k"], cache["v"]
            if (_fused_decode_enabled() and bias is None
                    and key_mask is not None and q.shape[2] == 1):
                # one custom call per layer step (handles per-example KV
                # shared across beams, group = 1 for greedy)
                from vidchapters_tpu.ops.decode_attention import (
                    decode_cross_attention,
                )

                out = decode_cross_attention(
                    q, k, v, key_mask, jax.default_backend() == "cpu")
                return self.o(self._merge(out)), cache
            if k.shape[0] != q.shape[0]:
                # beam decoding with per-example (not per-beam) cross KV:
                # group the beam axis instead of duplicating the KV buffers
                b0 = k.shape[0]
                group = q.shape[0] // b0
                cfgh, dkv = self.cfg.num_heads, self.cfg.d_kv
                qg = q.reshape(b0, group, cfgh, q.shape[2], dkv)
                scores = jnp.einsum("bghqd,bhkd->bghqk", qg, k
                                    ).astype(jnp.float32)
                if bias is not None:
                    scores = scores + bias.astype(jnp.float32)
                if key_mask is not None:
                    scores = jnp.where(
                        key_mask[:, None, None, None, :].astype(bool),
                        scores, NEG_INF)
                probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
                out = jnp.einsum("bghqk,bhkd->bghqd", probs, v)
                out = out.reshape(q.shape[0], cfgh, q.shape[2], dkv)
                return self.o(self._merge(out)), cache
        else:
            if kv is hidden:
                q, k, v = self._qkv_self(hidden)
            else:
                q = self._split(self.q(hidden))
                k, v = self._kv_cross(kv)
        large = (cache is None and q.shape[2] > self.CHUNK
                 and q.shape[2] * k.shape[2] > 512 * 512)
        use_fused = (large and _fused_attention_enabled()
                     and (bias is None or bias.shape[0] == 1)
                     and key_mask is not None)
        if use_fused:
            # the merged backward's VMEM footprint is quadratic in L; past
            # the scoped-VMEM ceiling (~L 2-3k) fall back to chunked
            from vidchapters_tpu.ops.fused_attention import (
                backward_fits_vmem,
            )

            use_fused = backward_fits_vmem(q.shape[2], k.shape[2],
                                           self.cfg.d_kv, bias is not None)
        use_chunked = large and not use_fused
        if use_fused:
            from vidchapters_tpu.ops.fused_attention import (
                fused_attention_padded,
            )

            drop = 0.0 if deterministic else dropout_rate
            seed = None
            if drop > 0.0:
                # in-kernel recomputable dropout: fwd and bwd rebuild the
                # same keep mask from this scalar — no O(L^2) residual
                seed = jax.random.bits(self.make_rng("dropout"), (1, 1),
                                       jnp.uint32)
            out = fused_attention_padded(
                q, k, v, bias, key_mask,
                jax.default_backend() == "cpu",  # interpret off-TPU
                seed=seed, dropout_rate=drop)
        elif use_chunked:
            out = self._chunked_attention(q, k, v, bias, key_mask,
                                          dropout_rate, deterministic)
        elif (not deterministic and dropout_rate > 0.0
              and q.shape[2] * k.shape[2] >= DENSE_REMAT_MIN_ELEMS):
            # mid-size training attention (decoder self-attn at the
            # reference recipe: 256/304): rematerialize instead of saving
            # the f32 [B,H,Lq,Lk] probs — XLA was inserting a 35 MB
            # transposed layout copy of the saved probs per layer-pass for
            # the dv contraction (~12 ms/step in the round-2 profile).
            # Dropout uses the same recomputable hash mask as the fused
            # kernel so the checkpoint carries no O(L^2) residual.
            seed = jax.random.bits(self.make_rng("dropout"), (1,),
                                   jnp.uint32)

            @jax.checkpoint
            def dense_attention(q, k, v, seed):
                scores = jnp.einsum("bhqd,bhkd->bhqk", q, k
                                    ).astype(jnp.float32)
                if bias is not None:
                    scores = scores + bias.astype(jnp.float32)
                if key_mask is not None:
                    scores = jnp.where(
                        key_mask[:, None, None, :].astype(bool),
                        scores, NEG_INF)
                probs = jax.nn.softmax(scores, axis=-1)
                keep = _dense_keep_scale(seed, probs.shape, dropout_rate)
                return jnp.einsum("bhqk,bhkd->bhqd",
                                  (probs * keep).astype(q.dtype), v)

            out = dense_attention(q, k, v, seed)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
            if bias is not None:
                scores = scores + bias.astype(jnp.float32)
            if key_mask is not None:
                scores = jnp.where(key_mask[:, None, None, :].astype(bool),
                                   scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            probs = _apply_dropout(self, probs, dropout_rate, deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return self.o(self._merge(out)), cache

    CHUNK = 128

    def _chunked_attention(self, q: Array, k: Array, v: Array,
                           bias: Optional[Array], key_mask: Optional[Array],
                           dropout_rate: float, deterministic: bool) -> Array:
        """Query-chunked attention: never materializes [B, h, Lq, Lk].

        Identical math to the dense path (including per-element attention-prob
        dropout, reproduced with a counter-based PRNG folded per chunk) with
        peak memory O(Lk * CHUNK) per layer — this is what lets seq-1000
        batch-8 training fit v5e HBM.
        """
        chunk = self.CHUNK
        b, h, lq, d = q.shape
        pad = (-lq) % chunk
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if bias is not None and pad:
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad), (0, 0)))
        n_chunks = qp.shape[2] // chunk
        key_valid = (key_mask[:, None, None, :].astype(bool)
                     if key_mask is not None else None)
        use_dropout = dropout_rate > 0.0 and not deterministic
        rng = self.make_rng("dropout") if use_dropout else None

        def body(_, idx):
            qc = jax.lax.dynamic_slice_in_dim(qp, idx * chunk, chunk, axis=2)
            scores = jnp.einsum("bhqd,bhkd->bhqk", qc, k).astype(jnp.float32)
            if bias is not None:
                bc = jax.lax.dynamic_slice_in_dim(
                    bias.astype(jnp.float32), idx * chunk, chunk, axis=2)
                scores = scores + bc
            if key_valid is not None:
                scores = jnp.where(key_valid, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            if use_dropout:
                keep = 1.0 - dropout_rate
                mask = jax.random.bernoulli(
                    jax.random.fold_in(rng, idx), keep, probs.shape)
                probs = jnp.where(mask, probs / keep, jnp.zeros_like(probs))
            return None, jnp.einsum("bhqk,bhkd->bhqd", probs, v)

        _, out_chunks = jax.lax.scan(body, None, jnp.arange(n_chunks))
        # [n_chunks, B, h, chunk, d] -> [B, h, Lq, d]
        out = jnp.moveaxis(out_chunks, 0, 2).reshape(b, h, n_chunks * chunk, d)
        return out[:, :, :lq]

    def precompute_kv(self, kv: Array) -> Dict[str, Array]:
        k, v = self._kv_cross(kv)
        return {"k": k, "v": v}


class T5FeedForward(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x: Array, dropout_rate: float, deterministic: bool) -> Array:
        cfg = self.cfg
        dt = _dtype(cfg)
        # Mesh-TF FF init (reference model/modeling_t5.py:810-828)
        wi_init = nn.initializers.normal(cfg.d_model ** -0.5)
        wo_init = nn.initializers.normal(cfg.d_ff ** -0.5)
        if cfg.is_gated_act:
            g = nn.Dense(cfg.d_ff, use_bias=False, dtype=dt, kernel_init=wi_init, name="wi_0")(x)
            l = nn.Dense(cfg.d_ff, use_bias=False, dtype=dt, kernel_init=wi_init, name="wi_1")(x)
            # HF "gated-gelu" resolves to gelu_new = tanh approximation
            h = jax.nn.gelu(g, approximate=True) * l
        else:
            h = nn.Dense(cfg.d_ff, use_bias=False, dtype=dt, kernel_init=wi_init, name="wi")(x)
            h = jax.nn.relu(h)
        h = nn.Dropout(rate=dropout_rate, deterministic=deterministic)(h)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=dt, kernel_init=wo_init, name="wo")(h)


class T5Block(nn.Module):
    cfg: T5Config
    is_decoder: bool

    def setup(self):
        cfg = self.cfg
        dt = _dtype(cfg)
        self.self_attn_norm = RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, dt,
                                      name="self_attn_norm")
        self.self_attn = T5Attention(cfg, role="self", name="self_attn")
        if self.is_decoder:
            self.cross_attn_norm = RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, dt,
                                           name="cross_attn_norm")
            self.cross_attn = T5Attention(cfg, role="cross", name="cross_attn")
        self.ff_norm = RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, dt, name="ff_norm")
        self.ff = T5FeedForward(cfg, name="ff")

    def __call__(self, x: Array, self_bias: Optional[Array],
                 enc_out: Optional[Array], cross_bias: Optional[Array],
                 dropout_rate: float, deterministic: bool,
                 cache: Optional[Dict[str, Any]] = None,
                 cache_index: Optional[Array] = None,
                 self_key_mask: Optional[Array] = None,
                 cross_key_mask: Optional[Array] = None,
                 ) -> Tuple[Array, Optional[Dict[str, Any]]]:
        new_cache: Dict[str, Any] = {}
        normed = self.self_attn_norm(x)
        h, self_kv = self.self_attn(
            normed, normed, self_bias, dropout_rate, deterministic,
            cache=None if cache is None else cache.get("self"),
            cache_index=cache_index, key_mask=self_key_mask)
        x = x + _apply_dropout(self, h, dropout_rate, deterministic)
        if cache is not None:
            new_cache["self"] = self_kv
        has_cached_cross = cache is not None and "cross" in cache
        if self.is_decoder and (enc_out is not None or has_cached_cross):
            h, _ = self.cross_attn(
                self.cross_attn_norm(x), enc_out, cross_bias,
                dropout_rate, deterministic,
                cache=cache.get("cross") if has_cached_cross else None,
                key_mask=cross_key_mask)
            x = x + _apply_dropout(self, h, dropout_rate, deterministic)
            if cache is not None:
                new_cache["cross"] = cache.get("cross")
        x = x + _apply_dropout(
            self, self.ff(self.ff_norm(x), dropout_rate, deterministic),
            dropout_rate, deterministic)
        return x, (new_cache if cache is not None else None)


class T5Stack(nn.Module):
    cfg: T5Config
    is_decoder: bool

    def setup(self):
        cfg = self.cfg
        n = cfg.num_decoder_layers if self.is_decoder else cfg.num_layers
        self.n_layers = n
        self.scanned = stack_is_scanned(cfg, self.is_decoder)
        if self.scanned:
            # ONE block whose params carry a leading [n] layer axis; every
            # method lifts it with nn.scan (function form shares the params
            # across __call__ / init_cache / decode_step)
            self.block = T5Block(cfg, self.is_decoder, name="blocks")
            self.blocks = ()
        else:
            self.blocks = [T5Block(cfg, self.is_decoder, name=f"block_{i}")
                           for i in range(n)]
        self.final_norm = RMSNorm(cfg.d_model, cfg.layer_norm_epsilon, _dtype(cfg),
                                  name="final_norm")
        self.rel_bias = RelativePositionBias(cfg, bidirectional=not self.is_decoder,
                                             name="rel_bias")

    @property
    def dropout_rate(self) -> float:
        return self.cfg.decoder_dropout if self.is_decoder else self.cfg.encoder_dropout

    def __call__(self, inputs_embeds: Array, attention_mask: Array,
                 enc_out: Optional[Array] = None,
                 enc_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        """Full-sequence forward (training / encoding)."""
        b, l_orig, _ = inputs_embeds.shape
        # ENCODER ONLY: pad the residual stream ONCE to the attention
        # kernel's 128-row block so no per-layer q/k/v pad/unpad ops remain
        # (~5 ms/step of pads in the round-2 profile at the reference
        # recipe).  Exact: padded positions are masked out as keys and
        # their query rows are sliced off before return.  The decoder's
        # shorter streams (256/304) pad ~1 MB tensors per layer — cheaper
        # than carrying +26% rows through its FF/projections.
        l = (l_orig if self.is_decoder
             else -(-l_orig // SEQ_PAD_BLOCK) * SEQ_PAD_BLOCK)
        if l != l_orig:
            inputs_embeds = jnp.pad(
                inputs_embeds, ((0, 0), (0, l - l_orig), (0, 0)))
            attention_mask = jnp.pad(
                attention_mask, ((0, 0), (0, l - l_orig)))
        rate = self.dropout_rate
        x = _apply_dropout(self, inputs_embeds.astype(_dtype(self.cfg)),
                           rate, deterministic)
        x = _sp_constrain(x, self.is_decoder)

        # batch-independent bias: rel-pos (+ causal); padding handled inside
        # attention by the [B, L] key mask (no [B, h, L, L] tensor in HBM)
        self_bias = self.rel_bias(l, l)
        if self.is_decoder:
            causal = jnp.tril(jnp.ones((l, l), dtype=bool))
            self_bias = jnp.where(causal[None, None], self_bias, NEG_INF)

        def body(blk, x, self_bias, self_key_mask, enc_out, cross_key_mask):
            return blk(x, self_bias, enc_out, None, rate, deterministic,
                       self_key_mask=self_key_mask,
                       cross_key_mask=cross_key_mask)[0]

        remat = (self.cfg.remat if getattr(self.cfg, "remat", None) is not None
                 else REMAT_BLOCKS)
        # remat each block to fit long-seq training on small-HBM chips;
        # the policy saves MXU outputs and recomputes only cheap
        # elementwise work, cutting the recompute tax of plain remat
        use_remat = not deterministic and remat
        if self.scanned:
            def scan_body(blk, h):
                h = _sp_constrain(
                    body(blk, h, self_bias, attention_mask, enc_out, enc_mask),
                    self.is_decoder)
                return h, None

            if use_remat:
                scan_body = nn.remat(scan_body, policy=REMAT_POLICY)
            x, _ = nn.scan(
                scan_body, variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.n_layers)(self.block, x)
        else:
            if use_remat:
                body = nn.checkpoint(body, policy=REMAT_POLICY)
            for blk in self.blocks:
                x = _sp_constrain(
                    body(blk, x, self_bias, attention_mask, enc_out, enc_mask),
                    self.is_decoder)
        x = self.final_norm(x)
        x = _apply_dropout(self, x, rate, deterministic)
        return x[:, :l_orig] if l != l_orig else x

    # ----- incremental decoding -----

    def init_cache(self, batch: int, max_len: int, enc_out: Array) -> Dict[str, Any]:
        cfg = self.cfg
        dt = _dtype(cfg)
        if self.scanned:
            # layer axis lives at axis 1 so the beam-reorder gather
            # (axis 0 == rows) works unchanged on the stacked leaves;
            # cross KV keeps enc_out's per-EXAMPLE batch (beam search
            # shares it across beams via the grouped attention path)
            def kv_body(blk, carry):
                return carry, blk.cross_attn.precompute_kv(enc_out.astype(dt))

            _, cross = nn.scan(
                kv_body, variable_axes={"params": 0},
                split_rngs={"params": True}, out_axes=1,
                length=self.n_layers)(self.block, jnp.zeros((), jnp.float32))
            return {
                "self": {
                    "k": jnp.zeros((batch, self.n_layers, cfg.num_heads,
                                    max_len, cfg.d_kv), dt),
                    "v": jnp.zeros((batch, self.n_layers, cfg.num_heads,
                                    max_len, cfg.d_kv), dt),
                },
                "cross": cross,
            }
        cache: Dict[str, Any] = {}
        for i, blk in enumerate(self.blocks):
            cache[f"block_{i}"] = {
                "self": {
                    "k": jnp.zeros((batch, cfg.num_heads, max_len, cfg.d_kv), dt),
                    "v": jnp.zeros((batch, cfg.num_heads, max_len, cfg.d_kv), dt),
                },
                "cross": blk.cross_attn.precompute_kv(enc_out.astype(dt)),
            }
        return cache

    def decode_step(self, token_embeds: Array, cache: Dict[str, Any],
                    cache_index: Array, enc_mask: Array,
                    max_len: int) -> Tuple[Array, Dict[str, Any]]:
        """One decode step. ``token_embeds``: [b, 1, d]."""
        cfg = self.cfg
        x = token_embeds.astype(_dtype(cfg))
        # position bias row for the current query position over all key slots
        bias_full = self.rel_bias(1, max_len, query_offset=cache_index)
        pos = jnp.arange(max_len)[None, None, None, :]
        valid = pos <= cache_index
        self_bias = jnp.where(valid, bias_full, NEG_INF)
        if self.scanned:
            # scan over the layer axis (axis 1 of every cache leaf); only
            # the self KV is emitted per layer — the pass-through cross KV
            # would otherwise be re-stacked (copied) every decode step
            def step_body(blk, h, layer_cache):
                h, c = blk(h, self_bias, None, None, 0.0, True,
                           cache=layer_cache, cache_index=cache_index,
                           cross_key_mask=enc_mask)
                return h, c["self"]

            x, new_self = nn.scan(
                step_body, variable_axes={"params": 0},
                split_rngs={"params": True}, in_axes=1, out_axes=1,
                length=self.n_layers)(self.block, x, cache)
            x = self.final_norm(x)
            return x, {"self": new_self, "cross": cache["cross"]}
        new_cache: Dict[str, Any] = {}
        for i, blk in enumerate(self.blocks):
            # cross-attention uses cached KV + the encoder key mask (the mask
            # path supports per-example KV shared across beams)
            x, c = blk(x, self_bias, None, None, 0.0, True,
                       cache=cache[f"block_{i}"], cache_index=cache_index,
                       cross_key_mask=enc_mask)
            new_cache[f"block_{i}"] = c
        x = self.final_norm(x)
        return x, new_cache


class T5ForConditionalGeneration(nn.Module):
    """Encoder-decoder with shared embeddings and (optionally tied) LM head."""

    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model,
                               embedding_init=nn.initializers.normal(1.0),
                               dtype=_dtype(cfg), name="shared")
        self.encoder = T5Stack(cfg, is_decoder=False, name="encoder")
        self.decoder = T5Stack(cfg, is_decoder=True, name="decoder")
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                    dtype=_dtype(cfg), name="lm_head")

    def embed(self, ids: Array) -> Array:
        return self.shared(ids)

    def encode(self, input_ids: Optional[Array] = None,
               inputs_embeds: Optional[Array] = None,
               attention_mask: Optional[Array] = None,
               deterministic: bool = True) -> Array:
        if inputs_embeds is None:
            inputs_embeds = self.shared(input_ids)
        if attention_mask is None:
            attention_mask = jnp.ones(inputs_embeds.shape[:2], jnp.int32)
        return self.encoder(inputs_embeds, attention_mask, deterministic=deterministic)

    def logits_from_hidden(self, hidden: Array) -> Array:
        cfg = self.cfg
        if cfg.tie_word_embeddings:
            hidden = hidden * (cfg.d_model ** -0.5)
            logits = jnp.einsum("bld,vd->blv", hidden,
                                self.shared.embedding.astype(hidden.dtype))
        else:
            logits = self.lm_head(hidden)
        return logits.astype(jnp.float32)

    def decode(self, decoder_input_ids: Array, decoder_attention_mask: Array,
               enc_out: Array, enc_mask: Array,
               deterministic: bool = True) -> Array:
        dec = self.decoder(self.shared(decoder_input_ids), decoder_attention_mask,
                           enc_out=enc_out.astype(_dtype(self.cfg)), enc_mask=enc_mask,
                           deterministic=deterministic)
        return self.logits_from_hidden(dec)

    def __call__(self, input_ids: Array, attention_mask: Array,
                 decoder_input_ids: Array, decoder_attention_mask: Array,
                 deterministic: bool = True) -> Array:
        enc = self.encode(input_ids=input_ids, attention_mask=attention_mask,
                          deterministic=deterministic)
        return self.decode(decoder_input_ids, decoder_attention_mask,
                           enc, attention_mask, deterministic=deterministic)

    # decode-step API used by ops.decoding

    def init_cache(self, batch: int, max_len: int, enc_out: Array) -> Dict[str, Any]:
        return self.decoder.init_cache(batch, max_len, enc_out)

    def decode_step(self, token_ids: Array, cache: Dict[str, Any], cache_index: Array,
                    enc_mask: Array, max_len: int) -> Tuple[Array, Dict[str, Any]]:
        """token_ids: [b] -> logits [b, vocab], new cache."""
        emb = self.shared(token_ids[:, None])
        hidden, cache = self.decoder.decode_step(emb, cache, cache_index, enc_mask, max_len)
        return self.logits_from_hidden(hidden)[:, 0], cache


def shift_right(labels: Array, decoder_start_token_id: int = 0,
                pad_token_id: int = 0) -> Array:
    """HF `_shift_right` (modeling_t5.py): prepend start token, drop last."""
    shifted = jnp.zeros_like(labels).at[:, 1:].set(labels[:, :-1])
    shifted = shifted.at[:, 0].set(decoder_start_token_id)
    return jnp.where(shifted == -100, pad_token_id, shifted)


def label_smoothed_cross_entropy(logits: Array, labels: Array,
                                 label_smoothing: float = 0.1,
                                 ignore_index: int = -100) -> Array:
    """Mean CE with label smoothing over non-ignored positions.

    Matches torch's ``CrossEntropyLoss(ignore_index=-100, label_smoothing=s)``
    as used at modeling_t5.py:1721.
    """
    vocab = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = (labels != ignore_index)
    safe_labels = jnp.where(mask, labels, 0)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    denom = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, loss, 0.0).sum() / denom
