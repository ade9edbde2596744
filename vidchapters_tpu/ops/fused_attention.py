"""Fused bias-aware attention Pallas kernel (T5 encoder hot path).

Computes softmax(q k^T + bias + key-mask) v without ever materializing the
[B, H, L, L] score tensor in HBM: the kernel holds one query block plus the
full K/V for its (batch, head) program in VMEM (K/V are [L, 64] — hundreds
of KB at T5-base shapes, far under the 16 MB budget), so a plain blockwise
softmax suffices; no online-softmax bookkeeping is needed.

A custom VJP supplies the backward pass as two more Pallas kernels:
- dq/dk/dv over a (B, H) grid, accumulating dk/dv in VMEM scratch across
  query blocks (the col2im-style transposed matmuls);
- dbias over an (H, nQ) grid, accumulating the score gradients over the
  batch (T5's relative-position bias is learned and batch-broadcast, so its
  gradient is the batch-sum of dS).

Attention-prob dropout runs *inside* the kernel: the keep mask is a
murmur3-style hash of (seed, batch, head, absolute q/k position), so the
backward kernels recompute the identical mask from the same scalars instead
of saving an O(L^2) mask — residuals stay O(L * d) even in training, which
is what lets whole-block rematerialisation be turned off.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e9
BLOCK_Q = 128
# scoped-VMEM ceiling requested for the merged backward (v5e has headroom
# over the 16 MB default)
VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def backward_fits_vmem(lq: int, lk: int, d: int, has_bias: bool) -> bool:
    """Whether the merged dq/dk/dv(/dbias) backward's resident footprint
    fits the scoped-VMEM ceiling.

    The backward holds the full [lq, lk] score/probs temporaries plus (with
    bias) the bias block and an f32 dbias accumulator — ~4 f32 [lq, lk]
    arrays — alongside the O((lq+lk) d) operand blocks. The footprint grows
    quadratically with sequence length and exceeds the 64 MB ceiling around
    L~2-3k, which would be a hard Mosaic compile failure; callers must fall
    back to the chunked path instead (ADVICE r1)."""
    quad = (4 if has_bias else 3) * 4 * lq * lk
    lin = 4 * 10 * (lq + lk) * d
    return quad + lin <= VMEM_LIMIT_BYTES * 3 // 4


def _pad_to(x: Array, size: int, axis: int) -> Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# recomputable dropout keep-mask (murmur3 finalizer over absolute positions)
# ---------------------------------------------------------------------------


def _keep_scale(seed, b, h, q0, block_q, lk, rate):
    """[block_q, lk] f32 mask: keep / (1 - rate) or 0, deterministic in
    (seed, b, h, absolute position) — recomputed identically in fwd + bwd.

    One murmur3-finalizer hash yields TWO 16-bit Bernoulli decisions (lane
    j < lk/2 uses the low half, its partner j + lk/2 the high half), so the
    per-element hash cost — the largest VPU item in the backward kernel's
    softmax-recompute loop — is halved.  16-bit thresholds quantize the
    rate to 1/65536, far below dropout-rate precision anyone uses."""
    half = lk // 2
    rows = jax.lax.broadcasted_iota(jnp.uint32, (block_q, half), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (block_q, half), 1)
    x = (rows + jnp.uint32(q0)) * jnp.uint32(half) + cols
    s = (seed
         ^ (jnp.uint32(b) * jnp.uint32(0x9E3779B1))
         ^ (jnp.uint32(h) * jnp.uint32(0x85EBCA6B)))
    x = x ^ s
    x = x * jnp.uint32(0xCC9E2D51)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(int(rate * 65536.0), 65535))
    inv = jnp.float32(1.0 / (1.0 - rate))
    lo = jnp.where((x & jnp.uint32(0xFFFF)) >= thresh, inv, 0.0)
    hi = jnp.where((x >> 16) >= thresh, inv, 0.0)
    return jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref,
                *, dropout_rate: float, block_q: int,
                has_bias: bool = True):
    # q_ref [1,1,bq,D]; k/v [1,1,Lk,D]; bias [1,1,bq,Lk]; mask [B,Lk] (full)
    # Dots keep their operands in the INPUT dtype with f32 accumulation:
    # bf16 multiplicands hit the MXU's native bf16xbf16->f32 mode (an
    # explicit f32 upcast forces the 3-pass f32 MXU path, ~3x slower on
    # v5e) and produce the same products — bf16 values are exact in f32.
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    if has_bias:
        scores = scores + bias_ref[0, 0].astype(jnp.float32)
    # additive key mask: one [1, Lk] row per cell, one add per element
    # (a compare+select per element costs a second VPU slot); masked keys
    # land at score - 1e9 and underflow to 0 in the exp exactly as before
    madd = (mask_ref[pl.program_id(0)][None, :].astype(jnp.float32)
            - 1.0) * -NEG_INF
    scores = scores + madd
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / s
    if dropout_rate > 0.0:
        probs = probs * _keep_scale(
            seed_ref[0, 0], pl.program_id(0), pl.program_id(1),
            pl.program_id(2) * block_q, probs.shape[0], probs.shape[1],
            dropout_rate)
    out_ref[0, 0] = jnp.dot(probs.astype(v.dtype), v,
                            preferred_element_type=jnp.float32
                            ).astype(out_ref.dtype)


def _fused_forward(q, k, v, bias, key_mask, seed, dropout_rate,
                   interpret=False):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    # short query streams (decoder cross-attn: 256/304) run as ONE
    # 8-aligned block — kernel cost is linear in the PADDED q rows, so
    # rounding 304 up to 384 for 128-blocking wasted 26% of those calls
    bq = lq if lq <= 512 else BLOCK_Q
    assert lq % bq == 0 and bq % 8 == 0, (lq, bq)
    nq = lq // bq
    has_bias = bias is not None
    if not has_bias:  # (8, 128) dummy satisfies Mosaic tiling; never read
        bias = jnp.zeros((1, 1, 8, 128), q.dtype)
    bias_b = bias.shape[0]  # 1 (broadcast) or b
    bias_spec = (pl.BlockSpec((1, 1, bq, lk),
                              lambda i, j, n: (0 if bias_b == 1 else i,
                                               j, n, 0),
                              memory_space=pltpu.VMEM)
                 if has_bias else
                 pl.BlockSpec((1, 1, 8, 128), lambda i, j, n: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, dropout_rate=dropout_rate,
                          block_q=bq, has_bias=has_bias),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, n: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, bq, d), lambda i, j, n: (i, j, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk, d), lambda i, j, n: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk, d), lambda i, j, n: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
            # full mask block: a (1, Lk) block violates the (8, 128) sublane
            # divisibility rule at some shapes; row-indexed by program_id
            pl.BlockSpec((b, lk), lambda i, j, n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda i, j, n: (i, j, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
        interpret=interpret,
    )(seed, q, k, v, bias, key_mask)
    return out


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref,
                out_ref, dout_ref, dq_ref, dk_ref, dv_ref, *dbias_ref,
                n_q_blocks: int, block_q: int, dropout_rate: float,
                has_bias: bool = True):
    """Single backward pass: dq/dk/dv per (batch, head), and — when bias is
    present — dbias accumulated across the innermost batch grid dimension
    (one softmax recompute instead of two)."""
    # operands stay in the input dtype for every dot (f32 accumulation);
    # see the forward kernel's dtype note — f32 upcasts forfeit the MXU's
    # native bf16 mode.  ds/p are cast back to the input dtype for their
    # dots (standard flash-backward practice; dbias keeps unrounded f32).
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    head_id, batch_id = pl.program_id(0), pl.program_id(1)
    # additive key mask (see forward kernel): computed once per cell
    madd = (mask_ref[batch_id][None, :].astype(jnp.float32) - 1.0) * -NEG_INF
    dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
    dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])
    if has_bias:
        (db_ref,) = dbias_ref

        @pl.when(batch_id == 0)
        def _zero():
            db_ref[0, 0] = jnp.zeros_like(db_ref[0, 0])

    def body(n, _):
        q_blk = q_ref[0, 0, pl.ds(n * block_q, block_q)]
        out_blk = out_ref[0, 0, pl.ds(n * block_q, block_q)].astype(jnp.float32)
        dout_blk = dout_ref[0, 0, pl.ds(n * block_q, block_q)]
        scores = jnp.dot(q_blk, k.T, preferred_element_type=jnp.float32)
        if has_bias:
            scores = scores + bias_ref[0, 0, pl.ds(n * block_q, block_q)
                                       ].astype(jnp.float32)
        scores = scores + madd
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        # delta = rowsum(dp_dropped . p_dropped) = rowsum(dout . out) holds
        # with dropout too, since both factors carry the same keep mask
        delta_blk = jnp.sum(dout_blk.astype(jnp.float32) * out_blk, axis=-1)
        dp = jnp.dot(dout_blk, v.T, preferred_element_type=jnp.float32)
        pd = p
        if dropout_rate > 0.0:
            keep = _keep_scale(seed_ref[0, 0], batch_id, head_id,
                               n * block_q, block_q, p.shape[1],
                               dropout_rate)
            dp = dp * keep
            pd = p * keep
        ds = p * (dp - delta_blk[:, None])
        ds_c = ds.astype(k.dtype)
        dq_ref[0, 0, pl.ds(n * block_q, block_q)] = jnp.dot(
            ds_c, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, 0] += jnp.dot(ds_c.T, q_blk,
                                preferred_element_type=jnp.float32
                                ).astype(dk_ref.dtype)
        dv_ref[0, 0] += jnp.dot(pd.astype(dout_blk.dtype).T, dout_blk,
                                preferred_element_type=jnp.float32
                                ).astype(dv_ref.dtype)
        if has_bias:
            db_ref[0, 0, pl.ds(n * block_q, block_q)] += ds.astype(
                db_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_q_blocks, body, 0)


def _fused_backward(q, k, v, bias, key_mask, seed, dropout_rate, out, dout,
                    *_args, **_kw):
    assert backward_fits_vmem(q.shape[2], k.shape[2], q.shape[3],
                              bias is not None), (
        f"merged attention backward exceeds the {VMEM_LIMIT_BYTES >> 20} MB "
        f"scoped-VMEM ceiling at lq={q.shape[2]} lk={k.shape[2]}; use the "
        f"chunked attention path for sequences this long")
    return _fused_backward_impl(q, k, v, bias, key_mask, seed, dropout_rate,
                                out, dout, *_args, **_kw)


def _fused_backward_impl(q, k, v, bias, key_mask, seed, dropout_rate, out, dout,
                    interpret=False):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    # bigger backward blocks (256 rows when they divide lq) = fewer
    # serial loop iterations and fatter MXU dots; the keep mask depends
    # only on absolute positions, so fwd (128) and bwd blocks agree
    bwd_bq = (lq if lq <= 512 else
              (512 if lq % 512 == 0 else
               (256 if lq % 256 == 0 else BLOCK_Q)))
    assert lq % bwd_bq == 0 and bwd_bq % 8 == 0, (lq, bwd_bq)
    nq = lq // bwd_bq
    has_bias = bias is not None
    if has_bias and bias.shape[0] != 1:
        # batched bias: per-batch gradient equals dS directly; recompute via
        # XLA (rare path — T5's bias is always broadcast)
        raise NotImplementedError("fused attention expects broadcast bias")
    if not has_bias:
        bias = jnp.zeros((1, 1, 8, 128), q.dtype)
    bias_spec2 = (pl.BlockSpec((1, 1, lq, lk), lambda j, i: (0, j, 0, 0),
                               memory_space=pltpu.VMEM)
                  if has_bias else
                  pl.BlockSpec((1, 1, 8, 128), lambda j, i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM))

    # grid (h, b) with batch innermost: dq/dk/dv are per-(b, h) blocks and
    # dbias's block is revisited across b, accumulating in VMEM — the whole
    # backward is one softmax recompute
    out_specs = [
        pl.BlockSpec((1, 1, lq, d), lambda j, i: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk, d), lambda j, i: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk, d), lambda j, i: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(q.shape, jnp.float32),
        jax.ShapeDtypeStruct(k.shape, jnp.float32),
        jax.ShapeDtypeStruct(v.shape, jnp.float32),
    ]
    if has_bias:
        out_specs.append(pl.BlockSpec((1, 1, lq, lk),
                                      lambda j, i: (0, j, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((1, h, lq, lk), jnp.float32))

    results = pl.pallas_call(
        functools.partial(_bwd_kernel, n_q_blocks=nq, block_q=bwd_bq,
                          dropout_rate=dropout_rate, has_bias=has_bias),
        # the merged backward holds bias (bf16, lq x lk) + dbias (f32,
        # lq x lk) resident; at lq = lk = 1024 that is ~0.5 MB over the
        # default 16 MB scoped-vmem budget — raise it (v5e has headroom)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        grid=(h, b),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, lq, d), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk, d), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk, d), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec2,
            pl.BlockSpec((b, lk), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lq, d), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lq, d), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(seed, q, k, v, bias, key_mask, out, dout)
    if has_bias:
        dq, dk, dv, dbias = results
        return dq, dk, dv, dbias
    dq, dk, dv = results
    return dq, dk, dv, None


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_attention(q: Array, k: Array, v: Array, bias: Array,
                    key_mask: Array, seed: Array,
                    interpret: bool = False,
                    dropout_rate: float = 0.0) -> Array:
    """softmax(q k^T + bias + mask) v, with optional attention-prob dropout.

    q/k/v [B, H, Lq, D] / [B, H, Lk, D] (lengths multiples of 128 — use
    ``fused_attention_padded`` otherwise); bias [1, H, Lq, Lk] or None
    (bias-free cross-attention); key_mask [B, Lk] int (1 = valid);
    seed [1, 1] uint32 (ignored when dropout_rate == 0).
    """
    return _fused_forward(q, k, v, bias, key_mask, seed, dropout_rate,
                          interpret)


def _fa_fwd(q, k, v, bias, key_mask, seed, interpret, dropout_rate):
    out = _fused_forward(q, k, v, bias, key_mask, seed, dropout_rate,
                         interpret)
    return out, (q, k, v, bias, key_mask, seed, out)


def _fa_bwd(interpret, dropout_rate, res, dout):
    q, k, v, bias, key_mask, seed, out = res
    dq, dk, dv, dbias = _fused_backward(q, k, v, bias, key_mask, seed,
                                        dropout_rate, out, dout, interpret)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None if dbias is None else dbias.astype(bias.dtype), None, None)


fused_attention.defvjp(_fa_fwd, _fa_bwd)


def fused_attention_padded(q: Array, k: Array, v: Array, bias: Array,
                           key_mask: Array, interpret: bool = False,
                           seed: Array | None = None,
                           dropout_rate: float = 0.0) -> Array:
    """Wrapper padding Lq/Lk up to BLOCK_Q multiples (padded keys masked
    out, padded query rows sliced off). bias may be None (cross-attention);
    Lq and Lk may differ."""
    if seed is None:
        seed = jnp.zeros((1, 1), jnp.uint32)
    lq, lk = q.shape[2], k.shape[2]
    lqp = (((lq + 7) // 8) * 8 if lq <= 512
           else ((lq + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q)
    lkp = ((lk + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q
    if lqp != lq:
        q = _pad_to(q, lqp, 2)
    if lkp != lk:
        k = _pad_to(k, lkp, 2)
        v = _pad_to(v, lkp, 2)
        key_mask = _pad_to(key_mask, lkp, 1)
    if bias is not None and (lqp != lq or lkp != lk):
        bias = _pad_to(_pad_to(bias, lqp, 2), lkp, 3)
    out = fused_attention(q, k, v, bias, key_mask, seed, interpret,
                          dropout_rate)
    return out[:, :, :lq]
