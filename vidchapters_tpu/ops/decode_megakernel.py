"""Cross-layer decode-step megakernel (Pallas TPU).

The autoregressive beam loop is bound by per-op execution overhead: at
bs16/beam-4 a step costs ~11.7 ms across ~300 small HLO ops while its
memory traffic is worth ~1 ms (BENCH_NOTES.md "Decode"); per-layer fused
kernels made it WORSE because their per-(batch, head) grids dispatched
~768 tiny programs per call.  This kernel runs ONE Pallas program per
decode step covering all decoder layers:

- grid ``(num_layers, batch_blocks)`` — TPU grids execute sequentially, so
  the hidden state lives in a VMEM scratch carried across grid cells while
  per-layer weights and per-block KV caches stream through VMEM blocks
  (pipelined by Pallas; a weight block is fetched once per layer because
  its index map is constant along the inner grid dimension);
- self-attention attends over the streamed cache rows ``< index`` plus the
  current token's in-VMEM k/v (an online-softmax extra row), so the kernel
  never rewrites the cache: the new k/v rows are kernel outputs and the
  caches are updated OUTSIDE by two ``dynamic_update_slice`` ops on
  layer-stacked buffers — O(1) HLO ops instead of O(layers);
- cross-attention KV is per-example (beam-invariant), stacked
  ``[B0, N, LencP, inner]`` and streamed per block.

Mosaic constraints (measured on v5e via ops_probe_tpu.py) shape the data
layout: at most ONE batch dim per in-kernel dot, no reshapes that split a
minor dim, and 5-D BlockSpecs return wrong data — so everything stays in
the ``[rows, inner]`` lane layout and per-head reductions go through the
MXU with a constant 0/1 segment matrix ``SEG [inner, H]``:

    scores[l, h] = ((K[l, :] * q) @ SEG)[h]         (per-head q.k)
    ctx[h*dkv+d] = diag_h( V^T P )                   (per-head P.V)

Per step the whole program issues ~25 HLO ops (embed, kernel, 2 cache
updates, logits, loop logic) instead of ~300.  Semantics mirror
models/t5.py's incremental decode branch (T5 pre-norm blocks, unscaled
qk^T, shared rel-pos bias row, RMSNorm in fp32); parity is tested against
the reference decode path in tests/test_decode_megakernel.py.  Reference
hot loop: HF ``generate`` beam-4 x 256 steps (model/vid2seq.py:150-162).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
NEG_INF = -1e9

# int8 cross-KV cache (per-lane absmax scales; k-scale folds into q,
# v-scale into the context — wiring is exactly the dequantized math, see
# tests).  Halves the cross cache's HBM residency (651 -> 326 MB at
# bs16/beam-4/enc-1100) but measured throughput-NEUTRAL on v5e (15.75 vs
# 15.66 videos/s): the cross section is VPU-compute-bound, not DMA-bound,
# and the int8->bf16 converts absorb the bandwidth win.  Default OFF so
# decode stays bit-exact with the unquantized path; enable (True) for
# memory-constrained serving (longer encoders / bigger batches).
QUANTIZE_CROSS_KV = False

# Self-cache chunk rows for the prefix-skip grid dimension: small enough
# that early decode steps skip most of the cache stream, large enough to
# keep the grid-cell count modest (256-slot cache -> 2 chunks; measured
# on v5e: 64-row chunks' extra cells cost more than their skipped DMA at
# worst-case decode length).  Lengths not divisible by it fall back to a
# single full-length chunk.
CACHE_CHUNK = 128

# Attention score/context reductions on the MXU via a block-diagonal q
# build (qbd[r, d, h] = q[r, d] * seg[d, h]) and one-batch-dim dot_generals
# that keep the [rows, inner] lane layout (no head-major relayouts — the
# v4 mistake).  Spends H-times redundant MXU FLOPs to delete the
# [rows, L, inner] elementwise product/reduce chains the VPU was burning
# ~40% of the step on.  fp32 mode keeps the VPU formulation so decode
# stays bit-exact with the standard path / HF.
MXU_SEGMENTS = True

# Rows per batch block (None = group * max(1, 8 // group)).  With the VPU
# segment products this was best at 8 (v7: 16 rows regressed); the MXU
# formulation changes the calculus — bigger blocks halve the grid-cell
# count AND raise MXU row occupancy.
BATCH_BLOCK_ROWS = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mega_kernel(idx_sp, x_in, ln, wqkv, wo_s, wq_c, wo_c, wi, wo_f, fln,
                 bias_row, bias0, seg, seg_t, selg, segrep, encmask,
                 kc, vc, kx, vx,
                 kxs, vxs, x_out, knew, vnew, xs, q2s, ms, dens, ctxs,
                 *, n_layers: int, bb: int, group: int, heads: int,
                 dkv: int, eps: float, cdt, chunk: int, n_chunks: int,
                 quant: bool, mxu: bool, gated: bool = False,
                 src_ref=None, kc_out=None, vc_out=None):
    """One (layer, batch-block, cache-chunk) grid cell; layouts in the
    module docstring.

    All attention math is batched over the block's rows — no per-row
    loops, no transposed matmul operands (seg/seg_t give both contraction
    orientations), at most one free+contract matmul shape per op.

    The self cache streams in ``chunk``-row pieces along a third grid
    dimension; chunks whose rows are all >= ``idx`` are DEAD — their index
    map clamps to the last live chunk (consecutive identical block indices
    skip the DMA) and their compute is skipped, so per-step cache traffic
    is proportional to the decoded prefix, paged-attention style.  The
    online-softmax state (running max / denom / unnormalised context)
    lives in VMEM scratch across the chunk cells; projections, the
    current-token row, cross-attention and the FF run once per
    (layer, block) in the first/last chunk cells.

    With ``src_ref`` (beam search), the previous step's beam permutation
    is applied HERE: cache rows are gathered in VMEM while the (live)
    chunk is resident anyway and the permuted chunk is written back
    through the aliased ``kc_out``/``vc_out`` — the separate 2.4 GB
    reorder pass disappears (beams only permute within an example, so
    every source row lives in the same block).
    """
    i = pl.program_id(0)
    b = pl.program_id(1)
    c = pl.program_id(2)
    idx = idx_sp[0]
    inner = heads * dkv
    f32 = jnp.float32
    # live chunks include the append-target chunk (row ``idx``) so the
    # in-kernel row insert below always lands in a streamed+written chunk
    live = idx // chunk + 1

    def rms(x, w):
        xf = x.astype(f32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (w[None, :] * (xf * jax.lax.rsqrt(var + eps))).astype(cdt)

    def mm(a, w):
        # mirror flax Dense(dtype=cdt): f32 accumulation, one rounding
        return jnp.dot(a.astype(cdt), w,
                       preferred_element_type=f32).astype(cdt)

    seg_c = seg[...].astype(cdt)                     # [inner, H] 0/1
    seg_tc = seg_t[...].astype(cdt)                  # [H, inner]

    def head_scores(prod):
        """[..., inner] q*k products -> per-head scores [..., H]:
        contract inner against the segment matrix (clean [M,K]@[K,N])."""
        nd = prod.ndim
        return jax.lax.dot_general(
            prod, seg_c, (((nd - 1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def expand_heads(p):
        """[..., H] per-head values -> [..., inner] broadcast across each
        head's dkv lanes (0/1 matmul, no transpose)."""
        nd = p.ndim
        return jax.lax.dot_general(
            p.astype(cdt), seg_tc, (((nd - 1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(cdt)

    def expand_heads_f32(p):
        nd = p.ndim
        return jax.lax.dot_general(
            p, seg_t[...], (((nd - 1,), (0,)), ((), ())),
            preferred_element_type=f32)

    # ---- first chunk cell: projections + accumulator reset ----
    @pl.when(jnp.logical_and(i == 0, c == 0))
    def _():
        xs[b] = x_in[...]

    @pl.when(c == 0)
    def _():
        x = xs[b]                                    # [bb, d] cdt
        h = rms(x, ln[0, 0])
        qkv = mm(h, wqkv[0])                         # [bb, 3*inner]
        q2s[...] = qkv[:, :inner]
        knew[...] = qkv[:, inner:2 * inner]
        vnew[...] = qkv[:, 2 * inner:]
        ms[...] = jnp.full_like(ms[...], NEG_INF)
        dens[...] = jnp.zeros_like(dens[...])
        ctxs[...] = jnp.zeros_like(ctxs[...])

    # ---- live chunk cells: online-softmax partial over cache rows ----
    @pl.when(c < live)
    def _():
        q2 = q2s[...]
        if src_ref is not None:
            # dynamic row reads must go through the REF (dynamic_slice on
            # a loaded value has no Mosaic lowering)
            base = b * bb
            kcb = jnp.stack([kc[src_ref[0, base + r] - base, 0]
                             for r in range(bb)], axis=0)
            vcb = jnp.stack([vc[src_ref[0, base + r] - base, 0]
                             for r in range(bb)], axis=0)
            # the current token's k/v row is appended HERE (row idx of the
            # last live chunk) during the permutation write-back — the two
            # 0.57 ms dynamic_update_slice ops outside disappear.  The
            # inserted row is invisible to this step's scores (masked to
            # rows < idx); projections ran in the c == 0 cell so the knew /
            # vnew output blocks (constant index over c) hold the rows.
            rows_c = jax.lax.broadcasted_iota(
                jnp.int32, (bb, chunk, inner), 1) + c * chunk
            at_new = rows_c == idx
            kc_out[:, 0] = jnp.where(at_new, knew[...][:, None, :], kcb)
            vc_out[:, 0] = jnp.where(at_new, vnew[...][:, None, :], vcb)
        else:
            kcb = kc[:, 0]                           # [bb, C, inner]
            vcb = vc[:, 0]
        if mxu:
            # block-diagonal q: qbd[r, d, h] = q[r, d] * seg[d, h]; the
            # per-head q.k reduction becomes ONE batched (1 batch dim) MXU
            # dot in the native [rows, inner] layout
            # minor-dim insertion must happen on a 32-bit type (Mosaic)
            qbd = (q2.astype(f32)[:, :, None] * seg[...][None]).astype(cdt)
            s = jax.lax.dot_general(
                kcb.astype(cdt), qbd, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)          # [bb, C, H]
            s = s + bias_row[pl.ds(c * chunk, chunk)][None]
        else:
            prod = (kcb * q2[:, None, :]).astype(cdt)    # [bb, C, inner]
            s = head_scores(prod) + bias_row[pl.ds(c * chunk, chunk)][None]
        row_ids = (jax.lax.broadcasted_iota(jnp.int32, (bb, chunk, heads), 1)
                   + c * chunk)
        s = jnp.where(row_ids < idx, s, NEG_INF)     # [bb, C, H] f32
        m_new = jnp.maximum(ms[...], jnp.max(s, axis=1))
        scale = jnp.exp(ms[...] - m_new)             # [bb, H]
        # explicit zero for masked rows: when a chunk has NO valid row,
        # m_new == NEG_INF and exp(s - m_new) would be exp(0) == 1
        e = jnp.where(row_ids < idx, jnp.exp(s - m_new[:, None, :]), 0.0)
        dens[...] = dens[...] * scale + jnp.sum(e, axis=1)
        if mxu:
            # ctx2[r, h, d] = sum_l e[r, l, h] v[r, l, d]: batched MXU dot,
            # then the head-select collapse is a tiny [bb, H, inner] VPU op
            ctx2 = jax.lax.dot_general(
                e.astype(cdt), vcb.astype(cdt), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)          # [bb, H, inner]
            part = jnp.sum(ctx2 * seg_t[...][None], axis=1)  # [bb, inner]
        else:
            p_exp = expand_heads(e)                  # [bb, C, inner]
            part = jnp.sum((p_exp * vcb).astype(f32), axis=1)
        ctxs[...] = ctxs[...] * expand_heads_f32(scale) + part
        ms[...] = m_new

    # ---- last chunk cell: current-token row, cross-attention, FF ----
    @pl.when(c == n_chunks - 1)
    def _():
        x = xs[b]
        q2 = q2s[...]
        k_new = knew[...]
        v_new = vnew[...]
        s_new = head_scores((q2 * k_new).astype(cdt)) + bias0[...]  # [bb, H]
        m = jnp.maximum(ms[...], s_new)
        scale = jnp.exp(ms[...] - m)                 # [bb, H]
        e_new = jnp.exp(s_new - m)                   # [bb, H]
        denom = dens[...] * scale + e_new            # [bb, H]
        ctx = (ctxs[...] * expand_heads_f32(scale)
               + expand_heads_f32(e_new) * v_new.astype(f32))
        ctx = (ctx / expand_heads_f32(denom)).astype(cdt)
        x = x + mm(ctx, wo_s[0])

        # ---- cross-attention (per-example KV shared across beams) ----
        kxb = kx[:, 0]                               # [bbE, LencP, inner]
        vxb = vx[:, 0]
        h = rms(x, ln[0, 1])
        qc = mm(h, wq_c[0])                          # [bb, inner]
        ctx_parts = []
        n_ex = bb // group
        for e_i in range(n_ex):
            qe = qc[e_i * group:(e_i + 1) * group]   # [g, inner]
            if quant:
                # int8 cross KV: the per-lane k-scale folds into q BEFORE
                # the product (exactly dequantizing k), the per-lane
                # v-scale folds into the summed context AFTER — two
                # [g, inner] multiplies instead of [LencP, inner] dequants
                qe = qe * kxs[e_i, 0, 0][None, :].astype(cdt)
            kxe = kxb[e_i].astype(cdt)               # int8 -> cdt if quant
            # encmask is the FULL [B0, LencP] block (a bbe-row block would
            # violate the (8,128) block rule); dynamic row read as in
            # decode_attention.py:98
            if mxu:
                # block-diagonal q as ONE [inner, g*H] operand built with
                # an A^T.B dot against the static beam selector, then the
                # whole example's scores are a single clean 2-D MXU matmul
                # (free-dims dot_generals have no Mosaic lowering)
                qex = jax.lax.dot_general(
                    qe.astype(f32), selg[...], (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)      # [inner, g*H]
                qbd2d = (qex * segrep[...]).astype(cdt)
                s = jnp.dot(kxe, qbd2d,
                            preferred_element_type=f32)  # [LencP, g*H]
                valid = encmask[b * n_ex + e_i][:, None] > 0
                s = jnp.where(valid, s, NEG_INF)
                mx = jnp.max(s, axis=0, keepdims=True)
                e = jnp.exp(s - mx)
                p = e / jnp.sum(e, axis=0, keepdims=True)
                vxe = vxb[e_i].astype(cdt)
                ctx2d = jax.lax.dot_general(
                    p.astype(cdt), vxe, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)      # [g*H, inner]
                ctx3 = ctx2d.reshape(group, heads, inner)  # major-dim split
                part = jnp.sum(ctx3 * seg_t[...][None], axis=1)  # [g, inner]
            else:
                prod = (kxe[None] * qe[:, None, :]).astype(cdt)
                s = head_scores(prod)                # [g, LencP, H] f32
                valid = encmask[b * n_ex + e_i][None, :, None] > 0
                s = jnp.where(valid, s, NEG_INF)
                mx = jnp.max(s, axis=1, keepdims=True)
                e = jnp.exp(s - mx)
                p = e / jnp.sum(e, axis=1, keepdims=True)
                p_exp = expand_heads(p)              # [g, LencP, inner]
                vxe = vxb[e_i].astype(cdt)
                part = jnp.sum((p_exp * vxe[None]).astype(f32), axis=1)
            if quant:
                part = part * vxs[e_i, 0, 0][None, :]
            ctx_parts.append(part)
        ctx_c = (jnp.concatenate(ctx_parts, axis=0)
                 if n_ex > 1 else ctx_parts[0]).astype(cdt)  # [bb, inner]
        x = x + mm(ctx_c, wo_c[0])

        # ---- feed-forward: relu (t5-base) or gated-gelu (t5-v1_1) ----
        h = rms(x, ln[0, 2])
        hh_all = mm(h, wi[0])
        if gated:
            # wi streams as [d, 2*dff] (wi_0 | wi_1); HF "gated-gelu" is
            # gelu_new = tanh-approximate gelu (modeling_t5.py:314-342)
            dff = hh_all.shape[-1] // 2
            g = hh_all[:, :dff].astype(jnp.float32)
            lin = hh_all[:, dff:].astype(jnp.float32)
            act = 0.5 * g * (1.0 + jnp.tanh(
                0.7978845608028654 * (g + 0.044715 * g * g * g)))
            hh = (act * lin).astype(cdt)
        else:
            hh = jnp.maximum(hh_all, 0.0).astype(cdt)
        x = x + mm(hh, wo_f[0])

        xs[b] = x

        @pl.when(i == n_layers - 1)
        def _():
            x_out[...] = rms(x, fln[0])

        @pl.when(i < n_layers - 1)
        def _():
            x_out[...] = x


def segment_matrix(heads: int, dkv: int) -> np.ndarray:
    """[inner, H] 0/1 matrix: column h selects head h's 64-lane segment."""
    inner = heads * dkv
    seg = np.zeros((inner, heads), np.float32)
    for h in range(heads):
        seg[h * dkv:(h + 1) * dkv, h] = 1.0
    return seg


def mega_decode_step(stacked: Dict[str, Array], x: Array,
                     k_cache: Array, v_cache: Array,
                     k_cross: Array, v_cross: Array,
                     bias_row: Array, bias0: Array, enc_mask: Array,
                     cache_index: Array, group: int, heads: int,
                     eps: float = 1e-6, bb: int = 8,
                     src: "Array | None" = None,
                     k_cross_scale: "Array | None" = None,
                     v_cross_scale: "Array | None" = None,
                     interpret: bool = False, gated: bool = False):
    """One full decoder step over all layers.

    x [B, d] (token embeds, compute dtype); caches [B, N, L, inner];
    cross KV [B0, N, LencP, inner] (B0 = B/group); bias_row [L, H] f32;
    bias0 [1, H] f32; enc_mask [B0, LencP] int.  Returns (hidden [B, d]
    after final norm, k_new [B, N, inner], v_new same) — caller scatters
    the new rows into the caches at ``cache_index``.

    With ``src`` [B] int32 (beam search), the caches are first permuted
    by rows in-kernel (the deferred previous-step beam reorder) and the
    permuted caches are returned as two extra outputs (donated buffers).
    """
    bsz, d = x.shape
    _, n_layers, l, inner = k_cache.shape
    b0, _, lencp, _ = k_cross.shape
    assert bsz % bb == 0 and bb % group == 0, (bsz, bb, group)
    assert inner % heads == 0
    dkv = inner // heads
    bbe = bb // group
    n_blocks = bsz // bb
    cdt = x.dtype
    d_ff_in = stacked["wi"].shape[2]   # 2*dff when gated (wi_0 | wi_1)
    d_ff_out = stacked["wo_ff"].shape[1]
    # cache chunking (prefix-skip): dead chunks clamp their index map to
    # the last live chunk — no DMA — and skip compute
    chunk = CACHE_CHUNK if l % CACHE_CHUNK == 0 else l
    n_chunks = l // chunk

    quant = k_cross_scale is not None
    if not quant:
        # dummy scale blocks (never read; static `quant` gates the loads)
        k_cross_scale = jnp.ones((b0, n_layers, 1, inner), jnp.float32)
        v_cross_scale = k_cross_scale

    idx = jnp.asarray(cache_index, jnp.int32).reshape(1)
    seg_np = segment_matrix(heads, dkv)
    seg = jnp.asarray(seg_np)
    seg_t = jnp.asarray(np.ascontiguousarray(seg_np.T))
    # static cross-attention MXU operands: beam selector [g, g*H] and the
    # per-beam tiled segment matrix [inner, g*H]
    selg_np = np.zeros((group, group * heads), np.float32)
    for gg in range(group):
        selg_np[gg, gg * heads:(gg + 1) * heads] = 1.0
    selg = jnp.asarray(selg_np)
    segrep = jnp.asarray(np.tile(seg_np, (1, group)))
    # MXU segment reductions engage for bf16 compute; fp32 keeps the VPU
    # formulation so decode stays bit-exact with the standard path / HF
    mxu = bool(MXU_SEGMENTS) and cdt == jnp.bfloat16
    kernel = functools.partial(
        _mega_kernel, n_layers=n_layers, bb=bb, group=group, heads=heads,
        dkv=dkv, eps=eps, cdt=cdt, chunk=chunk, n_chunks=n_chunks,
        quant=quant, mxu=mxu, gated=gated)

    def chunk_clamped(c, idx_ref):
        live = idx_ref[0] // chunk + 1
        return jnp.minimum(c, live - 1)

    wspec = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda i, b, c, s: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    const2 = lambda s0, s1: pl.BlockSpec((s0, s1), lambda i, b, c, s: (0, 0),
                                         memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec((bb, 1, chunk, inner),
                              lambda i, b, c, s: (b, i, chunk_clamped(c, s), 0),
                              memory_space=pltpu.VMEM)
    cross_spec = pl.BlockSpec((bbe, 1, lencp, inner),
                              lambda i, b, c, s: (b, i, 0, 0),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((bb, d), lambda i, b, c, s: (b, 0),
                            memory_space=pltpu.VMEM)
    # new k/v rows land in a 2-D [B, N*inner] output (lane-offset i*inner)
    # so the block shape satisfies the (8, 128) rule
    new_spec = pl.BlockSpec((bb, inner), lambda i, b, c, s: (b, i),
                            memory_space=pltpu.VMEM)

    in_specs = [
        row_spec,                                        # x
        wspec(3, d),                                     # ln
        wspec(d, 3 * inner),                             # wqkv
        wspec(inner, d),                                 # wo_self
        wspec(d, inner),                                 # wq_cross
        wspec(inner, d),                                 # wo_cross
        wspec(d, d_ff_in),                               # wi
        wspec(d_ff_out, d),                              # wo_ff
        const2(1, d),                                    # final ln
        const2(l, heads),                                # bias_row
        const2(1, heads),                                # bias0
        const2(inner, heads),                            # seg
        const2(heads, inner),                            # seg_t
        const2(group, group * heads),                    # selg
        const2(inner, group * heads),                    # segrep
        pl.BlockSpec((b0, lencp), lambda i, b, c, s: (0, 0),
                     memory_space=pltpu.VMEM),           # enc mask (full)
        cache_spec,                                      # k cache
        cache_spec,                                      # v cache
        cross_spec,                                      # k cross
        cross_spec,                                      # v cross
        # per-lane int8 scales (dummies when quant is off); (1, inner)
        # trailing block dims equal the array dims, satisfying the tile rule
        pl.BlockSpec((bbe, 1, 1, inner), lambda i, b, c, s: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),           # k cross scale
        pl.BlockSpec((bbe, 1, 1, inner), lambda i, b, c, s: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),           # v cross scale
    ]
    out_specs = [row_spec, new_spec, new_spec]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, d), cdt),
        jax.ShapeDtypeStruct((bsz, n_layers * inner), cdt),
        jax.ShapeDtypeStruct((bsz, n_layers * inner), cdt),
    ]
    args = [x, stacked["ln"], stacked["wqkv"], stacked["wo_self"],
            stacked["wq_cross"], stacked["wo_cross"], stacked["wi"],
            stacked["wo_ff"], stacked["final_ln"], bias_row, bias0, seg,
            seg_t, selg, segrep, enc_mask, k_cache, v_cache, k_cross,
            v_cross, k_cross_scale, v_cross_scale]
    aliases = {}
    scratch = [
        pltpu.VMEM((n_blocks, bb, d), cdt),              # xs
        pltpu.VMEM((bb, inner), cdt),                    # q2s
        pltpu.VMEM((bb, heads), jnp.float32),            # ms
        pltpu.VMEM((bb, heads), jnp.float32),            # dens
        pltpu.VMEM((bb, inner), jnp.float32),            # ctxs
    ]

    if src is not None:
        # deferred beam permutation: src after the scalar idx; permuted
        # caches out (aliased to the cache inputs)
        def kernel_fn(idx_sp, src_ref, x_in, ln_r, wqkv_r, wo_s, wq_c,
                      wo_c, wi_r, wo_f, fln, bias_r, bias0_r, seg_r,
                      seg_t_r, selg_r, segrep_r, encmask, kc, vc, kx, vx,
                      kxs, vxs, x_out, knew, vnew, kc_out, vc_out,
                      xs, q2s, ms, dens, ctxs):
            kernel(idx_sp, x_in, ln_r, wqkv_r, wo_s, wq_c, wo_c, wi_r,
                   wo_f, fln, bias_r, bias0_r, seg_r, seg_t_r, selg_r,
                   segrep_r, encmask, kc, vc, kx, vx, kxs, vxs,
                   x_out, knew, vnew, xs, q2s, ms, dens, ctxs,
                   src_ref=src_ref, kc_out=kc_out, vc_out=vc_out)

        in_specs.insert(0, pl.BlockSpec((1, bsz), lambda i, b, c, s: (0, 0),
                                        memory_space=pltpu.SMEM))
        args.insert(0, jnp.asarray(src, jnp.int32).reshape(1, bsz))
        out_specs += [cache_spec, cache_spec]
        out_shape += [jax.ShapeDtypeStruct(k_cache.shape, cdt),
                      jax.ShapeDtypeStruct(v_cache.shape, cdt)]
        # input indices include the scalar-prefetch operand (idx, src,
        # then 16 smalls) -> k/v cache inputs at 18/19
        aliases = {18: 3, 19: 4}
    else:
        kernel_fn = kernel

    out = pl.pallas_call(
        kernel_fn,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_layers, n_blocks, n_chunks),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        ),
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(idx, *args)
    hidden, k_new, v_new = out[:3]
    k_new = k_new.reshape(bsz, n_layers, inner)
    v_new = v_new.reshape(bsz, n_layers, inner)
    if src is not None:
        return hidden, k_new, v_new, out[3], out[4]
    return hidden, k_new, v_new


# ---------------------------------------------------------------------------
# Host-side: weight stacking, bias table, DecodeFns integration
# ---------------------------------------------------------------------------


def stack_decoder_weights(t5_params: Dict[str, Any], cfg,
                          dtype=None) -> Dict[str, Array]:
    """Stack the per-layer decoder weights into layer-major arrays the
    kernel streams (packed qkv for self-attention).  ``t5_params`` is the
    T5ForConditionalGeneration param tree."""
    cdt = jnp.dtype(dtype or cfg.dtype)
    dec = t5_params["decoder"]
    n = cfg.num_decoder_layers

    def _unfuse(attn):
        """T5Config.fused_qkv packed kernels -> separate q/k/v views (one
        slice+reshape per projection at generate-fn setup; the kernel's own
        streaming layout re-packs below either way). The packed-layout
        format itself lives in torch_import._unfuse_attn."""
        from vidchapters_tpu.models.torch_import import _unfuse_attn

        return _unfuse_attn(attn, xp=jnp)

    def _unfuse_block(blk):
        new = dict(blk)
        for a in ("self_attn", "cross_attn"):
            if a in blk:
                new[a] = _unfuse(blk[a])
        return new

    dec = {k: (_unfuse_block(v) if k == "blocks" or k.startswith("block_")
               else v) for k, v in dec.items()}

    if "blocks" in dec:
        # scanned layout (T5Config.scan_layers): params already carry the
        # leading [N] layer axis this kernel streams — no restacking
        blk = dec["blocks"]

        def gs(*path):
            node = blk
            for p in path:
                node = node[p]
            return jnp.asarray(node)

        return {
            "ln": jnp.stack([gs("self_attn_norm", "weight"),
                             gs("cross_attn_norm", "weight"),
                             gs("ff_norm", "weight")],
                            axis=1).astype(jnp.float32),   # [N, 3, d]
            "wqkv": jnp.concatenate(
                [gs("self_attn", "q", "kernel"),
                 gs("self_attn", "k", "kernel"),
                 gs("self_attn", "v", "kernel")],
                axis=2).astype(cdt),                        # [N, d, 3*inner]
            "wo_self": gs("self_attn", "o", "kernel").astype(cdt),
            "wq_cross": gs("cross_attn", "q", "kernel").astype(cdt),
            "wo_cross": gs("cross_attn", "o", "kernel").astype(cdt),
            "wi": (jnp.concatenate([gs("ff", "wi_0", "kernel"),
                                    gs("ff", "wi_1", "kernel")], axis=2)
                   if cfg.is_gated_act
                   else gs("ff", "wi", "kernel")).astype(cdt),
            "wo_ff": gs("ff", "wo", "kernel").astype(cdt),
            "final_ln": jnp.asarray(
                dec["final_norm"]["weight"])[None].astype(jnp.float32),
            "wk_cross": gs("cross_attn", "k", "kernel").astype(cdt),
            "wv_cross": gs("cross_attn", "v", "kernel").astype(cdt),
        }

    def g(i, *path):
        node = dec[f"block_{i}"]
        for p in path:
            node = node[p]
        return jnp.asarray(node)

    ln = jnp.stack([
        jnp.stack([g(i, "self_attn_norm", "weight"),
                   g(i, "cross_attn_norm", "weight"),
                   g(i, "ff_norm", "weight")]) for i in range(n)
    ]).astype(jnp.float32)                           # [N, 3, d]
    wqkv = jnp.stack([
        jnp.concatenate([g(i, "self_attn", "q", "kernel"),
                         g(i, "self_attn", "k", "kernel"),
                         g(i, "self_attn", "v", "kernel")], axis=1)
        for i in range(n)]).astype(cdt)              # [N, d, 3*inner]
    return {
        "ln": ln,
        "wqkv": wqkv,
        "wo_self": jnp.stack([g(i, "self_attn", "o", "kernel")
                              for i in range(n)]).astype(cdt),
        "wq_cross": jnp.stack([g(i, "cross_attn", "q", "kernel")
                               for i in range(n)]).astype(cdt),
        "wo_cross": jnp.stack([g(i, "cross_attn", "o", "kernel")
                               for i in range(n)]).astype(cdt),
        "wi": (jnp.stack([jnp.concatenate(
                              [g(i, "ff", "wi_0", "kernel"),
                               g(i, "ff", "wi_1", "kernel")], axis=1)
                          for i in range(n)])
               if cfg.is_gated_act
               else jnp.stack([g(i, "ff", "wi", "kernel")
                               for i in range(n)])).astype(cdt),
        "wo_ff": jnp.stack([g(i, "ff", "wo", "kernel")
                            for i in range(n)]).astype(cdt),
        "final_ln": jnp.asarray(
            dec["final_norm"]["weight"])[None].astype(jnp.float32),
        # cross-attention K/V projections: used once per generate call to
        # precompute the stacked cross KV from the encoder output
        "wk_cross": jnp.stack([g(i, "cross_attn", "k", "kernel")
                               for i in range(n)]).astype(cdt),
        "wv_cross": jnp.stack([g(i, "cross_attn", "v", "kernel")
                               for i in range(n)]).astype(cdt),
    }


def precompute_bias_table(t5_params: Dict[str, Any], cfg,
                          max_len: int) -> Array:
    """[Lq, Lk, H] decoder rel-pos bias for every slot pair (one dynamic
    slice per step instead of a bucket gather)."""
    from vidchapters_tpu.models.t5 import relative_position_bucket

    emb = jnp.asarray(
        t5_params["decoder"]["rel_bias"]["rel_embedding"]).astype(jnp.float32)
    ctx = jnp.arange(max_len)[:, None]
    mem = jnp.arange(max_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, False, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    return emb[buckets]                              # [Lq, Lk, H]


def make_mega_decode_fns(cfg, t5_params: Dict[str, Any], max_length: int,
                         num_beams: int = 1, interpret: bool = False):
    """DecodeFns (ops/decoding.py) backed by the megakernel.

    ``init_cache(batch, enc_out)`` receives the per-BEAM batch (B = B0 *
    beams, matching beam_search's ``init_cache(batch * K, enc_out)`` call
    with per-example ``enc_out``); the cache pytree keeps batch on axis 0
    so the beam-reorder gather works unchanged, and cross KV sits under a
    "cross" key so the reorder skips it.
    """
    from vidchapters_tpu.ops.decoding import DecodeFns

    cdt = jnp.dtype(cfg.dtype)
    group = max(1, num_beams)
    bb = BATCH_BLOCK_ROWS or group * max(1, 8 // group)
    stacked = stack_decoder_weights(t5_params, cfg)
    bias_all = precompute_bias_table(t5_params, cfg, max_length)
    emb = jnp.asarray(t5_params["shared"]["embedding"])
    # logits operand pre-transposed ONCE: the per-step
    # einsum("bd,vd->bv") was re-laying out the 49 MB table every
    # iteration inside the decode loop (measured 0.74 ms/step on v5e)
    emb_t = jnp.swapaxes(emb, 0, 1).astype(cdt)  # materialized pre-loop
    heads = cfg.num_heads
    inner = heads * cfg.d_kv
    n = cfg.num_decoder_layers

    quantize = (QUANTIZE_CROSS_KV if QUANTIZE_CROSS_KV is not None
                else cdt == jnp.bfloat16)

    def _quantize_lanes(a: Array):
        """[B0, N, L, inner] -> (int8 values, [B0, N, 1, inner] f32 scales)
        with per-lane absmax scaling."""
        amax = jnp.max(jnp.abs(a), axis=2, keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
        q = jnp.clip(jnp.round(a.astype(jnp.float32) / scale), -127, 127)
        return q.astype(jnp.int8), scale

    def init_cache(batch: int, enc_out: Array):
        b0, lenc, _ = enc_out.shape
        # int8 arrays tile sublanes by 32 — round the padded length up
        lencp = _round_up(lenc, 32 if quantize else 16)
        enc = enc_out.astype(cdt)
        kx = jnp.einsum("bld,ndi->bnli", enc, stacked["wk_cross"],
                        preferred_element_type=jnp.float32).astype(cdt)
        vx = jnp.einsum("bld,ndi->bnli", enc, stacked["wv_cross"],
                        preferred_element_type=jnp.float32).astype(cdt)
        pad = [(0, 0), (0, 0), (0, lencp - lenc), (0, 0)]
        cross = {"k": jnp.pad(kx, pad), "v": jnp.pad(vx, pad)}
        if quantize:
            cross["k"], cross["k_scale"] = _quantize_lanes(cross["k"])
            cross["v"], cross["v_scale"] = _quantize_lanes(cross["v"])
        cache = {
            "self_k": jnp.zeros((batch, n, max_length, inner), cdt),
            "self_v": jnp.zeros((batch, n, max_length, inner), cdt),
            "cross": cross,
        }
        if group > 1:
            # beam search: the beam permutation is DEFERRED — stored here
            # by reorder_cache and applied inside the next step's kernel
            # while the cache streams through VMEM anyway
            cache["pending_src"] = jnp.arange(batch, dtype=jnp.int32)
        return cache

    def step(tokens: Array, cache, index, enc_mask: Array):
        x = emb[tokens].astype(cdt)                   # [B, d]
        bias_row = jax.lax.dynamic_slice(
            bias_all, (index, 0, 0), (1, max_length, heads))[0]
        bias0 = bias_all[0, :1, :][0][None]           # distance-0 bias [1, H]
        lencp = cache["cross"]["k"].shape[2]
        mask_p = jnp.pad(enc_mask.astype(jnp.int32),
                         [(0, 0), (0, lencp - enc_mask.shape[1])])
        src = cache.get("pending_src")
        out = mega_decode_step(
            stacked, x, cache["self_k"], cache["self_v"],
            cache["cross"]["k"], cache["cross"]["v"],
            bias_row, bias0, mask_p, index, group, heads,
            eps=cfg.layer_norm_epsilon, bb=bb, src=src,
            k_cross_scale=cache["cross"].get("k_scale"),
            v_cross_scale=cache["cross"].get("v_scale"),
            interpret=interpret, gated=cfg.is_gated_act)
        if src is not None:
            # the kernel already appended the k/v rows during the
            # permutation write-back — no DUS needed
            hidden, k_new, v_new, self_k, self_v = out
            # the permutation has been APPLIED — reset pending_src to the
            # identity so a caller that skips reorder_cache on some step
            # gets a no-op instead of a stale re-permutation
            new_cache = {"self_k": self_k, "self_v": self_v,
                         "cross": cache["cross"],
                         "pending_src": jnp.arange(x.shape[0],
                                                   dtype=jnp.int32)}
        else:
            hidden, k_new, v_new = out
            new_cache = {
                "self_k": jax.lax.dynamic_update_slice(
                    cache["self_k"], k_new[:, :, None, :], (0, 0, index, 0)),
                "self_v": jax.lax.dynamic_update_slice(
                    cache["self_v"], v_new[:, :, None, :], (0, 0, index, 0)),
                "cross": cache["cross"],
            }
        # tied-embedding logits (models/t5.py logits_from_hidden)
        if cfg.tie_word_embeddings:
            hidden = hidden * (cfg.d_model ** -0.5)
            logits = jnp.dot(hidden, emb_t.astype(hidden.dtype),
                             preferred_element_type=jnp.float32)
        else:
            lm = jnp.asarray(t5_params["lm_head"]["kernel"]).astype(cdt)
            logits = hidden @ lm
        return logits.astype(jnp.float32), new_cache

    def reorder_cache(cache, flat_src):
        return {**cache, "pending_src": flat_src.astype(jnp.int32)}

    return DecodeFns(init_cache, step,
                     reorder_cache if group > 1 else None)
