"""Cross-layer Whisper decode-step megakernel (Pallas TPU).

The ASR factory's hot loop is the large-v2 autoregressive decode
(asr_extract/whisper_inference.py drives faster-whisper; our JAX path is
factory/whisper_transcribe.py). The unrolled incremental step issues
~1000 HLO ops across 32 decoder layers and measures ~19 ms at bf16/bs16
(112 audio-s/s) while its memory traffic — 1.47 GB of weights + ~0.4 GB
of cross KV per step — is worth ~2.3 ms. This kernel runs ONE Pallas
program per decode step covering all decoder layers, the same design as
ops/decode_megakernel.py with Whisper's differences:

- LayerNorm (mean+var, scale+bias) instead of RMSNorm; biases on q/v/out
  projections and the FF (k projection is bias-free: its packed bias rows
  are zeros);
- q scaled by d_head**-0.5 after projection (models/whisper.py:84); no
  relative position bias; the current token's cache row is INCLUDED in
  self-attention (pos <= cache_index) via an online extra row;
- exact (erf) GELU in the FF — Mosaic has no erf lowering, so the kernel
  evaluates the Abramowitz-Stegun 7.1.26 polynomial (|err| <= 1.5e-7,
  below bf16/f32 working precision; parity-tested against XLA's erf);
- cross-attention KV covers the full 1500-frame encoding (no key mask;
  only the 1504-padding rows are masked) and is int8-quantized per lane
  by default at large-v2 scale — the 32-layer bf16 weights alone occupy
  ~92 MB of double-buffered VMEM, so the cross blocks must halve to fit
  the 128 MB budget (wiring is exactly the dequantized math: k-scale
  folds into q, v-scale into the context, as in decode_megakernel v6).

Score/context reductions use the MXU block-diagonal-q formulation
measured fastest in round 3 (free-dims dot_generals have no Mosaic
lowering; batched one-batch-dim dots and A^T.B 2-D dots work).

Round 4 brings the kernel to decode_megakernel's full structure:
- the self cache streams in CACHE_CHUNK-row pieces along a third grid
  dimension with prefix-skip (dead chunks clamp their index map — no
  DMA — and skip compute), online-softmax state in VMEM scratch;
- beam search DEFERS the beam permutation into the next step's kernel
  (src in SMEM, in-VMEM row gather, aliased cache write-back with
  in-kernel new-row append) — the out-of-kernel one-hot-matmul reorder
  moved read+write 2x the full cache per step and forced a full-cache
  layout copy that put bs32/beam-5 over HBM;
- cross-attention batches each example's beams into one [LencP, g*H]
  MXU matmul via a static beam selector (the per-row loop issued thin
  [LencP, H] matmuls).
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

# int8 per-lane cross-KV quantization. None = auto (on when the model is
# large enough that bf16 cross blocks would blow VMEM); True/False force.
QUANTIZE_CROSS_KV = None

# rows per batch block: large-v2's 46 MB/layer weight blocks leave room
# for only small cache blocks at the 128 MB VMEM budget
BATCH_BLOCK_ROWS = 2

# self-cache chunk rows (prefix-skip streaming): dead chunks clamp their
# index map to the last live chunk — no DMA — and skip compute, so
# per-step cache traffic is proportional to the decoded prefix
# (decode_megakernel's paged-attention-style design). Must divide the
# cache length and be a multiple of 8; lengths it does not divide fall
# back to a single full-length chunk. Hardware round-4: chunking LOSES
# for greedy at bb=2 (bs32 greedy 207 vs 234 — per-cell overhead exceeds
# the prefix-skip savings), so group==1 runs a single full-length chunk;
# the beam chunk matrix is in BENCH_NOTES round 4.
import os as _os

CACHE_CHUNK = int(_os.environ.get("WHISPER_CACHE_CHUNK", "56"))
CHUNK_GREEDY = _os.environ.get("WHISPER_CHUNK_GREEDY", "0") == "1"
if CACHE_CHUNK % 8 != 0 or CACHE_CHUNK <= 0:
    raise ValueError(
        f"WHISPER_CACHE_CHUNK={CACHE_CHUNK} is invalid: the chunk is the "
        "sublane extent of the self-cache BlockSpec and Mosaic requires a "
        "positive multiple of 8 (see the module comment above).")


def _erf(x: Array) -> Array:
    """Abramowitz-Stegun 7.1.26 erf (f32): max abs error 1.5e-7."""
    t = 1.0 / (1.0 + 0.3275911 * jnp.abs(x))
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-x * x)
    return jnp.sign(x) * y


def gelu_erf(x: Array) -> Array:
    """Exact-form GELU via the polynomial erf (f32 in/out)."""
    return 0.5 * x * (1.0 + _erf(x * np.float32(0.7071067811865476)))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _whisper_kernel(idx_sp, x_in, lns, lnb, wqkv, bqkv, wo_s, bo_s, wq_c,
                    bq_c, wo_c, bo_c, wi, bi, wo_f, bo_f, seg, seg_t,
                    selg, segrep,
                    kc, vc, kx, vx, kxs, vxs,
                    x_out, knew, vnew, xs, q2s, ms, dens, ctxs,
                    *, n_layers: int, bb: int, heads: int, dkv: int,
                    lenc: int, cdt, quant: bool, group: int = 1,
                    chunk: int = 0, n_chunks: int = 1,
                    src_ref=None, kc_out=None, vc_out=None):
    """One (layer, batch-block, cache-chunk) grid cell; hidden state in
    VMEM scratch (decode_megakernel's structure with Whisper's math).

    The self cache streams in ``chunk``-row pieces along the third grid
    dimension; chunks whose rows are all >= ``idx`` are DEAD — their
    index map clamps to the last live chunk (consecutive identical block
    indices skip the DMA) and their compute is skipped, so per-step cache
    traffic is proportional to the decoded prefix. The online-softmax
    state (running max / denom / unnormalised context) lives in VMEM
    scratch across the chunk cells; projections run in the first chunk
    cell, the current-token row, cross-attention and the FF in the last.

    With ``src_ref`` (beam search), the previous step's beam permutation
    is applied HERE: cache rows are gathered in VMEM while the (live)
    chunk is resident anyway and written back through the aliased
    ``kc_out``/``vc_out`` — the separate multi-GB one-hot-matmul reorder
    pass (and its HBM layout copies) disappears. The current token's k/v
    row is appended during the same write-back.

    Cross-attention batches each example's ``group`` beams into one
    [LencP, g*H] MXU matmul via the static beam selector ``selg`` and the
    per-beam tiled segment matrix ``segrep`` (the round-3 per-row loop
    issued ``bb`` thin [LencP, H] matmuls)."""
    i = pl.program_id(0)
    b = pl.program_id(1)
    c = pl.program_id(2)
    idx = idx_sp[0]
    inner = heads * dkv
    f32 = jnp.float32
    scale = np.float32(dkv ** -0.5)
    live = idx // chunk + 1

    def ln(x, w, bias):
        xf = x.astype(f32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        return (w[None, :] * (xc * jax.lax.rsqrt(var + 1e-5))
                + bias[None, :]).astype(cdt)

    def mm(a, w, bias=None):
        out = jnp.dot(a.astype(cdt), w, preferred_element_type=f32)
        if bias is not None:
            out = out + bias.astype(f32)
        return out.astype(cdt)

    def expand_heads_f32(p):
        """[bb, H] per-head values -> [bb, inner] broadcast across each
        head's dkv lanes (0/1 matmul, no transpose)."""
        return jax.lax.dot_general(p, seg_t[...], (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    # ---- first chunk cell: projections + accumulator reset ----
    @pl.when(jnp.logical_and(i == 0, c == 0))
    def _():
        xs[b] = x_in[0]

    @pl.when(c == 0)
    def _():
        x = xs[b]
        h = ln(x, lns[0, 0], lnb[0, 0])
        qkv = mm(h, wqkv[0], bqkv[0, 0])             # [bb, 3*inner]
        q2s[...] = (qkv[:, :inner].astype(f32) * scale).astype(cdt)
        knew[0, 0] = qkv[:, inner:2 * inner]
        vnew[0, 0] = qkv[:, 2 * inner:]
        ms[...] = jnp.full_like(ms[...], NEG_INF)
        dens[...] = jnp.zeros_like(dens[...])
        ctxs[...] = jnp.zeros_like(ctxs[...])

    # ---- live chunk cells: online-softmax partial over cache rows ----
    @pl.when(c < live)
    def _():
        q = q2s[...]
        k_new = knew[0, 0]
        v_new = vnew[0, 0]
        if src_ref is not None:
            # deferred beam permutation: gather rows while the chunk is
            # resident (beams only permute within an example, and blocks
            # cover whole examples, so every source row lives in this
            # block); dynamic row reads must go through the REF
            # (dynamic_slice on a loaded value has no Mosaic lowering)
            base = b * bb
            kcb = jnp.stack([kc[src_ref[0, base + r] - base, 0]
                             for r in range(bb)], axis=0)
            vcb = jnp.stack([vc[src_ref[0, base + r] - base, 0]
                             for r in range(bb)], axis=0)
            # append the current token's k/v row (row idx) during the
            # write-back; it is invisible to this step's scores (masked
            # to rows < idx) — the online extra row at finalize covers it
            rows_w = (jax.lax.broadcasted_iota(
                jnp.int32, (bb, chunk, inner), 1) + c * chunk)
            at_new = rows_w == idx
            kc_out[:, 0] = jnp.where(at_new, k_new[:, None, :], kcb)
            vc_out[:, 0] = jnp.where(at_new, v_new[:, None, :], vcb)
        else:
            kcb = kc[:, 0]                           # [bb, C, inner]
            vcb = vc[:, 0]
        qbd = (q.astype(f32)[:, :, None] * seg[...][None]).astype(cdt)
        s = jax.lax.dot_general(kcb.astype(cdt), qbd,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=f32)  # [bb, C, H]
        rows = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + c * chunk)
        s = jnp.where(rows < idx, s, NEG_INF)
        m_new = jnp.maximum(ms[...], jnp.max(s, axis=1))
        sc2 = jnp.exp(ms[...] - m_new)               # [bb, H]
        # explicit zero for masked rows: when a chunk has NO valid row,
        # m_new == NEG_INF and exp(s - m_new) would be exp(0) == 1
        e = jnp.where(rows < idx, jnp.exp(s - m_new[:, None, :]), 0.0)
        dens[...] = dens[...] * sc2 + jnp.sum(e, axis=1)
        ctx2 = jax.lax.dot_general(
            e.astype(cdt), vcb.astype(cdt), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)              # [bb, H, inner]
        part = jnp.sum(ctx2 * seg_t[...][None], axis=1)  # [bb, inner]
        ctxs[...] = ctxs[...] * expand_heads_f32(sc2) + part
        ms[...] = m_new

    # ---- last chunk cell: current-token row, cross-attention, FF ----
    @pl.when(c == n_chunks - 1)
    def _():
        x = xs[b]
        q = q2s[...]
        k_new = knew[0, 0]
        v_new = vnew[0, 0]
        # current row (whisper attends to pos <= idx): online extra row
        prod_new = (q * k_new).astype(cdt)
        s_new = jax.lax.dot_general(prod_new, seg[...].astype(cdt),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)  # [bb, H]
        m = jnp.maximum(ms[...], s_new)
        sc2 = jnp.exp(ms[...] - m)                   # [bb, H]
        e_new = jnp.exp(s_new - m)                   # [bb, H]
        denom = dens[...] * sc2 + e_new
        ctx = (ctxs[...] * expand_heads_f32(sc2)
               + expand_heads_f32(e_new) * v_new.astype(f32))
        ctx = ctx / expand_heads_f32(denom)
        x = x + mm(ctx.astype(cdt), wo_s[0], bo_s[0, 0])

        # ---- cross-attention (per-example KV shared across beams; one
        # [LencP, g*H] MXU matmul per example via selg/segrep) ----
        h = ln(x, lns[0, 1], lnb[0, 1])
        qc = (mm(h, wq_c[0], bq_c[0, 0]).astype(f32) * scale).astype(cdt)
        ctx_parts = []
        n_ex = bb // group
        for e_i in range(n_ex):
            qe = qc[e_i * group:(e_i + 1) * group]   # [g, inner]
            if quant:
                # int8 cross KV: the per-lane k-scale folds into q BEFORE
                # the product (exactly dequantizing k), the per-lane
                # v-scale into the summed context AFTER
                qe = qe * kxs[e_i, 0, 0][None, :].astype(cdt)
            qex = jax.lax.dot_general(
                qe.astype(f32), selg[...], (((0,), (0,)), ((), ())),
                preferred_element_type=f32)          # [inner, g*H]
            qbd2d = (qex * segrep[...]).astype(cdt)
            kxe = kx[e_i, 0].astype(cdt)             # [LencP, inner]
            sc = jnp.dot(kxe, qbd2d,
                         preferred_element_type=f32)  # [LencP, g*H]
            rows_c = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
            sc = jnp.where(rows_c < lenc, sc, NEG_INF)
            mx = jnp.max(sc, axis=0, keepdims=True)
            ec = jnp.exp(sc - mx)
            p = ec / jnp.sum(ec, axis=0, keepdims=True)
            vxe = vx[e_i, 0].astype(cdt)
            ctx2d = jax.lax.dot_general(
                p.astype(cdt), vxe, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)          # [g*H, inner]
            ctx3 = ctx2d.reshape(group, heads, inner)  # major-dim split
            part = jnp.sum(ctx3 * seg_t[...][None], axis=1)  # [g, inner]
            if quant:
                part = part * vxs[e_i, 0, 0][None, :]
            ctx_parts.append(part)
        ctx_c = (jnp.concatenate(ctx_parts, axis=0)
                 if n_ex > 1 else ctx_parts[0]).astype(cdt)  # [bb, inner]
        x = x + mm(ctx_c, wo_c[0], bo_c[0, 0])

        # ---- feed-forward (exact-form GELU via polynomial erf) ----
        h = ln(x, lns[0, 2], lnb[0, 2])
        hh = jnp.dot(h.astype(cdt), wi[0], preferred_element_type=f32)
        hh = gelu_erf(hh + bi[0, 0].astype(f32)).astype(cdt)
        x = x + mm(hh, wo_f[0], bo_f[0, 0])

        xs[b] = x

        @pl.when(i == n_layers - 1)
        def _():
            x_out[0] = x


def whisper_mega_step(stacked: Dict[str, Array], x: Array,
                      k_cache: Array, v_cache: Array,
                      k_cross: Array, v_cross: Array,
                      cache_index: Array, heads: int, lenc: int,
                      bb: int = 2,
                      k_cross_scale: "Array | None" = None,
                      v_cross_scale: "Array | None" = None,
                      group: int = 1,
                      src: "Array | None" = None,
                      interpret: bool = False):
    """One full decoder step over all layers.

    x [B, d] (token+position embeds, compute dtype); self caches
    [B, N, L, inner]; cross KV [B // group, N, LencP, inner] — ``group``
    consecutive rows (the beams of one example) SHARE one cross block, so
    beam decode streams each example's multi-GB cross KV once per step
    instead of once per beam (group=1 = per-row KV, greedy/sampling).
    Returns (hidden [B, d] BEFORE the final LayerNorm,
    k_new [B, N, inner], v_new [B, N, inner]).

    With ``src`` [B] int32 (beam search), the self caches are first
    permuted by rows in-kernel (the deferred previous-step beam reorder),
    the new k/v rows are appended at ``cache_index`` during the same
    write-back, and the updated caches come back as two extra outputs
    (donated buffers aliased to the cache inputs).
    """
    bsz, d = x.shape
    _, n_layers, l, inner = k_cache.shape
    lencp = k_cross.shape[2]
    if group > 1:
        # batch blocks must cover whole examples so each grid cell maps
        # to a single contiguous slice of the per-example cross arrays
        bb = max(bb - bb % group, group) if bsz >= group else bsz
    bb = min(bb, bsz)  # single-window decode runs batch 1
    assert bsz % bb == 0, (bsz, bb)
    assert k_cross.shape[0] * group == bsz, (k_cross.shape, group, bsz)
    assert bb % group == 0, (bb, group)
    dkv = inner // heads
    n_blocks = bsz // bb
    ex_per_block = bb // group
    cdt = x.dtype
    d_ff = stacked["wi"].shape[2]
    quant = k_cross_scale is not None
    if not quant:
        k_cross_scale = jnp.ones((bsz // group, n_layers, 1, inner),
                                 jnp.float32)
        v_cross_scale = k_cross_scale

    idx = jnp.asarray(cache_index, jnp.int32).reshape(1)
    from vidchapters_tpu.ops.decode_megakernel import segment_matrix

    seg_np = segment_matrix(heads, dkv)
    seg = jnp.asarray(seg_np)
    seg_t = jnp.asarray(np.ascontiguousarray(seg_np.T))
    # static cross-attention MXU operands: beam selector [g, g*H] and the
    # per-beam tiled segment matrix [inner, g*H] (decode_megakernel v6)
    selg_np = np.zeros((group, group * heads), np.float32)
    for gg in range(group):
        selg_np[gg, gg * heads:(gg + 1) * heads] = 1.0
    selg = jnp.asarray(selg_np)
    segrep = jnp.asarray(np.tile(seg_np, (1, group)))

    # self-cache chunking (prefix-skip): dead chunks clamp their index
    # map to the last live chunk — no DMA — and skip compute. Greedy
    # (group=1, bb=2) measured FASTER unchunked — see CACHE_CHUNK note.
    chunked = (group > 1 or CHUNK_GREEDY) and l % CACHE_CHUNK == 0
    chunk = CACHE_CHUNK if chunked else l
    n_chunks = l // chunk

    def chunk_clamped(c, idx_ref):
        live = idx_ref[0] // chunk + 1
        return jnp.minimum(c, live - 1)

    wspec = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda i, b, c, s: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    const2 = lambda s0, s1: pl.BlockSpec((s0, s1),
                                         lambda i, b, c, s: (0, 0),
                                         memory_space=pltpu.VMEM)
    cache_spec = pl.BlockSpec((bb, 1, chunk, inner),
                              lambda i, b, c, s: (b, i,
                                                  chunk_clamped(c, s), 0),
                              memory_space=pltpu.VMEM)
    cross_spec = pl.BlockSpec((ex_per_block, 1, lencp, inner),
                              lambda i, b, c, s: (b, i, 0, 0),
                              memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((ex_per_block, 1, 1, inner),
                              lambda i, b, c, s: (b, i, 0, 0),
                              memory_space=pltpu.VMEM)
    # Mosaic requires block trailing dims (mult-of-8, mult-of-128) OR
    # equal to the array dims — bb=2 row blocks satisfy neither on a
    # [bsz, d] array, so rows ride a leading n_blocks/n_layers dim whose
    # trailing (bb, d) block EQUALS the array dims.
    row_spec = pl.BlockSpec((1, bb, d), lambda i, b, c, s: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, 1, bb, inner),
                            lambda i, b, c, s: (i, b, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        row_spec,                                    # x
        wspec(3, d), wspec(3, d),                    # ln scale / bias
        wspec(d, 3 * inner), wspec(1, 3 * inner),    # wqkv / bqkv
        wspec(inner, d), wspec(1, d),                # wo_self / bias
        wspec(d, inner), wspec(1, inner),            # wq_cross / bias
        wspec(inner, d), wspec(1, d),                # wo_cross / bias
        wspec(d, d_ff), wspec(1, d_ff),              # wi / bias
        wspec(d_ff, d), wspec(1, d),                 # wo_ff / bias
        const2(inner, heads),                        # seg
        const2(heads, inner),                        # seg_t
        const2(group, group * heads),                # selg
        const2(inner, group * heads),                # segrep
        cache_spec, cache_spec,                      # self k / v
        cross_spec, cross_spec,                      # cross k / v
        scale_spec, scale_spec,                      # cross scales
    ]
    out_specs = [row_spec, new_spec, new_spec]
    out_shape = [
        jax.ShapeDtypeStruct((n_blocks, bb, d), cdt),
        jax.ShapeDtypeStruct((n_layers, n_blocks, bb, inner), cdt),
        jax.ShapeDtypeStruct((n_layers, n_blocks, bb, inner), cdt),
    ]
    args = [x.reshape(n_blocks, bb, d), stacked["ln_scale"], stacked["ln_bias"], stacked["wqkv"],
            stacked["bqkv"], stacked["wo_self"], stacked["bo_self"],
            stacked["wq_cross"], stacked["bq_cross"], stacked["wo_cross"],
            stacked["bo_cross"], stacked["wi"], stacked["bi"],
            stacked["wo_ff"], stacked["bo_ff"], seg, seg_t, selg, segrep,
            k_cache, v_cache, k_cross, v_cross,
            k_cross_scale, v_cross_scale]
    kernel = functools.partial(
        _whisper_kernel, n_layers=n_layers, bb=bb, heads=heads, dkv=dkv,
        lenc=lenc, cdt=cdt, quant=quant, group=group,
        chunk=chunk, n_chunks=n_chunks)
    aliases = {}
    if src is not None:
        # deferred beam permutation: src rides SMEM after the scalar idx;
        # permuted caches out (aliased to the cache inputs)
        def kernel_fn(idx_sp, src_ref, x_in, lns, lnb, wqkv, bqkv, wo_s,
                      bo_s, wq_c, bq_c, wo_c, bo_c, wi, bi, wo_f, bo_f,
                      seg, seg_t, selg, segrep, kc, vc, kx, vx, kxs, vxs,
                      x_out, knew, vnew, kc_out, vc_out,
                      xs, q2s, ms, dens, ctxs):
            kernel(idx_sp, x_in, lns, lnb, wqkv, bqkv, wo_s, bo_s, wq_c,
                   bq_c, wo_c, bo_c, wi, bi, wo_f, bo_f, seg, seg_t,
                   selg, segrep, kc, vc, kx, vx, kxs, vxs,
                   x_out, knew, vnew, xs, q2s, ms, dens, ctxs,
                   src_ref=src_ref, kc_out=kc_out, vc_out=vc_out)

        in_specs.insert(0, pl.BlockSpec((1, bsz), lambda i, b, c, s: (0, 0),
                                        memory_space=pltpu.SMEM))
        args.insert(0, jnp.asarray(src, jnp.int32).reshape(1, bsz))
        out_specs += [cache_spec, cache_spec]
        out_shape += [jax.ShapeDtypeStruct(k_cache.shape, cdt),
                      jax.ShapeDtypeStruct(v_cache.shape, cdt)]
        # operand indices include the scalar-prefetch idx and src (0/1),
        # then x + 18 smalls -> k/v cache inputs at 21/22
        aliases = {21: 3, 22: 4}
    else:
        kernel_fn = kernel
    out = pl.pallas_call(
        kernel_fn,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_layers, n_blocks, n_chunks),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((n_blocks, bb, d), cdt),      # xs
                pltpu.VMEM((bb, inner), cdt),            # q2s (pre-scaled)
                pltpu.VMEM((bb, heads), jnp.float32),    # ms
                pltpu.VMEM((bb, heads), jnp.float32),    # dens
                pltpu.VMEM((bb, inner), jnp.float32),    # ctxs
            ],
        ),
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(idx, *args)
    hidden, k_new, v_new = out[:3]
    to_bn = lambda a: a.transpose(1, 2, 0, 3).reshape(bsz, n_layers, inner)
    if src is not None:
        return (hidden.reshape(bsz, d), to_bn(k_new), to_bn(v_new),
                out[3], out[4])
    return hidden.reshape(bsz, d), to_bn(k_new), to_bn(v_new)


# ---------------------------------------------------------------------------
# Host side: weight stacking + DecodeFns integration
# ---------------------------------------------------------------------------


def stack_whisper_decoder_weights(params: Dict[str, Any], cfg,
                                  dtype=None) -> Dict[str, Array]:
    """Whisper decoder params -> layer-stacked arrays (packed qkv; the
    bias-free k projection contributes zero bias rows)."""
    cdt = jnp.dtype(dtype or cfg.dtype)
    dec = params["decoder"]
    n = cfg.decoder_layers
    d = cfg.d_model

    def g(i, *path):
        node = dec[f"layer_{i}"]
        for p in path:
            node = node[p]
        return jnp.asarray(node)

    def stack(fn):
        return jnp.stack([fn(i) for i in range(n)])

    zeros_b = jnp.zeros((d,), jnp.float32)
    return {
        "ln_scale": stack(lambda i: jnp.stack([
            g(i, "self_attn_norm", "scale"), g(i, "cross_attn_norm", "scale"),
            g(i, "ff_norm", "scale")])).astype(jnp.float32),
        "ln_bias": stack(lambda i: jnp.stack([
            g(i, "self_attn_norm", "bias"), g(i, "cross_attn_norm", "bias"),
            g(i, "ff_norm", "bias")])).astype(jnp.float32),
        "wqkv": stack(lambda i: jnp.concatenate([
            g(i, "self_attn", "q", "kernel"), g(i, "self_attn", "k", "kernel"),
            g(i, "self_attn", "v", "kernel")], axis=1)).astype(cdt),
        "bqkv": stack(lambda i: jnp.concatenate([
            g(i, "self_attn", "q", "bias"), zeros_b,
            g(i, "self_attn", "v", "bias")])[None]).astype(jnp.float32),
        "wo_self": stack(lambda i: g(i, "self_attn", "out", "kernel")
                         ).astype(cdt),
        "bo_self": stack(lambda i: g(i, "self_attn", "out", "bias")[None]
                         ).astype(jnp.float32),
        "wq_cross": stack(lambda i: g(i, "cross_attn", "q", "kernel")
                          ).astype(cdt),
        "bq_cross": stack(lambda i: g(i, "cross_attn", "q", "bias")[None]
                          ).astype(jnp.float32),
        "wo_cross": stack(lambda i: g(i, "cross_attn", "out", "kernel")
                          ).astype(cdt),
        "bo_cross": stack(lambda i: g(i, "cross_attn", "out", "bias")[None]
                          ).astype(jnp.float32),
        "wi": stack(lambda i: g(i, "fc1", "kernel")).astype(cdt),
        "bi": stack(lambda i: g(i, "fc1", "bias")[None]).astype(jnp.float32),
        "wo_ff": stack(lambda i: g(i, "fc2", "kernel")).astype(cdt),
        "bo_ff": stack(lambda i: g(i, "fc2", "bias")[None]
                       ).astype(jnp.float32),
        "wk_cross": stack(lambda i: g(i, "cross_attn", "k", "kernel")
                          ).astype(cdt),
        "wv_cross": stack(lambda i: g(i, "cross_attn", "v", "kernel")
                          ).astype(cdt),
        "bv_cross": stack(lambda i: g(i, "cross_attn", "v", "bias")[None]
                          ).astype(jnp.float32),
        "ln_final_scale": jnp.asarray(dec["ln"]["scale"]).astype(jnp.float32),
        "ln_final_bias": jnp.asarray(dec["ln"]["bias"]).astype(jnp.float32),
    }


def make_whisper_mega_fns(cfg, params: Dict[str, Any], max_length: int,
                          interpret: bool = False, quantize=None):
    """ops.decoding DecodeFns backed by the Whisper megakernel (greedy /
    sampling batch path; beam callers repeat rows like _beam_decode)."""
    from vidchapters_tpu.ops.decoding import DecodeFns

    cdt = jnp.dtype(cfg.dtype)
    stacked = stack_whisper_decoder_weights(params, cfg)
    emb = jnp.asarray(params["decoder"]["embed_tokens"]["embedding"])
    emb_t = jnp.swapaxes(emb, 0, 1).astype(cdt)      # pre-loop transpose
    pos = jnp.asarray(params["decoder"]["embed_positions"])
    heads = cfg.num_heads
    d = cfg.d_model
    n = cfg.decoder_layers
    if quantize is None:
        quantize = (QUANTIZE_CROSS_KV if QUANTIZE_CROSS_KV is not None
                    else d >= 1280)
    static_state: Dict[str, int] = {}

    def _quantize_lanes(a):
        amax = jnp.max(jnp.abs(a), axis=2, keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
        q = jnp.clip(jnp.round(a.astype(jnp.float32) / scale), -127, 127)
        return q.astype(jnp.int8), scale

    def init_cache(batch: int, enc_out: Array):
        b0, lenc, _ = enc_out.shape
        lencp = _round_up(lenc, 32 if quantize else 16)
        enc = enc_out.astype(cdt)
        kx = jnp.einsum("bld,ndi->bnli", enc, stacked["wk_cross"],
                        preferred_element_type=jnp.float32).astype(cdt)
        vx = (jnp.einsum("bld,ndi->bnli", enc, stacked["wv_cross"],
                         preferred_element_type=jnp.float32)
              + stacked["bv_cross"][None]).astype(cdt)  # [1, N, 1, d]
        pad = [(0, 0), (0, 0), (0, lencp - lenc), (0, 0)]
        # lenc/group are STATIC (the kernel's padding mask + block layout);
        # stash them on the closure at trace time rather than in the
        # carried cache
        static_state["lenc"] = lenc
        cross = {"k": jnp.pad(kx, pad), "v": jnp.pad(vx, pad)}
        if quantize:
            cross["k"], cross["k_scale"] = _quantize_lanes(cross["k"])
            cross["v"], cross["v_scale"] = _quantize_lanes(cross["v"])
        if batch % b0 != 0:  # beam callers pass UNREPEATED enc (b0 rows)
            raise ValueError(f"enc batch {b0} does not divide cache "
                             f"batch {batch}")
        # group consecutive rows (one example's beams) share a cross block
        # inside the kernel — the multi-GB int8 cross stays per-example
        static_state["group"] = batch // b0
        cache = {
            "self_k": jnp.zeros((batch, n, max_length, d), cdt),
            "self_v": jnp.zeros((batch, n, max_length, d), cdt),
            "cross": cross,
        }
        if static_state["group"] > 1:
            # beam search: the beam permutation is DEFERRED — stored here
            # by reorder_cache and applied inside the next step's kernel
            # while the self caches stream through VMEM anyway
            cache["pending_src"] = jnp.arange(batch, dtype=jnp.int32)
        return cache

    def step(tokens: Array, cache, index, enc_mask: Array):
        del enc_mask  # full-encoding attention (models/whisper.py:231)
        x = emb[tokens].astype(cdt)
        p_row = jax.lax.dynamic_slice_in_dim(pos, index, 1, axis=0)
        x = x + p_row.astype(cdt)
        src = cache.get("pending_src")
        out = whisper_mega_step(
            stacked, x, cache["self_k"], cache["self_v"],
            cache["cross"]["k"], cache["cross"]["v"], index, heads,
            static_state["lenc"], bb=BATCH_BLOCK_ROWS,
            k_cross_scale=cache["cross"].get("k_scale"),
            v_cross_scale=cache["cross"].get("v_scale"),
            group=static_state["group"], src=src,
            interpret=interpret)
        if src is not None:
            # the kernel already permuted the caches and appended the new
            # k/v rows during the write-back — no reorder pass, no DUS
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
        # final LayerNorm + tied-embedding logits outside the kernel
        hf = hidden.astype(jnp.float32)
        mu = jnp.mean(hf, axis=-1, keepdims=True)
        hc = hf - mu
        var = jnp.mean(hc * hc, axis=-1, keepdims=True)
        normed = (stacked["ln_final_scale"][None] * hc
                  * jax.lax.rsqrt(var + 1e-5)
                  + stacked["ln_final_bias"][None])
        logits = jnp.dot(normed.astype(cdt), emb_t,
                         preferred_element_type=jnp.float32)
        return logits.astype(jnp.float32), new_cache

    def reorder_cache(cache, flat_src):
        if "pending_src" not in cache:
            # legacy repeated-enc layout (group=1): no deferred path
            from vidchapters_tpu.ops.decoding import reorder_beam_cache

            return reorder_beam_cache(cache, flat_src)
        return {**cache, "pending_src": flat_src.astype(jnp.int32)}

    return DecodeFns(init_cache, step, reorder_cache)
