"""Deformable attention: jnp oracle vs MXU formulation vs Pallas kernel,
validated against torch grid_sample semantics (the reference's fallback,
ops/functions/ms_deform_attn_func.py:44-71, tested the way ops/test.py does).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.ops.deformable_attention import (
    deformable_attention_1d,
    deformable_attention_1d_pallas,
    deformable_attention_1d_reference,
)

SHAPES = (16, 8, 4, 2)  # multi-scale temporal lengths
N, M, D, P = 2, 4, 8, 3
LQ = 10


def make_inputs(rng):
    s = sum(SHAPES)
    value = rng.normal(size=(N, s, M, D)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(N, LQ, M, len(SHAPES), P)).astype(np.float32)
    attn = rng.uniform(size=(N, LQ, M, len(SHAPES), P)).astype(np.float32)
    attn = attn / attn.sum(axis=(3, 4), keepdims=True)
    return value, loc, attn


def torch_oracle(value, loc, attn):
    """Pseudo-2D grid_sample evaluation of the same inputs (reference
    semantics; mirrors ms_deform_attn_core_pytorch with H=1, y=0.5)."""
    import torch
    import torch.nn.functional as F

    v = torch.tensor(value)
    locs = torch.tensor(loc)
    attns = torch.tensor(attn)
    n, s, m, d = v.shape
    lq = locs.shape[1]
    splits = list(SHAPES)
    value_list = v.split(splits, dim=1)
    out = torch.zeros(n, lq, m, d)
    for lid, t_l in enumerate(splits):
        vl = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, 1, t_l)
        gx = 2 * locs[:, :, :, lid] - 1  # [N, Lq, M, P]
        gy = torch.zeros_like(gx)
        grid = torch.stack([gx, gy], -1).permute(0, 2, 1, 3, 4).flatten(0, 1)
        sampled = F.grid_sample(vl, grid, mode="bilinear",
                                padding_mode="border", align_corners=False)
        # [N*M, D, Lq, P]
        a = attns[:, :, :, lid].permute(0, 2, 1, 3).flatten(0, 1)  # [N*M, Lq, P]
        contrib = (sampled * a[:, None]).sum(-1)  # [N*M, D, Lq]
        out += contrib.reshape(n, m, d, lq).permute(0, 3, 1, 2)
    return out.reshape(n, lq, m * d).numpy()


def test_reference_matches_torch_grid_sample(rng):
    value, loc, attn = make_inputs(rng)
    ours = np.asarray(deformable_attention_1d_reference(
        jnp.array(value), SHAPES, jnp.array(loc), jnp.array(attn)))
    expected = torch_oracle(value, loc, attn)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_mxu_formulation_matches_reference(rng):
    value, loc, attn = make_inputs(rng)
    a = np.asarray(deformable_attention_1d_reference(
        jnp.array(value), SHAPES, jnp.array(loc), jnp.array(attn)))
    b = np.asarray(deformable_attention_1d(
        jnp.array(value), SHAPES, jnp.array(loc), jnp.array(attn)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_pallas_kernel_matches_reference(rng):
    value, loc, attn = make_inputs(rng)
    a = np.asarray(deformable_attention_1d_reference(
        jnp.array(value), SHAPES, jnp.array(loc), jnp.array(attn)))
    b = np.asarray(deformable_attention_1d_pallas(
        jnp.array(value), SHAPES, jnp.array(loc), jnp.array(attn), True))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_gradients_match_torch(rng):
    """Gradcheck analog of PDVC/pdvc/ops/test.py:59-89: compare JAX grads of
    the MXU formulation with torch autograd through grid_sample."""
    import torch
    import torch.nn.functional as F

    value, loc, attn = make_inputs(rng)

    def loss_jax(v, l, a):
        out = deformable_attention_1d(v, SHAPES, l, a)
        return (out * out).sum() * 0.5

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(loc), jnp.array(attn))

    tv = torch.tensor(value, requires_grad=True)
    tl = torch.tensor(loc, requires_grad=True)
    ta = torch.tensor(attn, requires_grad=True)
    n, s, m, d = value.shape
    lq = loc.shape[1]
    out = torch.zeros(n, lq, m, d, dtype=torch.float64)
    out = out.float()
    start = 0
    for lid, t_l in enumerate(SHAPES):
        vl = tv[:, start:start + t_l].permute(0, 2, 3, 1).reshape(n * m, d, 1, t_l)
        gx = 2 * tl[:, :, :, lid] - 1
        gy = torch.zeros_like(gx)
        grid = torch.stack([gx, gy], -1).permute(0, 2, 1, 3, 4).flatten(0, 1)
        sampled = F.grid_sample(vl, grid, mode="bilinear",
                                padding_mode="border", align_corners=False)
        a = ta[:, :, :, lid].permute(0, 2, 1, 3).flatten(0, 1)
        contrib = (sampled * a[:, None]).sum(-1)
        out = out + contrib.reshape(n, m, d, lq).permute(0, 3, 1, 2)
        start += t_l
    ((out.reshape(n, lq, m * d) ** 2).sum() * 0.5).backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-3,
                               atol=1e-4)
    # location grads: zero where clamped on both sides; compare elementwise
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3,
                               atol=1e-3)


def test_pallas_custom_vjp_matches_mxu_grads(rng):
    value, loc, attn = make_inputs(rng)

    def loss_p(v, l, a):
        out = deformable_attention_1d_pallas(v, SHAPES, l, a, True)
        return (out * out).sum() * 0.5

    def loss_m(v, l, a):
        out = deformable_attention_1d(v, SHAPES, l, a)
        return (out * out).sum() * 0.5

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(loc), jnp.array(attn))
    gm = jax.grad(loss_m, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(loc), jnp.array(attn))
    for a, b in zip(gp, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
