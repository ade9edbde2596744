"""Temporal ViT parity: Flax TemporalViT vs a torch module matching the
reference architecture + state-dict layout (model/vit.py:79-133), through the
checkpoint importer (models/torch_import.convert_vit_state_dict)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vidchapters_tpu.config import TemporalViTConfig
from vidchapters_tpu.models.torch_import import convert_vit_state_dict
from vidchapters_tpu.models.vit import TemporalViT

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class TorchBlock(nn.Module):
    """Pre-norm block with the reference's naming (vit.py:58-76)."""

    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, mlp_dim)
        self.mlp.fc2 = nn.Linear(mlp_dim, dim)
        self.heads = heads

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, self.heads, c // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (c // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn.proj(h)
        h = self.norm2(x)
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(h)))
        return x + h


class TorchViT(nn.Module):
    def __init__(self, num_features, dim, depth, heads, mlp_dim):
        super().__init__()
        self.pos_embed = nn.Parameter(torch.randn(1, num_features, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchBlock(dim, heads, mlp_dim) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        if x.size(1) != self.pos_embed.size(1):
            te = self.pos_embed.transpose(1, 2)
            te = F.interpolate(te, size=(x.size(1)), mode="nearest")
            x = x + te.transpose(1, 2)
        else:
            x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tv = TorchViT(num_features=10, dim=32, depth=2, heads=4, mlp_dim=64).eval()
    cfg = TemporalViTConfig(num_features=10, embed_dim=32, depth=2,
                            num_heads=4, mlp_dim=64, dtype="float32")
    model = TemporalViT(cfg)
    params = convert_vit_state_dict(
        {k: v.detach().numpy() for k, v in tv.state_dict().items()})
    return tv, model, params


def test_vit_forward_parity(pair, rng):
    tv, model, params = pair
    x = rng.normal(size=(2, 10, 32)).astype(np.float32)
    with torch.no_grad():
        expected = tv(torch.tensor(x)).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.array(x)))
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=2e-4)


def test_vit_position_interpolation_parity(pair, rng):
    tv, model, params = pair
    # shorter sequence triggers nearest-neighbor pos-embed interpolation
    x = rng.normal(size=(2, 6, 32)).astype(np.float32)
    with torch.no_grad():
        expected = tv(torch.tensor(x)).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.array(x)))
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=2e-4)
