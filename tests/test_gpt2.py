"""GPT-2 parity vs transformers + prefix-conditioned caption loss/sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.models.gpt2 import (
    GPT2,
    GPT2Config,
    convert_hf_gpt2,
    gpt2_caption_loss,
    gpt2_greedy_sample,
)

torch = pytest.importorskip("torch")
import transformers  # noqa: E402


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    hf_cfg = transformers.GPT2Config(
        vocab_size=150, n_positions=32, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    cfg = GPT2Config(vocab_size=150, n_positions=32, n_embd=32, n_layer=2,
                     n_head=4)
    model = GPT2(cfg)
    params = convert_hf_gpt2({k: v.numpy() for k, v in hf.state_dict().items()})
    return hf, model, params


def test_gpt2_forward_parity(pair, rng):
    hf, model, params = pair
    ids = rng.integers(0, 150, (2, 9)).astype(np.int64)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids)).logits.numpy()
    embeds = jnp.asarray(params["wte"])[jnp.asarray(ids)]
    ours = np.asarray(model.apply({"params": params}, embeds))
    np.testing.assert_allclose(ours, expected, rtol=3e-4, atol=3e-4)


def test_gpt2_caption_loss_matches_hf(pair, rng):
    hf, model, params = pair
    prefix = rng.normal(size=(2, 1, 32)).astype(np.float32)
    seq = rng.integers(1, 150, (2, 6)).astype(np.int64)
    ours = float(gpt2_caption_loss(model, params, jnp.asarray(prefix),
                                   jnp.asarray(seq)))
    with torch.no_grad():
        tok_emb = hf.transformer.wte(torch.tensor(seq))
        inputs = torch.cat([torch.tensor(prefix), tok_emb], dim=1)
        labels = torch.cat(
            [torch.full((2, 1), -100, dtype=torch.long),
             torch.tensor(seq)], dim=1)
        expected = float(hf(inputs_embeds=inputs, labels=labels).loss)
    assert ours == pytest.approx(expected, rel=1e-3)


def test_gpt2_greedy_sample_shape(pair, rng):
    hf, model, params = pair
    prefix = rng.normal(size=(2, 1, 32)).astype(np.float32)
    toks = gpt2_greedy_sample(model, params, jnp.asarray(prefix), max_len=5,
                              eos_id=149)
    assert toks.shape == (2, 5)
