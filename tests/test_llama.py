"""LLaMA parity vs transformers (forward logits + batched greedy decode).

The model backs the zero-shot speech-VCG titler (zs_speechvcg.py:150-200)
and the vc.py LLaMA eval dispatch (vc.py:275-279)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vidchapters_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    convert_hf_llama,
    llama_greedy_generate,
)

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

VOCAB = 120


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        bos_token_id=1, eos_token_id=2, attention_dropout=0.0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      max_position_embeddings=64)
    model = LlamaForCausalLM(cfg)
    params = convert_hf_llama({k: v.numpy() for k, v in
                               hf.state_dict().items()})
    return hf, model, params


def test_llama_forward_parity(pair, rng):
    hf, model, params = pair
    ids = rng.integers(3, VOCAB, (2, 11)).astype(np.int64)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids)).logits.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=2e-4)


def test_llama_forward_parity_left_padded(pair, rng):
    """Left padding + explicit mask must match HF position-id handling."""
    hf, model, params = pair
    ids = rng.integers(3, VOCAB, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    ids[0, :3] = 1
    mask[0, :3] = 0
    pos = np.clip(np.cumsum(mask, axis=1) - 1, 0, None)
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids),
                      attention_mask=torch.tensor(mask),
                      position_ids=torch.tensor(pos)).logits.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                  attn_mask=jnp.asarray(mask)))
    # only compare non-pad rows (pad query rows are garbage in both)
    np.testing.assert_allclose(ours[0, 3:], expected[0, 3:],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours[1], expected[1], rtol=2e-4, atol=2e-4)


def test_llama_greedy_generate_matches_hf(pair, rng):
    hf, model, params = pair
    b, p, t = 3, 8, 6
    ids = rng.integers(3, VOCAB, (b, p)).astype(np.int64)
    mask = np.ones((b, p), np.int64)
    # ragged left padding, reference-style (<s> as pad)
    ids[0, :2] = 1
    mask[0, :2] = 0
    ids[2, :4] = 1
    mask[2, :4] = 0
    with torch.no_grad():
        out = hf.generate(torch.tensor(ids),
                          attention_mask=torch.tensor(mask),
                          max_new_tokens=t, do_sample=False,
                          pad_token_id=1)
    expected = out[:, p:].numpy()
    ours = np.asarray(llama_greedy_generate(
        model, params, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), max_new_tokens=t))
    # HF pads finished rows with pad_token; ours fills with EOS — compare
    # only up to and including the first EOS per row.
    for r in range(b):
        e = expected[r]
        stop = np.where(e == 2)[0]
        n = (stop[0] + 1) if len(stop) else t
        np.testing.assert_array_equal(ours[r, :n], e[:n])


def test_llama_cached_prefill_matches_uncached(pair, rng):
    """The cache code path (prefill) must reproduce uncached logits."""
    from vidchapters_tpu.models.llama import init_cache

    _, model, params = pair
    ids = rng.integers(3, VOCAB, (2, 7)).astype(np.int32)
    plain = model.apply({"params": params}, jnp.asarray(ids))
    cache = init_cache(model.cfg, 2, 12)
    kv_pad = jnp.concatenate([jnp.ones((2, 7), jnp.int32),
                              jnp.ones((2, 5), jnp.int32)], axis=1)
    cached, _ = model.apply({"params": params}, jnp.asarray(ids),
                            cache=cache, cache_index=jnp.asarray(0),
                            kv_pad_mask=kv_pad)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)
