"""Numerical parity of the Flax T5 against HF transformers' torch T5.

Random torch weights are converted through the checkpoint-import shim
(models/torch_import.py) and forward outputs must agree — this validates both
the model math (RMSNorm, relative bias, tied-logit rescale, label smoothing)
and the shim used to load released reference checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import T5Config
from vidchapters_tpu.models.t5 import (
    T5ForConditionalGeneration,
    label_smoothed_cross_entropy,
    shift_right,
)
from vidchapters_tpu.models.torch_import import convert_t5_state_dict

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

SMALL = dict(vocab_size=120, d_model=64, d_kv=16, d_ff=128, num_layers=2,
             num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
             relative_attention_max_distance=32)


def _make_pair(gated: bool, tie: bool = True, seed: int = 0):
    torch.manual_seed(seed)
    hf_cfg = transformers.T5Config(
        vocab_size=SMALL["vocab_size"], d_model=SMALL["d_model"],
        d_kv=SMALL["d_kv"], d_ff=SMALL["d_ff"], num_layers=SMALL["num_layers"],
        num_decoder_layers=SMALL["num_decoder_layers"], num_heads=SMALL["num_heads"],
        relative_attention_num_buckets=SMALL["relative_attention_num_buckets"],
        relative_attention_max_distance=SMALL["relative_attention_max_distance"],
        dropout_rate=0.0, feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tie, decoder_start_token_id=0, pad_token_id=0,
        eos_token_id=1)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()

    cfg = T5Config(**SMALL, dropout_rate=0.0, encoder_dropout=0.0,
                   decoder_dropout=0.0, dtype="float32",
                   feed_forward_proj="gated-gelu" if gated else "relu",
                   tie_word_embeddings=tie, label_smoothing=0.0)
    model = T5ForConditionalGeneration(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_t5_state_dict(sd, gated=gated)
    return hf, model, params


def _random_batch(rng, b=2, src=7, tgt=5, vocab=120):
    input_ids = rng.integers(2, vocab, (b, src))
    attn = np.ones((b, src), np.int32)
    attn[0, -2:] = 0
    labels = rng.integers(2, vocab, (b, tgt))
    dec_mask = np.ones((b, tgt), np.int32)
    return input_ids.astype(np.int32), attn, labels.astype(np.int32), dec_mask


@pytest.mark.parametrize("gated", [False, True])
def test_forward_logits_parity(gated, rng):
    hf, model, params = _make_pair(gated)
    input_ids, attn, labels, dec_mask = _random_batch(rng)

    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(input_ids),
                    attention_mask=torch.tensor(attn),
                    decoder_input_ids=torch.tensor(
                        hf._shift_right(torch.tensor(labels))),
                    decoder_attention_mask=torch.tensor(dec_mask))
    ours = model.apply({"params": params}, jnp.array(input_ids), jnp.array(attn),
                       shift_right(jnp.array(labels)), jnp.array(dec_mask))
    np.testing.assert_allclose(np.asarray(ours), hf_out.logits.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_loss_parity(rng):
    hf, model, params = _make_pair(gated=False)
    input_ids, attn, labels, dec_mask = _random_batch(rng)
    labels_masked = labels.copy()
    labels_masked[0, -1] = -100

    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(input_ids),
                    attention_mask=torch.tensor(attn),
                    labels=torch.tensor(labels_masked.astype(np.int64)))
    ours_logits = model.apply(
        {"params": params}, jnp.array(input_ids), jnp.array(attn),
        shift_right(jnp.array(labels_masked)), jnp.array(dec_mask))
    loss = label_smoothed_cross_entropy(ours_logits, jnp.array(labels_masked),
                                        label_smoothing=0.0)
    np.testing.assert_allclose(float(loss), float(hf_out.loss), rtol=1e-4)


def test_label_smoothing_matches_torch(rng):
    logits = rng.normal(size=(2, 5, 11)).astype(np.float32)
    labels = rng.integers(0, 11, (2, 5))
    labels[1, -2:] = -100
    ours = label_smoothed_cross_entropy(jnp.array(logits), jnp.array(labels), 0.1)
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits).view(-1, 11), torch.tensor(labels).view(-1),
        ignore_index=-100, label_smoothing=0.1)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_shift_right():
    labels = jnp.array([[5, 6, 7], [8, -100, -100]])
    out = shift_right(labels)
    np.testing.assert_array_equal(np.asarray(out), [[0, 5, 6], [0, 8, 0]])


def test_hf_greedy_generate_parity(rng):
    from vidchapters_tpu.ops.decoding import greedy_decode, make_decode_fns

    hf, model, params = _make_pair(gated=False, seed=3)
    input_ids, attn, _, _ = _random_batch(rng)
    max_len = 10

    with torch.no_grad():
        hf_seq = hf.generate(input_ids=torch.tensor(input_ids),
                             attention_mask=torch.tensor(attn),
                             max_new_tokens=max_len, num_beams=1,
                             do_sample=False, min_length=1)
    enc = model.apply({"params": params}, input_ids=jnp.array(input_ids),
                      attention_mask=jnp.array(attn), method=model.encode)
    fns = make_decode_fns(model, params, max_len)
    seqs = greedy_decode(fns, enc, jnp.array(attn), max_len)
    hf_tokens = hf_seq[:, 1:].numpy()  # drop decoder_start
    ours = np.asarray(seqs)
    for b in range(ours.shape[0]):
        h = list(hf_tokens[b])
        o = list(ours[b])[: len(h)]
        # compare up to and including EOS
        if 1 in h:
            h = h[: h.index(1) + 1]
        if 1 in o:
            o = o[: o.index(1) + 1]
        assert h == o, (b, h, o)


def test_hf_beam_search_parity(rng):
    from vidchapters_tpu.ops.decoding import beam_search, make_decode_fns

    hf, model, params = _make_pair(gated=False, seed=7)
    input_ids, attn, _, _ = _random_batch(rng)
    max_len = 8

    with torch.no_grad():
        hf_seq = hf.generate(input_ids=torch.tensor(input_ids),
                             attention_mask=torch.tensor(attn),
                             max_new_tokens=max_len, num_beams=4,
                             do_sample=False, min_length=1,
                             length_penalty=1.0)
    enc = model.apply({"params": params}, input_ids=jnp.array(input_ids),
                      attention_mask=jnp.array(attn), method=model.encode)
    fns = make_decode_fns(model, params, max_len)
    seqs = beam_search(fns, enc, jnp.array(attn), max_len, num_beams=4)
    hf_tokens = hf_seq[:, 1:].numpy()
    ours = np.asarray(seqs)
    for b in range(ours.shape[0]):
        h = list(hf_tokens[b])
        o = list(ours[b])[: len(h)]
        if 1 in h:
            h = h[: h.index(1) + 1]
        if 1 in o:
            o = o[: o.index(1) + 1]
        assert h == o, (b, h, o)
