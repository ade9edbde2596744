"""BLIP-2 parity vs transformers (vision tower, Q-Former, full model,
greedy generation).  Backs the zero-shot visual captioner
(zs_visualvcg.py:249-264) and the vc.py BLIP-2 eval dispatch (vc.py:268-272).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vidchapters_tpu.config import T5Config
from vidchapters_tpu.models.blip2 import (
    Blip2,
    Blip2Config,
    Blip2VisionConfig,
    QFormerConfig,
    blip2_generate,
    convert_hf_blip2,
    preprocess_frames,
)

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

VOCAB = 120


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    hf_cfg = transformers.Blip2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=28, patch_size=14, hidden_act="gelu",
                           attention_dropout=0.0),
        qformer_config=dict(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=48,
                            cross_attention_frequency=2,
                            encoder_hidden_size=32, hidden_act="gelu",
                            hidden_dropout_prob=0.0,
                            attention_probs_dropout_prob=0.0),
        text_config=dict(model_type="t5", vocab_size=VOCAB, d_model=32,
                         d_kv=8, d_ff=48, num_layers=2, num_decoder_layers=2,
                         num_heads=4, feed_forward_proj="gated-gelu",
                         tie_word_embeddings=False, dropout_rate=0.0),
        num_query_tokens=4, image_token_index=VOCAB - 1)
    hf = transformers.Blip2ForConditionalGeneration(hf_cfg).eval()
    cfg = Blip2Config(
        vision=Blip2VisionConfig(hidden_size=32, intermediate_size=64,
                                 num_layers=2, num_heads=4, image_size=28,
                                 patch_size=14),
        qformer=QFormerConfig(hidden_size=32, num_layers=2, num_heads=4,
                              intermediate_size=48,
                              cross_attention_frequency=2,
                              encoder_hidden_size=32),
        t5=T5Config(vocab_size=VOCAB, d_model=32, d_kv=8, d_ff=48,
                    num_layers=2, num_decoder_layers=2, num_heads=4,
                    feed_forward_proj="gated-gelu", tie_word_embeddings=False,
                    label_smoothing=0.0, dropout_rate=0.0,
                    encoder_dropout=0.0, decoder_dropout=0.0,
                    dtype="float32"),
        num_query_tokens=4)
    model = Blip2(cfg)
    params = convert_hf_blip2({k: v.numpy() for k, v in
                               hf.state_dict().items()})
    return hf, model, params


def test_blip2_vision_parity(pair, rng):
    hf, model, params = pair
    px = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        expected = hf.vision_model(torch.tensor(px)).last_hidden_state.numpy()
    from vidchapters_tpu.models.blip2 import Blip2VisionModel

    ours = np.asarray(Blip2VisionModel(model.cfg.vision).apply(
        {"params": params["vision"]}, jnp.asarray(px)))
    np.testing.assert_allclose(ours, expected, rtol=2e-4, atol=2e-4)


def test_blip2_forward_parity(pair, rng):
    # transformers >= 4.45 replaces the query-embedding concatenation with
    # <image> placeholder tokens + masked_scatter; placing the placeholders
    # at the start makes that exactly the reference-era concat semantics
    # our model implements.
    hf, model, params = pair
    px = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    ids = rng.integers(3, VOCAB - 1, (2, 7)).astype(np.int64)
    mask = np.ones((2, 7), np.int64)
    dec = rng.integers(3, VOCAB - 1, (2, 5)).astype(np.int64)
    img = np.full((2, 4), VOCAB - 1, np.int64)
    with torch.no_grad():
        expected = hf(pixel_values=torch.tensor(px),
                      input_ids=torch.tensor(np.concatenate([img, ids], 1)),
                      attention_mask=torch.tensor(
                          np.concatenate([np.ones_like(img), mask], 1)),
                      decoder_input_ids=torch.tensor(dec)).logits.numpy()
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(px), jnp.asarray(ids),
        jnp.asarray(mask), jnp.asarray(dec)))
    np.testing.assert_allclose(ours, expected, rtol=3e-4, atol=3e-4)


def test_blip2_greedy_generate_matches_hf(pair, rng):
    hf, model, params = pair
    px = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    ids = rng.integers(3, VOCAB - 1, (2, 6)).astype(np.int64)
    mask = np.ones((2, 6), np.int64)
    img = np.full((2, 4), VOCAB - 1, np.int64)
    t = 8
    with torch.no_grad():
        out = hf.generate(pixel_values=torch.tensor(px),
                          input_ids=torch.tensor(np.concatenate([img, ids], 1)),
                          attention_mask=torch.tensor(
                              np.concatenate([np.ones_like(img), mask], 1)),
                          max_new_tokens=t, do_sample=False, num_beams=1,
                          decoder_start_token_id=0, eos_token_id=1,
                          pad_token_id=0)
    expected = out.numpy()[:, 1:]  # drop leading decoder_start (pad)
    ours = np.asarray(blip2_generate(model, params, jnp.asarray(px),
                                     jnp.asarray(ids, jnp.int32),
                                     jnp.asarray(mask, jnp.int32),
                                     max_new_tokens=t))
    for r in range(2):
        e = expected[r]
        stop = np.where(e == 1)[0]  # T5 EOS = 1
        n = (stop[0] + 1) if len(stop) else e.shape[0]
        np.testing.assert_array_equal(ours[r, :n], e[:n])


def test_preprocess_frames():
    frames = np.full((1, 224, 224, 3), 128, np.uint8)
    px = preprocess_frames(frames)
    assert px.shape == (1, 3, 224, 224)
    assert np.isfinite(px).all()
    # mid-gray normalizes near zero
    assert abs(px.mean()) < 0.5
