"""Whisper JAX model parity vs transformers' torch Whisper + mel frontend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.factory.audio import (
    N_FRAMES,
    log_mel_spectrogram,
    mel_filterbank,
)
from vidchapters_tpu.models.whisper import (
    Whisper,
    WhisperConfig,
    convert_hf_whisper,
)

torch = pytest.importorskip("torch")
import transformers  # noqa: E402


@pytest.fixture(scope="module")
def hf_pair():
    torch.manual_seed(0)
    hf_cfg = transformers.WhisperConfig(
        vocab_size=200, num_mel_bins=8, d_model=32, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_source_positions=50,
        max_target_positions=40, pad_token_id=0, bos_token_id=0,
        eos_token_id=1, decoder_start_token_id=5)
    hf = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = WhisperConfig(vocab_size=200, num_mel_bins=8, d_model=32,
                        encoder_layers=2, decoder_layers=2, num_heads=4,
                        d_ff=64, max_source_positions=50,
                        max_target_positions=40, dtype="float32")
    params = convert_hf_whisper(
        {k: v.numpy() for k, v in hf.model.state_dict().items()})
    return hf, Whisper(cfg), params, cfg


def test_full_forward_parity(hf_pair, rng):
    hf, model, params, cfg = hf_pair
    mel = rng.normal(size=(2, 8, 100)).astype(np.float32)
    tokens = rng.integers(0, 200, (2, 7)).astype(np.int32)
    with torch.no_grad():
        hf_out = hf(input_features=torch.tensor(mel),
                    decoder_input_ids=torch.tensor(tokens.astype(np.int64)))
    ours = model.apply({"params": params}, jnp.array(mel), jnp.array(tokens))
    np.testing.assert_allclose(np.asarray(ours), hf_out.logits.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_greedy_decode_matches_hf(hf_pair, rng):
    from vidchapters_tpu.ops.decoding import greedy_decode, make_decode_fns

    hf, model, params, cfg = hf_pair
    mel = rng.normal(size=(1, 8, 100)).astype(np.float32)
    start = 5
    # manual torch greedy loop (HF generate injects whisper-specific
    # suppression that a random tiny model does not have)
    with torch.no_grad():
        toks = [start]
        for _ in range(8):
            logits = hf(input_features=torch.tensor(mel),
                        decoder_input_ids=torch.tensor([toks])).logits
            nxt = int(logits[0, -1].argmax())
            toks.append(nxt)
            if nxt == 1:
                break
    enc = model.apply({"params": params}, jnp.array(mel), method=model.encode)
    fns = make_decode_fns(model, params, 8)
    seqs = greedy_decode(fns, enc, jnp.ones((1, enc.shape[1]), jnp.int32), 8,
                         eos_token_id=1, decoder_start_token_id=start)
    ours = list(np.asarray(seqs)[0])
    ref = toks[1:]
    assert ours[: len(ref)] == ref, (ours, ref)


def test_mel_filterbank_matches_librosa_semantics():
    fb = mel_filterbank()
    assert fb.shape == (80, 201)
    # every filter is a nonnegative triangle; interior filters sum > 0
    assert (fb >= 0).all()
    assert (fb.sum(axis=1)[1:-1] > 0).all()


def test_log_mel_spectrogram_shape():
    audio = np.sin(np.linspace(0, 3000, 16000 * 3)).astype(np.float32)
    mel = log_mel_spectrogram(audio)
    assert mel.shape == (80, N_FRAMES)
    assert np.isfinite(mel).all()
    assert mel.max() <= (mel.min() + 8.0) / 1.0 + 10  # clamped dynamic range



def test_cross_attention_beam_grouping_exact():
    """Grouped per-example cross KV (beams share the encoder output;
    models/whisper.py WhisperAttention) matches the repeated-KV path
    exactly — fp32 compute, identical contractions."""
    import jax
    import jax.numpy as jnp

    from vidchapters_tpu.models.whisper import WhisperAttention, WhisperConfig

    cfg = WhisperConfig(d_model=32, num_heads=4, encoder_layers=1,
                        decoder_layers=1, d_ff=64, dtype="float32")
    attn = WhisperAttention(cfg)
    rng = np.random.default_rng(0)
    b, K, lk = 2, 3, 7
    enc = jnp.asarray(rng.normal(size=(b, lk, 32)), jnp.float32)
    q_in = jnp.asarray(rng.normal(size=(b * K, 1, 32)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), q_in, q_in)["params"]

    kv = attn.apply({"params": params}, enc, method=attn.precompute_kv)
    kv_rep = jax.tree_util.tree_map(lambda x: jnp.repeat(x, K, axis=0), kv)
    out_grouped, _ = attn.apply({"params": params}, q_in, None, cache=kv)
    out_repeat, _ = attn.apply({"params": params}, q_in, None, cache=kv_rep)
    np.testing.assert_allclose(np.asarray(out_grouped),
                               np.asarray(out_repeat), rtol=1e-6, atol=1e-6)
