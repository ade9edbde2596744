"""CLIP tower parity vs transformers' torch CLIP (random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.models.clip import (
    CLIPImageEncoder,
    CLIPTextEncoder,
    CLIPTextConfig,
    CLIPVisionConfig,
    convert_hf_clip_text,
    convert_hf_clip_visual,
)

torch = pytest.importorskip("torch")
import transformers  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.CLIPConfig(
        text_config={"hidden_size": 64, "intermediate_size": 128,
                     "num_hidden_layers": 2, "num_attention_heads": 4,
                     "max_position_embeddings": 16, "vocab_size": 100,
                     # OpenAI CLIP pools at argmax(tokens); make HF's
                     # eos-position pooling coincide by using the top id
                     "eos_token_id": 99},
        vision_config={"hidden_size": 64, "intermediate_size": 128,
                       "num_hidden_layers": 2, "num_attention_heads": 4,
                       "image_size": 32, "patch_size": 16},
        projection_dim=32)
    model = transformers.CLIPModel(cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return model, sd


def test_text_tower_parity(hf_model, rng):
    model, sd = hf_model
    cfg = CLIPTextConfig(vocab_size=100, context_length=16, width=64,
                         layers=2, heads=4, output_dim=32, mlp_dim=128,
                         dtype="float32")
    enc = CLIPTextEncoder(cfg)
    params = convert_hf_clip_text(sd)
    tokens = rng.integers(1, 99, (2, 9)).astype(np.int32)
    tokens[:, -1] = 99  # highest id = EOT (argmax pooling)
    with torch.no_grad():
        hf_out = model.get_text_features(
            input_ids=torch.tensor(tokens.astype(np.int64))).numpy()
    ours = np.asarray(enc.apply({"params": params}, jnp.array(tokens)))
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-4)


def test_text_tower_token_features(hf_model, rng):
    model, sd = hf_model
    cfg = CLIPTextConfig(vocab_size=100, context_length=16, width=64,
                         layers=2, heads=4, output_dim=32, mlp_dim=128,
                         dtype="float32")
    enc = CLIPTextEncoder(cfg)
    params = convert_hf_clip_text(sd)
    tokens = rng.integers(1, 99, (2, 7)).astype(np.int32)
    tokens[:, -1] = 99
    out = np.asarray(enc.apply({"params": params}, jnp.array(tokens),
                               return_tokens=True))
    assert out.shape == (2, 7, 32)


def test_vision_tower_parity(hf_model, rng):
    model, sd = hf_model
    cfg = CLIPVisionConfig(image_size=32, patch_size=16, width=64, layers=2,
                           heads=4, output_dim=32, mlp_dim=128,
                           dtype="float32")
    enc = CLIPImageEncoder(cfg)
    params = convert_hf_clip_visual(sd)
    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        hf_out = model.get_image_features(
            pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(enc.apply({"params": params}, jnp.array(pixels)))
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-4)


def test_vision_fused_attention_matches_einsum():
    """The fused-kernel vision attention path (TPU default) must match the
    einsum formulation (interpret-mode Pallas on CPU)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vidchapters_tpu.models import clip as clip_mod
    from vidchapters_tpu.ops import fused_attention as fa

    cfg = clip_mod.CLIPVisionConfig(patch_size=32, width=64, layers=2,
                                    heads=4, output_dim=32, dtype="float32")
    enc = clip_mod.CLIPImageEncoder(cfg)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), pixels)["params"]

    old_flag = clip_mod.USE_FUSED_ATTENTION
    old_interp = getattr(fa, "INTERPRET", None)
    try:
        clip_mod.USE_FUSED_ATTENTION = False
        ref = enc.apply({"params": params}, pixels)
        clip_mod.USE_FUSED_ATTENTION = True
        # run the Pallas kernel in interpret mode on CPU
        import functools
        orig = fa.fused_attention_padded
        fa_interp = functools.partial(orig, interpret=True)
        fa.fused_attention_padded = fa_interp
        try:
            fused = enc.apply({"params": params}, pixels)
        finally:
            fa.fused_attention_padded = orig
    finally:
        clip_mod.USE_FUSED_ATTENTION = old_flag
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
