"""BERT encoder parity vs transformers' torch BertModel (random weights)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vidchapters_tpu.models.bert import BertConfig, BertModel, convert_hf_bert

torch = pytest.importorskip("torch")
import transformers  # noqa: E402


def test_bert_parity(rng):
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=24, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = transformers.BertModel(hf_cfg).eval()
    cfg = BertConfig(vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
                     intermediate_size=64, max_position_embeddings=24)
    model = BertModel(cfg)
    params = convert_hf_bert({k: v.numpy() for k, v in hf.state_dict().items()})

    ids = rng.integers(1, 119, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[0, -3:] = 0
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                    attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.array(ids),
                                  jnp.array(mask)))
    # padded positions attend differently in HF (they're masked as queries
    # too via extended mask? no — HF masks only keys); compare valid positions
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], hf_out[valid], rtol=3e-4,
                               atol=3e-4)
