"""Executable analysis classifiers: toxicity (BERT head) parity vs
transformers, and the CLIP-NSFW MLP head."""

import numpy as np
import pytest

from vidchapters_tpu.factory.analysis import (
    build_nsfw_scorer,
    build_toxicity_scorer,
    toxicity_stats,
)

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

VOCAB_WORDS = ["hello", "world", "this", "video", "is", "great", "awful",
               "terrible", "nice", "content"]


@pytest.fixture(scope="module")
def tiny_cls_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("toxbert")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + VOCAB_WORDS
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = transformers.BertTokenizer(str(d / "vocab.txt"))
    tok.save_pretrained(str(d))
    torch.manual_seed(0)
    cfg = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2, num_labels=6,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = transformers.BertForSequenceClassification(cfg).eval()
    hf.save_pretrained(str(d))
    return str(d), hf, tok


def test_toxicity_scorer_matches_transformers(tiny_cls_dir):
    model_dir, hf, tok = tiny_cls_dir
    scorer = build_toxicity_scorer(model_dir, max_length=16)
    for text in ["hello world this video is great", "awful terrible content"]:
        enc = tok([text], truncation=True, max_length=16,
                  padding="max_length", return_tensors="pt")
        with torch.no_grad():
            expected = torch.sigmoid(hf(**enc).logits)[0, 0].item()
        assert scorer(text) == pytest.approx(expected, abs=2e-4)


def test_toxicity_stats_with_real_scorer(tiny_cls_dir):
    model_dir, _, _ = tiny_cls_dir
    scorer = build_toxicity_scorer(model_dir, max_length=16)
    stats = toxicity_stats(["hello world", "awful content"], scorer=scorer)
    assert 0.0 <= stats["mean_score"] <= 1.0
    assert 0.0 <= stats["toxic_fraction"] <= 1.0


def test_nsfw_scorer_mlp(tmp_path):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(8, 4)).astype(np.float32)
    b0 = rng.normal(size=(4,)).astype(np.float32)
    w1 = rng.normal(size=(4, 1)).astype(np.float32)
    b1 = rng.normal(size=(1,)).astype(np.float32)
    path = tmp_path / "nsfw.npz"
    np.savez(path, w0=w0, b0=b0, w1=w1, b1=b1)
    scorer = build_nsfw_scorer(str(path))
    emb = rng.normal(size=(3, 8)).astype(np.float32)
    out = scorer(emb)
    # reference forward
    x = emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
    expected = 1.0 / (1.0 + np.exp(-(np.maximum(x @ w0 + b0, 0) @ w1 + b1)))
    np.testing.assert_allclose(out, expected[:, 0], rtol=1e-5)
    assert ((out >= 0) & (out <= 1)).all()
