import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import PDVCConfig
from vidchapters_tpu.data.pdvc_dataset import (
    PDVCDataset,
    Translator,
    pdvc_collate,
    resize_features,
)
from vidchapters_tpu.models.pdvc import PDVC, box_cl_to_xy, box_xy_to_cl
from vidchapters_tpu.models.pdvc_loss import (
    count_loss,
    pdvc_criterion,
    pdvc_postprocess,
)


def tiny_cfg():
    return PDVCConfig(hidden_dim=64, nheads=4, enc_layers=2, dec_layers=2,
                      dim_feedforward=128, num_queries=8, num_feature_levels=3,
                      dec_n_points=2, enc_n_points=2, feature_dim=16,
                      frame_embedding_num=24, max_eseq_length=10,
                      dropout=0.0, vocab_size=50, max_caption_len=8,
                      rnn_size=32)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = PDVC(cfg)
    rng = np.random.default_rng(0)
    b = 2
    vf = jnp.asarray(rng.normal(size=(b, 24, 16)), jnp.float32)
    mask = jnp.ones((b, 24), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, vf, mask,
                        method=model.init_all)["params"]
    return cfg, model, params, vf, mask


def test_box_conversions():
    cl = jnp.array([[0.5, 0.5], [0.3, 0.2]])
    xy = box_cl_to_xy(cl)
    np.testing.assert_allclose(np.asarray(xy), [[0.25, 0.75], [0.2, 0.4]],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(box_xy_to_cl(xy)), np.asarray(cl),
                               atol=1e-6)


def test_forward_shapes(setup):
    cfg, model, params, vf, mask = setup
    out = model.apply({"params": params}, vf, mask)
    assert out["pred_logits"].shape == (2, 2, 8, 1)
    assert out["pred_boxes"].shape == (2, 2, 8, 2)
    assert out["pred_count"].shape == (2, 2, cfg.max_eseq_length + 1)
    assert out["hs"].shape == (2, 2, 8, 64)
    boxes = np.asarray(out["pred_boxes"])
    assert (boxes >= 0).all() and (boxes <= 1).all()


def test_criterion_runs_and_jits(setup):
    cfg, model, params, vf, mask = setup
    targets = {
        "boxes": jnp.asarray([[[0.3, 0.2], [0.7, 0.3], [0.0, 0.0]],
                              [[0.5, 0.5], [0.0, 0.0], [0.0, 0.0]]], jnp.float32),
        "valid": jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.int32),
        "captions": jnp.zeros((2, 3, 8), jnp.int32).at[:, :, 1].set(5)
        .at[:, :, 2].set(7),
    }

    @jax.jit
    def loss_fn(params):
        out = model.apply({"params": params}, vf, mask)
        return pdvc_criterion(model, params, out, targets, cfg)

    total, losses = loss_fn(params)
    assert np.isfinite(float(total))
    for key in ("loss_ce", "loss_bbox", "loss_giou", "loss_counter",
                "loss_caption", "loss_ce_0"):
        assert key in losses, key
        assert np.isfinite(float(losses[key])), key


def test_criterion_grads_flow(setup):
    cfg, model, params, vf, mask = setup
    targets = {
        "boxes": jnp.asarray([[[0.3, 0.2], [0.7, 0.3], [0.0, 0.0]],
                              [[0.5, 0.5], [0.0, 0.0], [0.0, 0.0]]], jnp.float32),
        "valid": jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.int32),
        "captions": jnp.zeros((2, 3, 8), jnp.int32).at[:, :, 1].set(5),
    }

    def loss_fn(params):
        out = model.apply({"params": params}, vf, mask)
        return pdvc_criterion(model, params, out, targets, cfg)[0]

    grads = jax.grad(loss_fn)(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                               for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0
    # caption head receives gradient
    cap_g = grads["captioner"]["logit_w"]
    assert float(jnp.abs(cap_g).max()) > 0


def test_count_loss_prefers_correct_count():
    cfg = tiny_cfg()
    good = jnp.full((1, 11), -5.0).at[0, 3].set(5.0)
    bad = jnp.full((1, 11), -5.0).at[0, 9].set(5.0)
    counts = jnp.array([3])
    assert float(count_loss(good, counts, cfg)) < float(count_loss(bad, counts, cfg))


def test_caption_sample_and_postprocess(setup):
    cfg, model, params, vf, mask = setup
    out = model.apply({"params": params}, vf, mask)
    hs_last = out["hs"][-1]
    feats = hs_last.reshape(-1, cfg.hidden_dim)
    toks, lps = model.apply({"params": params}, feats, cfg.max_caption_len,
                            method=model.caption_sample)
    assert toks.shape == (16, cfg.max_caption_len)
    seq = toks.reshape(2, 8, -1)
    cap_scores = lps.sum(-1).reshape(2, 8)
    post = pdvc_postprocess(out, jnp.asarray([100.0, 60.0]), seq, cap_scores)
    assert post["boxes"].shape == (2, 8, 2)
    assert (np.asarray(post["scores"][:, :-1]) >=
            np.asarray(post["scores"][:, 1:])).all()  # sorted
    assert (np.asarray(post["boxes"][0]) <= 100.0 + 1e-3).all()
    assert int(post["pred_seq_len"][0]) >= 1


def test_translator_roundtrip():
    tr = Translator.build(["the cat sat", "a dog ran fast", "the dog"])
    ids = tr.translate("the dog jumped", max_len=8)
    assert ids[0] == 0 and ids[-1] == 0
    assert tr.word_to_ix["jumped"] == tr.vocab_size  # unknown
    text = tr.rtranslate(ids[1:])
    assert text.startswith("the dog")
    # UNK is a real last vocab entry (reference build_vocab.py:52), so no
    # word's reverse mapping is shadowed — incl. the one at the last id
    assert tr.ix_to_word[tr.word_to_ix["fast"]] == "fast"
    assert tr.ix_to_word[tr.unk_id] == "UNK"


def test_translator_json_roundtrip(tmp_path):
    tr = Translator.build(["a b c", "a b", "a"])
    tr.translate("unseen words accrete in the defaultdict", max_len=16)
    path = tmp_path / "translator.json"
    tr.to_json(path)
    tr2 = Translator.from_json(str(path))
    # exact mapping round trip: every id decodes to the same word, incl.
    # the highest-id word (previously clobbered by the UNK shadow) and
    # none of the accreted unknown lookups leak in
    assert tr2.vocab_size == tr.vocab_size
    assert tr2.ix_to_word == tr.ix_to_word
    for w in ("a", "b", "c"):
        assert tr2.word_to_ix[w] == tr.word_to_ix[w]
    assert "unseen" not in tr2.ix_to_word.values()
    assert tr2.rtranslate([tr2.word_to_ix["c"]]) == "c."


def test_pdvc_dataset(tmp_path):
    import json

    cfg = tiny_cfg()
    ann = {"xxxxxxvid01": {"duration": 100.0,
                           "timestamps": [[0, 40], [40, 100]],
                           "sentences": ["first part", "second part"]}}
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    feat_dir = tmp_path / "f"
    feat_dir.mkdir()
    np.save(feat_dir / "xxxxxxvid01"[-11:], np.random.default_rng(0)
            .normal(size=(57, 16)).astype(np.float32))
    tr = Translator.build(["first part", "second part"])
    ds = PDVCDataset(str(p), str(feat_dir), tr, cfg, max_events=4)
    ex = ds[0]
    assert ex["video"].shape == (24, 16)
    assert ex["valid"].sum() == 2
    np.testing.assert_allclose(ex["boxes"][0], [0.2, 0.4], atol=1e-6)
    batch = pdvc_collate([ex])
    assert batch["boxes"].shape == (1, 4, 2)


def test_resize_features():
    feats = np.arange(10, dtype=np.float32)[:, None]
    out = resize_features(feats, 5)
    assert out.shape == (5, 1)
    np.testing.assert_allclose(out[0, 0], 0.0)
    np.testing.assert_allclose(out[-1, 0], 9.0)
