import os

import numpy as np
import pytest

from vidchapters_tpu.utils.misc import (
    AverageMeter,
    dict_to_markdown,
    l2_normalize_np_array,
    make_zipfile,
    pad_sequences_1d,
    pad_sequences_2d,
)
from vidchapters_tpu.utils.preproc_answer import preprocess_answer


def test_pad_sequences_1d():
    seqs = [np.ones((3, 2)), np.ones((5, 2))]
    out, mask = pad_sequences_1d(seqs)
    assert out.shape == (2, 5, 2)
    assert mask.sum() == 8
    out, mask = pad_sequences_1d(seqs, fixed_length=4)
    assert out.shape == (2, 4, 2)
    assert mask[1].sum() == 4  # truncated


def test_pad_sequences_2d():
    seqs = [[np.ones(2), np.ones(4)], [np.ones(3)]]
    out, mask = pad_sequences_2d(seqs)
    assert out.shape == (2, 2, 4)
    assert mask[0, 1].sum() == 4
    assert mask[1, 1].sum() == 0


def test_l2_normalize():
    x = np.array([[3.0, 4.0]])
    np.testing.assert_allclose(np.linalg.norm(l2_normalize_np_array(x)),
                               1.0, rtol=1e-4)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0


def test_make_zipfile(tmp_path):
    src = tmp_path / "code"
    (src / "pkg").mkdir(parents=True)
    (src / "pkg" / "a.py").write_text("x = 1")
    (src / "pkg" / "b.pyc").write_text("junk")
    (src / ".git").mkdir()
    (src / ".git" / "c").write_text("junk")
    out = tmp_path / "snap.zip"
    make_zipfile(str(src), str(out), enclosing_dir="code")
    import zipfile

    names = zipfile.ZipFile(out).namelist()
    assert "code/pkg/a.py" in names
    assert not any(".pyc" in n or ".git" in n for n in names)


def test_dict_to_markdown():
    md = dict_to_markdown({"lr": 0.001, "name": "test"})
    assert "| lr | 0.001 |" in md


def test_preprocess_answer():
    assert preprocess_answer("The TWO dogs!") == "2 dogs"
    assert preprocess_answer("dont") == "don't"
    assert preprocess_answer("a cat.") == "cat"


def test_pdvc_two_stage_proposals():
    import jax
    import jax.numpy as jnp

    from vidchapters_tpu.config import PDVCConfig
    from vidchapters_tpu.models.pdvc import PDVC

    cfg = PDVCConfig(hidden_dim=64, nheads=4, enc_layers=1, dec_layers=2,
                     dim_feedforward=128, num_queries=6, num_feature_levels=2,
                     dec_n_points=2, enc_n_points=2, feature_dim=8,
                     frame_embedding_num=16, dropout=0.0, vocab_size=20,
                     max_caption_len=6, rnn_size=16)
    model = PDVC(cfg)
    rng = np.random.default_rng(0)
    vf = jnp.asarray(rng.normal(size=(2, 16, 8)), jnp.float32)
    mask = jnp.ones((2, 16), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, vf, mask,
                        method=model.init_all)["params"]

    def fwd_two_stage(mdl, vf, mask, proposals, pmask):
        memory, mask_flat, shapes, ratios = mdl.encode(vf, mask)
        return mdl.decode(memory, mask_flat, shapes, ratios,
                          proposals=proposals, proposals_mask=pmask)

    proposals = jnp.asarray(rng.uniform(0.2, 0.8, (2, 3, 2)), jnp.float32)
    pmask = jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.int32)
    hs, init_ref, inter_refs = model.apply(
        {"params": params}, vf, mask, proposals, pmask, method=fwd_two_stage)
    assert hs.shape == (2, 2, 3, 64)  # [layers, B, n_proposals, C]
    np.testing.assert_allclose(np.asarray(init_ref),
                               np.asarray(proposals[..., :1]), atol=1e-6)
