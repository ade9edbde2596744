import numpy as np
import pytest

from vidchapters_tpu.data.span_corruption import (
    apply_sentinels,
    random_spans_noise_mask,
    sentinel_mask_ids,
    span_corrupt,
)
from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer


def test_noise_mask_density(rng):
    for length in [10, 100, 1000]:
        mask = random_spans_noise_mask(length, 0.25, 5.0, rng)
        assert mask.shape == (length,)
        expected = min(max(int(round(length * 0.25)), 1), length - 1)
        assert mask.sum() == expected
        assert not mask[0]  # always starts with a non-noise span


def test_noise_mask_degenerate_lengths(rng):
    mask = random_spans_noise_mask(2, 0.25, 5.0, rng)
    assert mask.sum() == 1


def test_sentinel_ids_layout():
    mask = np.array([0, 1, 1, 0, 1, 0], dtype=bool)
    ids = sentinel_mask_ids(mask, text_vocab_size=32100)
    assert ids[1] == 32099  # first span start = <extra_id_0>
    assert ids[2] == -1  # interior deleted
    assert ids[4] == 32098  # second span
    assert ids[0] == 0 and ids[3] == 0 and ids[5] == 0


def test_apply_sentinels():
    input_ids = np.array([10, 11, 12, 13, 14, 15])
    mask = np.array([0, 1, 1, 0, 1, 0], dtype=bool)
    sids = sentinel_mask_ids(mask, 32100)
    out = apply_sentinels(input_ids, sids, eos_id=1)
    assert list(out) == [10, 32099, 13, 32098, 15, 1]


def test_span_corrupt_pair(rng):
    tok = ByteLevelTokenizer()
    ids = tok.encode("the quick brown fox jumps over the lazy dog " * 4)
    corrupted, targets = span_corrupt(ids, tok, rng=rng)
    assert corrupted[-1] == tok.eos_token_id
    assert targets[-1] == tok.eos_token_id
    # corrupted + targets together cover all original tokens once
    n_sentinels_c = ((corrupted >= 32000) & (corrupted < 32100)).sum()
    n_sentinels_t = ((targets >= 32000) & (targets < 32100)).sum()
    orig_len = len(ids)
    assert (len(corrupted) - 1 - n_sentinels_c) + (len(targets) - 1 - n_sentinels_t) == orig_len


def test_span_corrupt_short_sequence(rng):
    tok = ByteLevelTokenizer()
    corrupted, targets = span_corrupt([tok.eos_token_id], tok, rng=rng)
    assert list(corrupted) == [0]
    assert list(targets) == [tok.eos_token_id]


def test_denoise_length_bounds_never_truncate(rng):
    from vidchapters_tpu.data.dvc_dataset import denoise_length_bounds

    tok = ByteLevelTokenizer()
    for L in (10, 100, 500, 1000):
        bound_in, bound_out = denoise_length_bounds(L)
        for _ in range(30):
            n = int(rng.integers(2, L + 1))
            ids = rng.integers(3, 200, n)
            corrupted, targets = span_corrupt(ids, tok, rng=rng)
            assert len(corrupted) <= bound_in, (n, len(corrupted), bound_in)
            assert len(targets) <= bound_out, (n, len(targets), bound_out)
