"""Unit tests for the beam-decode primitives added in round 2:
iterative small-k top-k (must match lax.top_k exactly, ties included)
and the permutation-matmul row reorder (bit-exact for bf16)."""

import numpy as np

import jax
import jax.numpy as jnp

from vidchapters_tpu.ops.decoding import _permute_rows, _topk_iterative


def test_topk_iterative_matches_lax_top_k():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 400)).astype(np.float32))
    for k in (1, 4, 8):
        v_ref, i_ref = jax.lax.top_k(x, k)
        v, i = _topk_iterative(x, k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_topk_iterative_tie_break_lowest_index():
    x = jnp.asarray(np.array([[1.0, 3.0, 3.0, 2.0, 3.0]], np.float32))
    v_ref, i_ref = jax.lax.top_k(x, 3)
    v, i = _topk_iterative(x, 3)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(i), [[1, 2, 4]])


def test_permute_rows_small_uses_gather_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    src = jnp.asarray([3, 3, 0, 7, 1, 1, 2, 5], jnp.int32)
    out = _permute_rows(x, src)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[np.asarray(src)])


def test_permute_rows_matmul_bitexact_bf16():
    """Above the size threshold the one-hot matmul path must reproduce the
    gather bit-for-bit (each output row = 1.0 * one input row)."""
    rng = np.random.default_rng(2)
    b = 16
    n = (1 << 26) // b + 1024  # cross the matmul threshold
    x = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32)).astype(
        jnp.bfloat16)
    src = jnp.asarray(rng.integers(0, b, (b,)), jnp.int32)
    out = _permute_rows(x, src)
    expected = jnp.take(x, src, axis=0)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out, dtype=np.float32), np.asarray(expected, np.float32))
