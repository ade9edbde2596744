"""PRNG key construction for the hot training path.

The default JAX threefry PRNG generates dropout masks with ~100 scalar ops
per 32-bit draw; at the reference recipe a T5 FF activation dropout draws
25M bits per layer per pass, and the fused RNG measurably halves the FF
matmul fusions' throughput on v5e (74 vs 152 TFLOP/s for the same matmul
without in-fusion RNG — see BENCH_NOTES.md round-2 profile).  `rbg` keys
lower `random_bits` to XLA's native RngBitGenerator (fast on TPU, designed
for SPMD partitioning) while keeping threefry for split/fold_in, which only
touch scalar key material.  Same Bernoulli law, different (still
deterministic) stream.  Mirrors the MaxText/t5x production setting.

Init-time keys stay threefry (callers use jax.random.PRNGKey directly) so
parameter initialization is unchanged across this switch.
"""

from __future__ import annotations

import jax


def fast_train_key(seed: int) -> jax.Array:
    """A PRNG key for per-step dropout streams, using the rbg impl on all
    backends (CPU tests exercise the identical code path)."""
    return jax.random.key(seed, impl="rbg")
