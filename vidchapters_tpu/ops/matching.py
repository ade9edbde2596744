"""Hungarian (linear sum assignment) matching, jit-safe with static shapes.

The reference solves LSAP on host CPU with scipy per batch element
(moment_detr/moment_detr/matcher.py:100-117, PDVC/pdvc/matcher.py:100-117),
forcing a device->host sync mid-step. Here the default is a pure-JAX
auction-style solver that runs on-device inside jit over padded fixed-size
cost matrices; an exact scipy path via ``jax.pure_callback`` is provided for
verification and as a fallback.

Shapes are static: cost [Q, T_max] with a validity mask over targets. The
result is, for each target slot, its assigned query (or -1 when invalid).
"""

from __future__ import annotations




import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

BIG = 1e9


def scipy_lsap(cost: np.ndarray, n_valid: int) -> np.ndarray:
    """Exact LSAP on host (outside jit): cost [Q, T] -> assignment [T].

    Host callbacks are NOT used: the axon TPU PJRT backend rejects
    jax.pure_callback outright, so the exact scipy path only exists as an
    eager verification oracle for the on-device auction solver.
    """
    from scipy.optimize import linear_sum_assignment

    q, t = cost.shape
    n = int(n_valid)
    out = np.full(t, -1, np.int32)
    if n > 0:
        rows, cols = linear_sum_assignment(cost[:, :n])
        out[cols] = rows.astype(np.int32)
    return out


def auction_lsap(cost: Array, valid: Array, num_iters: int = 200,
                 eps: float = 1e-3) -> Array:
    """Approximate min-cost assignment fully on device.

    Forward auction over targets bidding for queries: each unassigned valid
    target bids for its best query with an increment (best - second best +
    eps). Converges to the optimal assignment for eps < gap/n; with a fixed
    iteration count this is an anytime approximation that is exact on all but
    adversarially-tight cost matrices.

    cost: [Q, T]; valid: [T] bool. Returns [T] assigned query per target
    (-1 for invalid targets).
    """
    q, t = cost.shape
    value = -cost.T  # targets maximize value: [T, Q]
    value = jnp.where(valid[:, None], value, -BIG)

    prices0 = jnp.zeros(q)
    owner0 = jnp.full(q, -1, jnp.int32)  # query -> target
    assign0 = jnp.full(t, -1, jnp.int32)  # target -> query

    def body(_, state):
        prices, owner, assign = state
        unassigned = (assign < 0) & valid
        net = value - prices[None, :]  # [T, Q]
        best_q = jnp.argmax(net, axis=1)
        best_v = jnp.max(net, axis=1)
        net_wo_best = jnp.where(
            jax.nn.one_hot(best_q, q, dtype=bool), -jnp.inf, net)
        second_v = jnp.max(net_wo_best, axis=1)
        second_v = jnp.where(jnp.isfinite(second_v), second_v, best_v)
        bid = best_v - second_v + eps

        # one bidder per query per round: pick the unassigned target with the
        # highest bid for each query
        bid_matrix = jnp.where(
            unassigned[:, None] & jax.nn.one_hot(best_q, q, dtype=bool),
            bid[:, None], -jnp.inf)  # [T, Q]
        winner_t = jnp.argmax(bid_matrix, axis=0)  # [Q]
        winner_bid = jnp.max(bid_matrix, axis=0)
        has_bid = jnp.isfinite(winner_bid)

        # evict previous owner, assign winner, raise price
        prev_owner = owner
        new_owner = jnp.where(has_bid, winner_t.astype(jnp.int32), owner)
        new_prices = jnp.where(has_bid, prices + winner_bid, prices)
        # targets evicted from their query lose their assignment
        evicted = jnp.zeros(t, bool).at[jnp.where(
            (prev_owner >= 0) & has_bid, prev_owner, t)].set(True, mode="drop")
        assign = jnp.where(evicted, -1, assign)
        assign = assign.at[jnp.where(has_bid, winner_t, t)].set(
            jnp.arange(q, dtype=jnp.int32), mode="drop")
        return new_prices, new_owner, assign

    _, _, assign = jax.lax.fori_loop(0, num_iters, body, (prices0, owner0, assign0))
    return jnp.where(valid, assign, -1)


def hungarian_match(cost: Array, valid: Array, exact: bool = False) -> Array:
    """[Q, T] cost + [T] validity -> [T] assigned query indices (-1 invalid).

    ``exact=True`` solves with scipy eagerly on the host (NOT jit-safe; used
    as a verification oracle — the reference matcher's semantics,
    moment_detr/matcher.py:100-117). ``exact=False`` (default) stays on
    device with the auction solver, the TPU production path.
    """
    if exact:
        n_valid = int(np.asarray(valid).sum())
        masked = np.where(np.asarray(valid)[None, :], np.asarray(cost), BIG)
        return jnp.asarray(scipy_lsap(masked, n_valid))
    return auction_lsap(cost, valid)
