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


def auction_lsap(cost: Array, valid: Array, num_iters: int = 1500,
                 eps: float = 1e-7, phases: int = 6,
                 theta: float = 10.0) -> Array:
    """Min-cost assignment fully on device.

    Forward auction over targets bidding for queries: each unassigned valid
    target bids for its best query with an increment (best - second best +
    eps). Two regimes, chosen statically from the shapes (measured in
    tests/test_span_ops_matching.py::test_auction_agreement_at_pdvc_scale):

    - SPARSE (T < Q, the usual PDVC/grounding case): a single phase at a
      fixed small eps, run to convergence under a round cap (the while
      loop exits as soon as everyone is assigned, so typical instances pay
      only tens of rounds). With free queries available eviction cascades
      terminate; measured near-exact vs scipy at Q=100 up to T = 90
      (max relative cost gap 8e-6 over PDVC-like costs).
    - DENSE (T = Q): padded to a SQUARE assignment with indifferent dummy
      targets, then Bertsekas eps-scaling — ``phases`` rounds with eps
      shrinking geometrically from half the value range, prices persisting
      and assignments resetting per phase, each phase run to convergence.
      A single fixed-eps pass left half the targets unassigned at
      Q = T = 100; eps-scaling with persistent prices is only valid for
      symmetric problems (asymmetric coarse phases inflate good-query
      prices and later phases settle elsewhere), and all-indifferent
      dummies make small-T square problems glacial — hence the split.

    A final greedy sweep assigns any still-unassigned target to its best
    free query, so the result is always a complete matching.

    cost: [Q, T]; valid: [T] bool. Returns [T] assigned query per target
    (-1 for invalid targets).
    """
    q, t_real = cost.shape
    # t_real may exceed q: T is a padded static max and surplus (or
    # unmatched-when-T>Q) targets simply stay at -1
    dense = t_real == q
    if dense:
        # [T, Q] values; invalid + dummy rows are indifferent (0 everywhere)
        # and absorb the unmatched queries
        value_real = jnp.where(valid[:, None], -cost.T, 0.0)
        value = jnp.concatenate(
            [value_real, jnp.zeros((q - t_real, q), value_real.dtype)],
            axis=0)
        t = q  # symmetric from here on
        valid_sq = jnp.ones((t,), bool)
        finite = jnp.where(valid[:, None], value_real, jnp.nan)
        vrange = jnp.nan_to_num(
            jnp.nanmax(finite) - jnp.nanmin(finite), nan=1.0)
        eps0 = jnp.maximum(vrange * 0.5, eps)
    else:
        value = jnp.where(valid[:, None], -cost.T, -BIG)
        t = t_real
        valid_sq = valid
        eps0 = jnp.float32(max(eps, 1e-3))
        phases = 1

    prices0 = jnp.zeros(q)
    assign0 = jnp.full(t, -1, jnp.int32)  # target -> query

    def round_body(state, phase_eps):
        prices, owner, assign = state
        unassigned = (assign < 0) & valid_sq
        net = value - prices[None, :]  # [T, Q]
        best_q = jnp.argmax(net, axis=1)
        best_v = jnp.max(net, axis=1)
        net_wo_best = jnp.where(
            jax.nn.one_hot(best_q, q, dtype=bool), -jnp.inf, net)
        second_v = jnp.max(net_wo_best, axis=1)
        second_v = jnp.where(jnp.isfinite(second_v), second_v, best_v)
        bid = best_v - second_v + phase_eps

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

    def phase_body(k, carry):
        prices, _, _ = carry
        if dense:
            phase_eps = jnp.maximum(
                eps0 / (theta ** k.astype(jnp.float32)), eps)
        else:
            phase_eps = eps0
        # assignments reset each phase; prices persist. Each phase runs to
        # convergence (everyone assigned = eps-CS holds) or the round cap —
        # eps-scaling's correctness needs converged phases, and warm prices
        # make later fine-eps phases converge in few rounds.
        state = (jnp.int32(0), prices, jnp.full(q, -1, jnp.int32), assign0)

        def cond(s):
            it, _, _, assign = s
            # only VALID unassigned targets keep the auction running:
            # invalid (padding) targets stay at -1 forever, and counting
            # them ran every instance to the full num_iters cap (measured
            # 593 of 613 ms/step of PDVC train, bench_profile_aux.py)
            return (it < num_iters) & jnp.any((assign < 0) & valid_sq)

        def step(s):
            it, prices, owner, assign = s
            prices, owner, assign = round_body((prices, owner, assign),
                                               phase_eps)
            return it + 1, prices, owner, assign

        _, prices, owner, assign = jax.lax.while_loop(cond, step, state)
        return prices, owner, assign

    _, _, assign = jax.lax.fori_loop(
        0, phases, phase_body, (prices0, jnp.full(q, -1, jnp.int32), assign0))

    # completion sweep: one unassigned target per round takes its best
    # still-free query (guarantees a complete matching in <= T rounds)
    def complete_body(_, assign):
        free_q = jnp.ones(q, bool).at[
            jnp.where(assign >= 0, assign, q)].set(False, mode="drop")
        unassigned = (assign < 0) & valid_sq
        idx = jnp.argmax(unassigned)
        row = jnp.where(free_q, jnp.take(value, idx, axis=0), -BIG)
        best = jnp.argmax(row).astype(jnp.int32)
        return jnp.where(jnp.any(unassigned) & jnp.any(free_q),
                         assign.at[idx].set(best), assign)

    assign = jax.lax.fori_loop(0, t, complete_body, assign)
    return jnp.where(valid, assign[:t_real], -1)



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
