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


def auction_lsap(cost: Array, valid: Array, num_iters: int = 4000,
                 eps: float = 1e-4, phases: int = 7,
                 theta: float = 10.0) -> Array:
    """Min-cost assignment fully on device.

    Forward auction over targets bidding for queries: each unassigned valid
    target bids for its best query with an increment (best - second best +
    eps). ONE code path for every validity count: invalid (padding) targets
    carry -BIG values and are excluded from the convergence condition, so
    typical instances settle in a handful of rounds.

    Straggler escape — escalating-eps continuation: if the fixed-eps pass
    hits its round cap with valid targets still unassigned (a price war:
    bids advance prices only ~eps per round, so a war over a value gap g
    needs ~g/eps rounds), up to ``phases - 1`` continuation stages re-run
    the bidding with eps multiplied by ``theta`` per stage. Assignments and
    prices PERSIST across stages — eps1-CS states remain eps2-CS for
    eps2 > eps1, so the final matching is (t * eps_final)-optimal where
    eps_final is the largest eps any straggler actually used; instances
    that converge in stage one keep the base-eps near-exactness. Defaults
    were grid-searched over tight (0.01-quantized), PDVC-focal, and
    normal cost distributions at Q=100, T in {5,50,75,100} incl. fully
    dense: eps=1e-4 / cap 4000 / 7 stages gives 144/144 instances within
    1e-4 relative of the scipy optimum (max gap 6.1e-5) — convergence,
    not eps, is the binding constraint, so the cap matters more than a
    finer eps (1e-5 at cap 1500 measured 3.5e-2 worst-case).

    History (tpu_parity.py finding, round 3): this function used to pick a
    DENSE regime statically whenever the PADDED target count equalled Q,
    padding invalids as indifferent zero-value dummies and running
    price-resetting eps-scaling. Production PDVC pads targets to
    Q = 100, so real instances with a few valid targets ran the dummy
    path, whose cap-truncated phases + greedy completion produced
    cap-dependent, backend-dependent assignments (measured 6.5% above
    optimal on a T=5 instance on TPU that was exact on CPU). The single
    sparse-style path with -BIG invalids is exact on those instances in
    1-2 rounds, and handles the genuinely dense square case as well
    (max relative cost gap 5.7e-6 over 30 random T=Q=100 instances,
    <=1117 rounds).

    A final greedy sweep assigns any still-unassigned target to its best
    free query, so the result is always a complete matching.

    cost: [Q, T]; valid: [T] bool. Returns [T] assigned query per target
    (-1 for invalid targets).
    """
    q, t = cost.shape
    # t may exceed q: T is a padded static max and surplus (or
    # unmatched-when-T>Q) targets simply stay at -1
    valid_b = valid > 0
    value = jnp.where(valid_b[:, None], -cost.T, -BIG)  # [T, Q]
    eps0 = jnp.float32(eps)

    def round_body(state, phase_eps):
        prices, owner, assign = state
        unassigned = (assign < 0) & valid_b
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

    # continuation stages pay a fraction of the base cap: they only matter
    # for rare cap-hitting stragglers, and an unassignable instance
    # (T_valid > Q) should not burn phases * num_iters rounds
    stage_cap = max(num_iters // 4, 64)

    def stage_body(k, carry):
        prices, owner, assign = carry
        phase_eps = eps0 * jnp.power(jnp.float32(theta),
                                     jnp.asarray(k, jnp.float32))
        cap = jnp.where(k == 0, num_iters, stage_cap)
        state = (jnp.int32(0), prices, owner, assign)

        def cond(s):
            it, _, _, assign = s
            # only VALID unassigned targets keep the auction running:
            # invalid (padding) targets stay at -1 forever, and counting
            # them ran every instance to the full num_iters cap (measured
            # 593 of 613 ms/step of PDVC train, bench_profile_aux.py)
            return (it < cap) & jnp.any((assign < 0) & valid_b)

        def step(s):
            it, prices, owner, assign = s
            prices, owner, assign = round_body((prices, owner, assign),
                                               phase_eps)
            return it + 1, prices, owner, assign

        _, prices, owner, assign = jax.lax.while_loop(cond, step, state)
        return prices, owner, assign

    _, _, assign = jax.lax.fori_loop(
        0, phases, stage_body,
        (jnp.zeros(q), jnp.full(q, -1, jnp.int32),
         jnp.full(t, -1, jnp.int32)))

    # completion sweep: one unassigned target per round takes its best
    # still-free query (guarantees a complete matching in <= T rounds)
    def complete_body(_, assign):
        free_q = jnp.ones(q, bool).at[
            jnp.where(assign >= 0, assign, q)].set(False, mode="drop")
        unassigned = (assign < 0) & valid_b
        idx = jnp.argmax(unassigned)
        row = jnp.where(free_q, jnp.take(value, idx, axis=0), -BIG)
        best = jnp.argmax(row).astype(jnp.int32)
        return jnp.where(jnp.any(unassigned) & jnp.any(free_q),
                         assign.at[idx].set(best), assign)

    assign = jax.lax.fori_loop(0, t, complete_body, assign)
    return jnp.where(valid_b, assign, -1)



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
