"""Exact assignment OT on TPU: batched eps-scaled Jacobi auction.

The reference's flagship SHWD loss calls POT's CPU network simplex per batch
item (``s2_wasserstein.py:40-45``) — exact EMD, and the gradients the outer
minimization sees are the optimal plan (envelope theorem, POT's torch
backend). TPUs have no network simplex, and entropic Sinkhorn's O(eps) plan
blur stalls Wasserstein flows ~100x above the exact fixed point (measured on
the Flow_cube benchmark). This module is the TPU-native answer SURVEY.md §2
calls for ("small-N exact solver — auction kernel"):

Bertsekas' auction algorithm, synchronous (Jacobi) bidding, for the
equal-size uniform-marginal case (all the reference ever solves: N == M,
weights 1/N — then EMD is an assignment problem by Birkhoff). Every sweep is
dense (B, N, M) matrix work — max/one-hot/segment-max on the VPU, no
scalar loops — batched over all problems at once, inside one jit. With
eps-complementary slackness the result is within N * eps_final of optimal;
eps-scaling keeps the sweep count low.

Gradient: ``auction_emd2`` has a custom VJP — d<P, C>/dC = P, the optimal
permutation /N — identical in structure to POT's backward, so SHWD training
semantics match the reference exactly, on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e30


def _owner_from_assign(assign, n, m):
    """object->person map consistent with a (partial) person->object map."""
    onehot = jax.nn.one_hot(
        jnp.where(assign >= 0, assign, m), m + 1,
        dtype=jnp.int32)[..., :m]                     # (B, N, M)
    ids = jnp.arange(n, dtype=jnp.int32)
    return jnp.einsum("bnm,n->bm", onehot, ids + 1).astype(jnp.int32) - 1


def _auction_phase(cost, prices, eps, max_sweeps, assign0=None, owner0=None):
    """One eps-phase of synchronous auction. cost: (B, N, M) to MINIMIZE.

    By default starts with everyone unassigned (prices warm-started from the
    previous phase); pass ``assign0``/``owner0`` to keep a partial matching
    whose pairs already satisfy eps-CS — those persons never bid, so a
    fully-valid carried assignment costs zero sweeps. Returns
    (assignment (B, N) int32 person->object, prices, sweeps).
    """
    b, n, m = cost.shape
    dtype = cost.dtype
    benefit = -cost                                   # maximize benefit

    def cond(carry):
        assign, owner, prices, sweeps = carry
        return jnp.logical_and(jnp.any(assign < 0), sweeps < max_sweeps)

    def body(carry):
        # dense (B, N, M) one_hot/reduction sweep: measured 2x faster than
        # the scatter-based formulation on TPU (XLA scatters serialize;
        # dense selects/reductions ride the VPU), and exact top_k lowers to
        # a full per-row sort (~40x slower) — keep it dense.
        assign, owner, prices, sweeps = carry
        unassigned = assign < 0                       # (B, N)

        value = benefit - prices[:, None, :]          # (B, N, M)
        best = jnp.max(value, axis=-1)                # (B, N)
        jbest = jnp.argmax(value, axis=-1)            # (B, N)
        # second-best: mask out the best column
        masked = jnp.where(
            jax.nn.one_hot(jbest, m, dtype=bool), _NEG, value)
        second = jnp.max(masked, axis=-1)             # (B, N)

        bid = prices[jnp.arange(b)[:, None], jbest] + (best - second) + eps
        bid = jnp.where(unassigned, bid, _NEG)        # only unassigned bid

        # per object: the highest bid wins (one-hot mask + column max)
        bids_mat = jnp.where(
            jax.nn.one_hot(jbest, m, dtype=bool) & unassigned[..., None],
            bid[..., None], _NEG)                     # (B, N, M)
        win_bid = jnp.max(bids_mat, axis=1)           # (B, M)
        win_person = jnp.argmax(bids_mat, axis=1)     # (B, M)
        got_bid = win_bid > _NEG / 2

        new_prices = jnp.where(got_bid, win_bid, prices)
        # previous owner of a re-auctioned object loses it
        new_owner = jnp.where(got_bid, win_person.astype(jnp.int32), owner)

        # rebuild person->object from object->person (one pass, no scatter)
        obj_ids = jnp.arange(m, dtype=jnp.int32)
        onehot_owner = jax.nn.one_hot(
            jnp.where(new_owner >= 0, new_owner, n), n + 1,
            dtype=jnp.int32)[..., :n]                 # (B, M, N)
        assign_new = jnp.einsum(
            "bmn,m->bn", onehot_owner, obj_ids + 1).astype(jnp.int32) - 1

        return assign_new, new_owner, new_prices, sweeps + 1

    if assign0 is None:
        assign0 = jnp.full((b, n), -1, jnp.int32)
    if owner0 is None:
        owner0 = jnp.full((b, m), -1, jnp.int32)
    assign, owner, prices, sweeps = jax.lax.while_loop(
        cond, body, (assign0, owner0, prices, jnp.zeros((), jnp.int32)))
    return assign, prices, sweeps


@functools.partial(jax.jit, static_argnames=("scale_factor", "max_sweeps"))
def auction_assignment(cost: jax.Array, eps_final: float = 1e-6,
                       scale_factor: float = 6.0, max_sweeps: int = 2000,
                       prices0: jax.Array | None = None,
                       eps0: jax.Array | float | None = None):
    """Solve min_perm mean_i C[i, perm(i)] for a batch of square costs.

    cost: (B, N, N). Returns (assignment (B, N) int32, final dual prices
    (B, N), total sweeps used). eps-scaling: eps starts at ~max|C|/8 and
    divides by ``scale_factor`` until <= eps_final. ``prices0``/``eps0``
    warm-start the dual prices — e.g. from annealed-Sinkhorn potentials
    (see ``hybrid_emd2``) or the previous optimum of a slowly-moving
    problem (see ``warm_emd2``), which skips the expensive large-eps
    price-discovery phases entirely.
    """
    b, n, m = cost.shape
    assert n == m, "auction solves the equal-size assignment case"
    c_range = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(cost) - jnp.min(cost), 1e-12))

    def cond(carry):
        done, *_ = carry
        return jnp.logical_not(done)

    def phase(carry):
        done, eps, prices, assign, total = carry
        assign, prices, s = _auction_phase(
            cost, prices, jnp.maximum(eps, eps_final), max_sweeps)
        return (eps <= eps_final, eps / scale_factor, prices, assign,
                total + s)

    if eps0 is None:
        eps0 = c_range / 8.0
    if prices0 is None:
        prices0 = jnp.zeros((b, m), cost.dtype)
    assign0 = jnp.zeros((b, n), jnp.int32)
    done, eps, prices, assign, total = jax.lax.while_loop(
        cond, phase,
        (jnp.zeros((), bool), jnp.asarray(eps0, cost.dtype), prices0,
         assign0, jnp.zeros((), jnp.int32)))
    return assign, prices, total


def _assignment_cost(cost, assign):
    b, n, _ = cost.shape
    picked = jnp.take_along_axis(cost, assign[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    return jnp.mean(picked, axis=-1)


def _hybrid_assignment(cost, eps_final, sink_eps=1e-5, sink_iters=100,
                       sink_scales=8, max_sweeps=4000):
    """Annealed-Sinkhorn duals -> auction cleanup. The Sinkhorn potentials
    are eps-complementary-slack prices, so the auction skips its expensive
    price-discovery phases and only resolves the near-ties the entropic
    plan mixes (the failure mode that costs synchronous auction ~50k sweeps
    from cold prices at awkward cost spreads)."""
    from .sinkhorn import emd2_approx
    _, f, g = emd2_approx(cost, eps=sink_eps, num_iters=sink_iters,
                          num_scales=sink_scales, return_potentials=True)
    prices0 = jax.lax.stop_gradient(-g)      # benefit = -C; dual price ~ g
    # start eps well below the cost range (the warm prices carry the coarse
    # structure) but high enough to repair unconverged duals on far clouds:
    # range/1e4 measured best across spreads (72-280 ms at N=1200 vs 60 s
    # for eps0 ~ eps_final and 95 s for cold-start-style range/8)
    c_range = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(cost) - jnp.min(cost), 1e-12))
    eps0 = jnp.maximum(c_range * 1e-4, eps_final * 10.0).astype(cost.dtype)
    assign, _, sweeps = auction_assignment(jax.lax.stop_gradient(cost),
                                           eps_final, max_sweeps=max_sweeps,
                                           prices0=prices0, eps0=eps0)
    # sweep-cap safety: any person still unassigned falls back to its row
    # argmin (never triggers with warm-started prices in practice; avoids
    # out-of-range gathers if it ever does)
    assign = jnp.where(assign < 0,
                       jnp.argmin(cost, axis=-1).astype(jnp.int32), assign)
    return assign, sweeps


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def hybrid_emd2(cost: jax.Array, eps_final: float = 1e-7,
                sink_eps: float = 1e-5, sink_iters: int = 100,
                sink_scales: int = 8) -> jax.Array:
    """Exact EMD for (B, N, N) uniform problems, all on device: annealed
    Sinkhorn for the duals + warm-started auction for the exact permutation.
    Differentiable wrt cost (VJP = permutation plan / N). The Sinkhorn
    schedule only warms the auction (the permutation is exact regardless);
    shorter schedules trade a few extra auction sweeps for less logsumexp
    time."""
    assign, _ = _hybrid_assignment(cost, eps_final, sink_eps, sink_iters,
                                   sink_scales)
    return _assignment_cost(cost, assign)


def _hybrid_fwd(cost, eps_final, sink_eps, sink_iters, sink_scales):
    assign, _ = _hybrid_assignment(cost, eps_final, sink_eps, sink_iters,
                                   sink_scales)
    return _assignment_cost(cost, assign), (assign, cost.shape[-1])


hybrid_emd2.defvjp(_hybrid_fwd,
                   lambda e, se, si, ss, res, g: _emd2_bwd(e, res, g))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def auction_emd2(cost: jax.Array, eps_final: float = 1e-6) -> jax.Array:
    """Exact (to N * eps_final) EMD <P*, C> for (B, N, N) uniform problems.

    Differentiable wrt cost: VJP = the optimal permutation plan / N —
    the same envelope gradient the reference extracts from ``ot.emd2``.
    """
    assign, _, _ = auction_assignment(cost, eps_final)
    return _assignment_cost(cost, assign)


def _emd2_fwd(cost, eps_final):
    assign, _, _ = auction_assignment(cost, eps_final)
    return _assignment_cost(cost, assign), (assign, cost.shape[-1])


def _emd2_bwd(eps_final, res, g):
    assign, n = res
    plan = jax.nn.one_hot(assign, n, dtype=g.dtype) / n     # (B, N, N)
    return (g[:, None, None] * plan,)


auction_emd2.defvjp(_emd2_fwd, _emd2_bwd)


# -- persistent-dual exact EMD (the iterative-driver fast path) --------------

def init_warm_state(cost: jax.Array):
    """(assignment, prices) for ``warm_emd2``'s first call: one full hybrid
    solve (annealed-Sinkhorn duals + auction) on the initial cost. Paid once,
    outside the step loop."""
    c_sg = jax.lax.stop_gradient(cost)
    assign, sweeps = _hybrid_assignment(c_sg, 1e-7)
    # recover eps-CS prices for the assignment: the hybrid path's auction
    # already ends with them, so redo the final bookkeeping cheaply via a
    # zero-sweep repair at a loose eps (prices from Sinkhorn duals)
    from .sinkhorn import emd2_approx
    _, _, g = emd2_approx(c_sg, eps=1e-5, num_iters=100, num_scales=8,
                          return_potentials=True)
    return assign, jax.lax.stop_gradient(-g)


def _warm_solve(cost, assign, prices, eps_final, max_sweeps=4000):
    """Repair a carried (assignment, prices) pair for a drifted cost.

    Per eps-phase: keep every person whose pair still satisfies eps-CS at
    the current prices, unassign only the violators, and let the auction
    re-bid those. A step where nothing moved is a pure CS check (zero
    sweeps); a small drift re-auctions only the affected persons. The eps
    schedule starts at the *measured* worst CS violation, so the phase
    count adapts to the drift instead of rediscovering the whole price
    landscape like a cold eps-scaled run.
    """
    b, n, m = cost.shape
    benefit = -cost

    big = jnp.asarray(jnp.finfo(cost.dtype).max / 4, cost.dtype)

    def slack_of(assign, prices):
        value = benefit - prices[:, None, :]
        vmax = jnp.max(value, axis=-1)                          # (B, N)
        v_own = jnp.take_along_axis(
            value, jnp.maximum(assign, 0)[..., None], axis=-1)[..., 0]
        return jnp.where(assign >= 0, vmax - v_own, big)        # (B, N)

    s0 = slack_of(assign, prices)
    eps0 = jnp.clip(jnp.max(jnp.where(s0 >= big, 0.0, s0)),
                    eps_final, None).astype(cost.dtype)

    def cond(carry):
        done, *_ = carry
        return jnp.logical_not(done)

    def phase(carry):
        done, eps, assign, prices, total = carry
        e = jnp.maximum(eps, eps_final)
        keep = slack_of(assign, prices) <= e
        assign_init = jnp.where(keep, assign, -1)
        owner_init = _owner_from_assign(assign_init, n, m)
        assign, prices, s = _auction_phase(cost, prices, e, max_sweeps,
                                           assign_init, owner_init)
        return (eps <= eps_final, eps / 8.0, assign, prices, total + s)

    done, eps, assign, prices, total = jax.lax.while_loop(
        cond, phase, (jnp.zeros((), bool), eps0, assign, prices,
                      jnp.zeros((), jnp.int32)))
    # sweep-cap safety (never triggers with a sane carried state)
    assign = jnp.where(assign < 0,
                       jnp.argmin(cost, axis=-1).astype(jnp.int32), assign)
    # recenter: auction is shift-invariant per problem, and recentering
    # stops monotone price growth from accumulating over carried steps
    prices = prices - jnp.mean(prices, axis=-1, keepdims=True)
    return assign, prices


def warm_emd2(cost: jax.Array, state, eps_final: float = 1e-7):
    """Exact EMD for (B, N, N) uniform problems with a carried solver state.

    ``state = (assignment (B, N) int32, prices (B, N))`` from the previous
    call (seed with ``init_warm_state``). For iterative drivers (Wasserstein
    flows, adversarial phi updates) the clouds move a little per step, so
    the previous optimum is eps-complementary-slack up to the movement —
    the auction repairs only the violated persons instead of re-running
    ``hybrid_emd2``'s annealed-Sinkhorn + cold auction per call.

    Returns (value (B,), new_state). Differentiable wrt cost: the solve runs
    on a detached cost and the value is a gather, so the native VJP is the
    permutation plan / N — the same envelope gradient (reference ot.emd2
    semantics) the custom VJPs above implement. The state carries no
    gradient (int assignment; prices come from the detached solve).
    """
    assign0, prices0 = state
    c_sg = jax.lax.stop_gradient(cost)
    assign, prices = _warm_solve(c_sg, assign0, prices0, eps_final)
    return _assignment_cost(cost, assign), (assign, prices)
