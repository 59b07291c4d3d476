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
    """object->person map from person->object (dense one-hot, no scatter)."""
    person_ids = jnp.arange(n, dtype=jnp.int32)
    onehot = jax.nn.one_hot(jnp.where(assign >= 0, assign, m), m + 1,
                            dtype=jnp.int32)[..., :m]          # (B, N, M)
    return jnp.einsum("bnm,n->bm", onehot, person_ids + 1).astype(
        jnp.int32) - 1


def _auction_phase(cost, prices, eps, max_sweeps, assign0=None):
    """One eps-phase of synchronous auction. cost: (B, N, M) to MINIMIZE.

    ``assign0`` carries the previous (larger-eps) phase's matching:
    pairs that already satisfy eps-CS at THIS eps are kept and only the
    violators re-enter the auction — the standard eps-scaling refinement.
    (Profiled at the flagship config: restarting every phase from scratch
    cost 1.9k sweeps, 1.2k of them re-discovering the first phase's matching
    — benchmarks/profile_hybrid.json deg45.) Prices are warm-started from
    the previous phase either way. Returns (assignment (B, N) int32
    person->object, prices, sweeps).
    """
    b, n, m = cost.shape
    dtype = cost.dtype
    benefit = -cost                                   # maximize benefit

    if assign0 is None:
        assign0 = jnp.full((b, n), -1, jnp.int32)
    else:
        # eps-CS screen: keep pairs with value within eps of the row best
        value0 = benefit - prices[:, None, :]
        best0 = jnp.max(value0, axis=-1)              # (B, N)
        v_own = jnp.take_along_axis(
            value0, jnp.maximum(assign0, 0)[..., None], axis=-1)[..., 0]
        keep = (assign0 >= 0) & (v_own >= best0 - eps)
        assign0 = jnp.where(keep, assign0, -1)
    owner0 = _owner_from_assign(assign0, n, m)

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

    assign, owner, prices, sweeps = jax.lax.while_loop(
        cond, body, (assign0, owner0, prices, jnp.zeros((), jnp.int32)))
    return assign, prices, sweeps


# NOTE (r5): a synchronous forward/REVERSE auction phase (Bertsekas &
# Castanon 1992 — unassigned objects cut prices to end bidding wars) was
# implemented and measured here: in lockstep Jacobi form the two halves
# fight (reverse price cuts re-trigger forward bidding on the same
# objects), and sweep counts EXPLODED 50-100x vs forward-only (60k vs 139
# at B=4 N=16; one config failed to produce a permutation at the sweep
# cap). The fw/rev win is inherently sequential: its switching rule needs
# per-stall alternation that dense synchronized sweeps cannot express.
# Removed; forward-only + eps-scaling + Sinkhorn-warmed prices stands.
# A per-item sweep histogram (same probe) shows the batch tail gates the
# while_loop (median 201 / p90 640 / max 1408 sweeps at 45-deg
# misalignment); chunked or gathered straggler solving models out at only
# ~1.5x because per-sweep cost shrinks sublinearly below B~32 on the VPU.


@functools.partial(jax.jit, static_argnames=("scale_factor", "max_sweeps"))
def auction_assignment(cost: jax.Array, eps_final: float = 1e-6,
                       scale_factor: float = 6.0, max_sweeps: int = 2000,
                       prices0: jax.Array | None = None,
                       eps0: jax.Array | float | None = None,
                       assign0: jax.Array | None = None):
    """Solve min_perm mean_i C[i, perm(i)] for a batch of square costs.

    cost: (B, N, N). Returns (assignment (B, N) int32, final dual prices
    (B, N), total sweeps used). eps-scaling: eps starts at ~max|C|/8 and
    divides by ``scale_factor`` until <= eps_final. ``prices0``/``eps0``
    warm-start the dual prices — e.g. from annealed-Sinkhorn potentials
    (see ``hybrid_emd2``), which skips the expensive large-eps
    price-discovery phases entirely. ``assign0`` additionally seeds the
    first phase's matching (pairs failing the eps-CS screen under THIS
    cost re-enter the auction, so a stale seed costs sweeps, never
    exactness) — used by the intra-step warm restart in ``hybrid_emd2``'s
    stateful variant.
    """
    b, n, m = cost.shape
    assert n == m, "auction solves the equal-size assignment case"
    c_range = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(cost) - jnp.min(cost), 1e-12))
    phase_fn = _auction_phase

    def cond(carry):
        done, *_ = carry
        return jnp.logical_not(done)

    def phase(carry):
        done, eps, prices, assign, total = carry
        # the phase keeps the previous phase's eps-CS-valid pairs (the
        # first phase sees all -1 and starts cold)
        assign, prices, s = phase_fn(
            cost, prices, jnp.maximum(eps, eps_final), max_sweeps,
            assign0=assign)
        return (eps <= eps_final, eps / scale_factor, prices, assign,
                total + s)

    if eps0 is None:
        eps0 = c_range / 8.0
    if prices0 is None:
        prices0 = jnp.zeros((b, m), cost.dtype)
    if assign0 is None:
        assign0 = jnp.full((b, n), -1, jnp.int32)
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


def _sinkhorn_warm_prices(cost, sink_eps, sink_iters, sink_scales):
    """Annealed-Sinkhorn dual potentials as auction starting prices.

    Shared by the cold paths of ``_hybrid_assignment`` and
    ``hybrid_assignment_warm``. The duals need no gradient (exactness
    comes from the auction), so the VMEM-resident Pallas schedule replaces
    ~2*iters HBM sweeps of the XLA loop whenever one (N, M) problem fits
    on-chip; small matrices (the B=128, N=128 trainer case) stay on the
    batched XLA sweep, which beats the one-block-per-item Pallas grid.
    """
    from .sinkhorn import emd2_approx
    from .sinkhorn_pallas import emd2_warmup_pallas, warmup_supported
    if (jax.default_backend() == "tpu" and cost.ndim == 3
            and cost.shape[-2] * cost.shape[-1] >= 512 * 512
            and warmup_supported(cost.shape[-2], cost.shape[-1])):
        _, f, g = emd2_warmup_pallas(
            jax.lax.stop_gradient(cost), eps=sink_eps,
            num_iters=sink_iters, num_scales=sink_scales)
    else:
        _, f, g = emd2_approx(jax.lax.stop_gradient(cost), eps=sink_eps,
                              num_iters=sink_iters, num_scales=sink_scales,
                              return_potentials=True)
    return jax.lax.stop_gradient(-g)      # benefit = -C; dual price ~ g


def _hybrid_assignment(cost, eps_final, sink_eps=1e-5, sink_iters=100,
                       sink_scales=8, max_sweeps=4000):
    """Annealed-Sinkhorn duals -> auction cleanup. The Sinkhorn potentials
    are eps-complementary-slack prices, so the auction skips its expensive
    price-discovery phases and only resolves the near-ties the entropic
    plan mixes (the failure mode that costs synchronous auction ~50k sweeps
    from cold prices at awkward cost spreads)."""
    prices0 = _sinkhorn_warm_prices(cost, sink_eps, sink_iters, sink_scales)
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


def hybrid_assignment_warm(cost: jax.Array, assign0: jax.Array,
                           prices0: jax.Array, eps_final: float = 1e-7,
                           sink_eps: float = 5e-3, sink_iters: int = 50,
                           sink_scales: int = 4, max_sweeps: int = 4000):
    """Exact assignment with an optional warm matching, decided at runtime.

    ``assign0``/``prices0``: a matching + duals from a solve on a NEARBY
    cost (e.g. the same clouds through phi one Adam step earlier — the
    intra-train-step case). If ``assign0`` is all -1 (the sentinel), the
    annealed-Sinkhorn warm-up runs instead (``lax.cond``, so only one
    branch executes). Warmth only buys sweeps, never exactness: the eps
    ladder screens and repairs every pair regardless. Measured at the
    flagship config, one-phi-step drift: 293 sweeps warm vs 1687 cold,
    identical values.

    NOT differentiable — callers take the value as
    ``take_along_axis(cost, assign_value)`` on the *undetached* cost,
    which reproduces the envelope gradient (d<P,C>/dC = P) through plain
    autodiff. Returns (assign_value, assign_warm, prices, sweeps):
    ``assign_value`` is argmin-patched for the gather; ``assign_warm``
    keeps -1 for any sweep-cap stragglers so it is always a safe seed.

    (Distinct from the rounds-2-3 persistent-dual solver that carried
    state ACROSS criterion calls and lost — benchmarks/warm_timing.json:
    cross-call drift spans new batches and whole adversarial phases, where
    repair costs more than annealed warm-up saves. Intra-step drift is one
    phi update at lr ~1e-4.)
    """
    cost = jax.lax.stop_gradient(cost)
    b, n, m = cost.shape
    use_warm = jnp.any(assign0 >= 0)

    prices = jax.lax.cond(
        use_warm, lambda _: prices0,
        lambda _: _sinkhorn_warm_prices(cost, sink_eps, sink_iters,
                                        sink_scales), None)
    c_range = jnp.maximum(jnp.max(cost) - jnp.min(cost), 1e-12)
    eps0 = jnp.maximum(c_range * 1e-4, eps_final * 10.0).astype(cost.dtype)
    assign, prices, sweeps = auction_assignment(
        cost, eps_final, max_sweeps=max_sweeps, prices0=prices, eps0=eps0,
        assign0=jnp.where(use_warm, assign0, -1))
    # Sweep-cap safety: unassigned persons take their row argmin for the
    # VALUE gather only. The returned warm state keeps the -1s — an argmin
    # fallback can claim an object twice, and a duplicated seed corrupts
    # the next solve's one-hot owner rebuild (two person ids summing into
    # a bogus owner); -1 seeds simply re-enter the auction.
    assign_value = jnp.where(
        assign < 0, jnp.argmin(cost, axis=-1).astype(jnp.int32), assign)
    return assign_value, assign, prices, sweeps


def hybrid_warm_sentinel(batch: int, n: int, dtype=jnp.float32):
    """The 'no warm matching yet' state for ``hybrid_assignment_warm``."""
    return (jnp.full((batch, n), -1, jnp.int32),
            jnp.zeros((batch, n), dtype))


# NOTE: a persistent-dual solver (init_warm_state/warm_emd2, carrying
# (assignment, prices) across calls and repairing only eps-CS violators)
# lived here through rounds 2-3 and was removed after measurement: it lost
# to the cold hybrid path in both candidate regimes (adversarial drift AND
# frozen-phi flows — benchmarks/warm_timing.json), because tight-eps repair
# phases cost more sweeps than the annealed Sinkhorn warm-up saves.
