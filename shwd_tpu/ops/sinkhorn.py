"""Log-domain Sinkhorn and the near-exact EMD surrogate.

TPU-native replacement for both the reference's Sinkhorn baselines
(``losses/Sinkhorn_fixed.py:10-93``, the Comparison suite's
``losses/sinkhorn.py``) and — with epsilon scaling — for the exact-EMD calls
the reference routes through POT's CPU network simplex
(``losses/s2_wasserstein.py:40-45``). TPUs have no network simplex; a
temperature-annealed log-Sinkhorn run converges to the exact transport cost as
eps -> 0 and is one fused batched kernel (all matmul/logsumexp, MXU/VPU).

Gradients: the transport plan is treated as constant (envelope theorem) by
stop-gradient on the potentials, matching the exact-EMD gradient the
reference gets from POT's backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _logsumexp(x, axis):
    m = jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    return jnp.squeeze(m, axis) + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis))


@functools.partial(jax.jit, static_argnames=("num_iters",))
def sinkhorn_log(cost: jax.Array, eps: float = 0.01, num_iters: int = 100,
                 a: jax.Array | None = None, b: jax.Array | None = None,
                 f0: jax.Array | None = None, g0: jax.Array | None = None):
    """Entropic OT in the log domain, batched over leading dims of cost.

    cost: (..., N, M). a, b: optional (..., N)/(..., M) marginals (uniform by
    default). ``f0``/``g0`` warm-start the dual potentials (e.g. carried from
    the previous call of an iterative driver — convergence from a nearby
    dual point takes a few dozen iterations where a cold small-eps start
    needs a full anneal). Returns (transport_cost, f, g): <P, C> with P the
    entropic plan, plus the dual potentials.

    Fixed iteration count (jit-friendly), matching the reference's
    Sinkhorn loops (``Sinkhorn_fixed.py:40-55``).
    """
    n, m = cost.shape[-2], cost.shape[-1]
    dtype = cost.dtype
    if a is None:
        # derive from cost so marginals inherit cost's sharding/vma type
        a = jnp.zeros_like(cost[..., 0]) + 1.0 / n
    if b is None:
        b = jnp.zeros_like(cost[..., 0, :]) + 1.0 / m
    log_a = jnp.log(a)
    log_b = jnp.log(b)

    f = jnp.zeros_like(a) if f0 is None else f0
    g = jnp.zeros_like(b) if g0 is None else g0

    def body(i, fg):
        f, g = fg
        # f_i = -eps * LSE_j [ (g_j - C_ij)/eps + log b_j ]
        f = -eps * _logsumexp((g[..., None, :] - cost) / eps + log_b[..., None, :], -1)
        g = -eps * _logsumexp((f[..., :, None] - cost) / eps + log_a[..., :, None], -2)
        return f, g

    f, g = jax.lax.fori_loop(0, num_iters, body, (f, g))
    return _plan_cost(cost, f, g, log_a, log_b, eps), f, g


def _plan_cost(cost, f, g, log_a, log_b, eps):
    """<P, C> with log P = (f + g - C)/eps + log a + log b, P detached."""
    log_p = ((f[..., :, None] + g[..., None, :] - cost) / eps
             + log_a[..., :, None] + log_b[..., None, :])
    p = jax.lax.stop_gradient(jnp.exp(log_p))
    return jnp.sum(p * cost, axis=(-2, -1))


@functools.partial(jax.jit,
                   static_argnames=("num_iters", "num_scales",
                                    "return_potentials"))
def emd2_approx(cost: jax.Array, eps: float = 5e-3, num_iters: int = 50,
                num_scales: int = 4, a: jax.Array | None = None,
                b: jax.Array | None = None,
                return_potentials: bool = False) -> jax.Array:
    """Near-exact EMD <P*, C> via epsilon-scaled log-Sinkhorn.

    Drop-in for the reference's per-item ``ot.emd2`` calls
    (s2_wasserstein.py:40-45), but batched: cost (..., N, M) -> (...,).
    Temperature is annealed geometrically from ~max|C| down to ``eps`` over
    ``num_scales`` stages of ``num_iters`` iterations each, warm-starting the
    potentials — the standard eps-scaling schedule that keeps log-Sinkhorn
    stable at small eps.
    """
    n, m = cost.shape[-2], cost.shape[-1]
    dtype = cost.dtype
    if a is None:
        a = jnp.zeros_like(cost[..., 0]) + 1.0 / n
    if b is None:
        b = jnp.zeros_like(cost[..., 0, :]) + 1.0 / m
    log_a = jnp.log(a)
    log_b = jnp.log(b)

    c_scale = jnp.maximum(jnp.max(jnp.abs(cost)), 1e-30)
    eps0 = jax.lax.stop_gradient(c_scale)
    # geometric schedule eps0 -> eps (static length)
    ratios = jnp.linspace(0.0, 1.0, num_scales)
    eps_sched = jnp.exp(jnp.log(eps0) * (1 - ratios) + jnp.log(eps) * ratios)

    f = jnp.zeros_like(a)
    g = jnp.zeros_like(b)

    def scale_body(s, fg):
        f, g = fg
        e = eps_sched[s]

        def body(i, fg):
            f, g = fg
            f = -e * _logsumexp((g[..., None, :] - cost) / e + log_b[..., None, :], -1)
            g = -e * _logsumexp((f[..., :, None] - cost) / e + log_a[..., :, None], -2)
            return f, g

        return jax.lax.fori_loop(0, num_iters, body, (f, g))

    f, g = jax.lax.fori_loop(0, num_scales, scale_body, (f, g))
    if return_potentials:
        return _plan_cost(cost, f, g, log_a, log_b, eps), f, g
    return _plan_cost(cost, f, g, log_a, log_b, eps)


@functools.partial(jax.jit, static_argnames=("num_iters", "num_scales"))
def sinkhorn_divergence_cost(c_xy: jax.Array, c_xx: jax.Array,
                             c_yy: jax.Array, eps: float = 5e-3,
                             num_iters: int = 50, num_scales: int = 4
                             ) -> jax.Array:
    """Debiased entropic OT: S = W(x,y) - (W(x,x) + W(y,y)) / 2.

    The sharp entropic cost <P, C> has an O(eps) bias floor when the two
    measures are close — the plan blurs over an eps-ball, so the surrogate
    (and its gradient) stops resolving differences below that scale, which
    stalls Wasserstein flows well above the exact-EMD fixed point. The
    divergence subtracts the same floor via the self-transport terms and is
    zero iff the measures coincide, restoring useful gradients down to ~0
    at unchanged eps. (This replaces the *accuracy* role of the reference's
    exact ``ot.emd2``; the 'exact' solver replaces its semantics bitwise.)
    """
    v_xy = emd2_approx(c_xy, eps=eps, num_iters=num_iters,
                       num_scales=num_scales)
    v_xx = emd2_approx(c_xx, eps=eps, num_iters=num_iters,
                       num_scales=num_scales)
    v_yy = emd2_approx(c_yy, eps=eps, num_iters=num_iters,
                       num_scales=num_scales)
    return jnp.maximum(v_xy - 0.5 * (v_xx + v_yy), 0.0)


def sinkhorn_loss(x: jax.Array, y: jax.Array, eps: float = 0.01,
                  num_iters: int = 100, p: float = 2,
                  wasserstein_root: bool = False) -> jax.Array:
    """Sinkhorn loss between point clouds with Lp ground cost, batch-meaned.

    Equivalent of ``log_Sinkhorn_Distance_Loss`` /
    ``log_N_Sinkhorn_Distance_Loss`` (Comparison losses/sinkhorn.py:3,92):
    with ``wasserstein_root`` the per-item cost is raised to 1/p.
    """
    from .costs import lp_cost

    c = lp_cost(x, y, p)
    val, _, _ = sinkhorn_log(c, eps=eps, num_iters=num_iters)
    if wasserstein_root:
        val = val ** (1.0 / p)
    return jnp.mean(val)
