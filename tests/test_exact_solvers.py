"""Exact/near-exact EMD solvers: auction, exact-callback bridge, divergence.

Oracle: the native C++ network simplex / JV assignment (``ops.emd_exact``),
itself validated against POT in test_costs_ot.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shwd_tpu.ops.auction import auction_emd2, auction_assignment, hybrid_emd2
from shwd_tpu.ops.costs import cost_matrix
from shwd_tpu.ops.emd_exact import emd2_exact, emd2_exact_jax
from shwd_tpu.ops.sinkhorn import emd2_approx, sinkhorn_divergence_cost


def _rand_costs(n, b=3, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, n, 3)).astype(np.float32)
    y = x + spread * rng.normal(size=(b, n, 3)).astype(np.float32)
    c = cost_matrix(jnp.asarray(x), jnp.asarray(y), "lp", 2.0)
    return jnp.asarray(x), jnp.asarray(y), c


def _exact(c):
    return np.array([emd2_exact(np.asarray(ci, np.float64)) for ci in c])


@pytest.mark.parametrize("n,spread", [(16, 1.0), (64, 1.0), (64, 1e-3),
                                      (128, 0.05)])
def test_auction_matches_network_simplex(n, spread):
    _, _, c = _rand_costs(n, spread=spread)
    got = np.asarray(auction_emd2(c, 1e-8))
    want = _exact(c)
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("n,spread", [(64, 2.0), (128, 0.3), (128, 0.01)])
def test_hybrid_matches_network_simplex(n, spread):
    _, _, c = _rand_costs(n, spread=spread, seed=7)
    got = np.asarray(hybrid_emd2(c, 1e-8))
    np.testing.assert_allclose(got, _exact(c), rtol=1e-4)


def test_hybrid_gradient_is_permutation_plan():
    _, _, c = _rand_costs(48)
    g = np.asarray(jax.grad(lambda cc: jnp.sum(hybrid_emd2(cc, 1e-8)))(c))
    n = c.shape[-1]
    np.testing.assert_allclose(g.sum(-1), 1.0 / n, rtol=1e-6)
    np.testing.assert_allclose(g.sum(-2), 1.0 / n, rtol=1e-6)
    np.testing.assert_allclose((g * np.asarray(c)).sum((-2, -1)),
                               _exact(c), rtol=1e-4)


def test_auction_gradient_is_plan():
    x, y, c = _rand_costs(32)
    g = jax.grad(lambda cc: jnp.sum(auction_emd2(cc, 1e-8)))(c)
    g = np.asarray(g)
    n = c.shape[-1]
    # each row of the plan holds exactly one 1/n entry
    np.testing.assert_allclose(g.sum(-1), 1.0 / n, rtol=1e-6)
    assert (np.count_nonzero(g, axis=-1) == 1).all()
    # and it selects an optimal assignment: <P, C> == exact value
    np.testing.assert_allclose((g * np.asarray(c)).sum((-2, -1)),
                               _exact(c), rtol=1e-4)


def test_exact_jax_bridge_value_and_grad():
    if jax.default_backend() != "cpu":
        pytest.skip("pure_callback needs a callback-capable backend")
    x, y, c = _rand_costs(24)
    got = np.asarray(emd2_exact_jax(c))
    np.testing.assert_allclose(got, _exact(c), rtol=1e-5)

    def loss(xj):
        return jnp.sum(emd2_exact_jax(cost_matrix(xj, y, "lp", 2.0)))

    g = jax.grad(loss)(x)
    eps = 1e-3
    fd = (float(loss(x.at[0, 3, 1].add(eps)))
          - float(loss(x.at[0, 3, 1].add(-eps)))) / (2 * eps)
    np.testing.assert_allclose(fd, float(g[0, 3, 1]), rtol=0.05, atol=1e-4)


def test_deep_annealed_sinkhorn_reaches_exact():
    """eps=1e-5 annealed Sinkhorn must track exact EMD to <1% across the
    convergence range — the property the SHWD flow depends on."""
    for spread in (0.3, 0.01):
        _, _, c = _rand_costs(96, b=2, spread=spread)
        got = np.asarray(emd2_approx(c, eps=1e-5, num_iters=150,
                                     num_scales=10))
        np.testing.assert_allclose(got, _exact(c), rtol=1e-2)


def test_sinkhorn_divergence_zero_at_identity():
    x, _, _ = _rand_costs(64, b=1)
    c_xx = cost_matrix(x, x, "lp", 2.0)
    val = sinkhorn_divergence_cost(c_xx, c_xx, c_xx)
    np.testing.assert_allclose(np.asarray(val), 0.0, atol=1e-6)


def test_sinkhorn_divergence_positive_and_below_biased():
    x, y, c_xy = _rand_costs(64, b=1, spread=0.02)
    c_xx = cost_matrix(x, x, "lp", 2.0)
    c_yy = cost_matrix(y, y, "lp", 2.0)
    div = float(sinkhorn_divergence_cost(c_xy, c_xx, c_yy)[0])
    biased = float(emd2_approx(c_xy)[0])
    assert 0.0 < div < biased  # debiasing removes the entropic floor


def test_warm_restart_matches_cold_and_simplex():
    """Intra-step warm restart (r5): seeding the auction with a matching
    from a nearby cost must change sweeps, never the value (exactness is
    the eps ladder's job, the seed only skips rediscovery)."""
    from shwd_tpu.ops.auction import hybrid_assignment_warm, \
        hybrid_warm_sentinel, _assignment_cost

    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (4, 48, 3))
    y = x[:, ::-1] + 0.3 * jax.random.normal(jax.random.fold_in(key, 1),
                                             (4, 48, 3))
    c1 = cost_matrix(x, y, "lp", 2.0)
    sent = hybrid_warm_sentinel(4, 48)
    a1v, a1, p1, s1 = hybrid_assignment_warm(c1, *sent)

    # drifted problem, one-phi-step scale
    x2 = x + 1e-4 * jax.random.normal(jax.random.fold_in(key, 2), x.shape)
    c2 = cost_matrix(x2, y, "lp", 2.0)
    a_warm, a_warm_seed, _, s_warm = hybrid_assignment_warm(c2, a1, p1)
    a_cold, _, _, s_cold = hybrid_assignment_warm(c2, *sent)

    v_warm = np.asarray(_assignment_cost(c2, a_warm))
    v_cold = np.asarray(_assignment_cost(c2, a_cold))
    oracle = np.array([emd2_exact(np.asarray(c2[i], np.float64))
                       for i in range(4)])
    np.testing.assert_allclose(v_warm, v_cold, rtol=0, atol=1e-6)
    np.testing.assert_allclose(v_warm, oracle, rtol=0, atol=5e-5)
    # each row of the warm result is a permutation
    for i in range(4):
        assert len(set(np.asarray(a_warm)[i].tolist())) == 48


def test_shwd_hybrid_warm_threading_matches_unthreaded():
    """SHWDLoss hybrid path: warm threading is bitwise-equivalent to the
    make_transport path in loss, gradient and eval."""
    from shwd_tpu.flows import make_flow
    from shwd_tpu.losses import SHWDConfig, SHWDLoss, TransportConfig

    cfg = SHWDConfig(
        transport=TransportConfig(cost="lp", p=2.0, solver="hybrid"),
        max_iter=2, lam=1.3e-5, phi_lr=9.2e-5)
    flow = make_flow("Residual", 2)
    crit_new = SHWDLoss(flow, cfg)
    crit_old = SHWDLoss(flow, cfg)
    crit_old._warm_hybrid = False          # the pre-r5 path

    key = jax.random.PRNGKey(0)
    state = crit_new.init(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 32, 3))
    y = x + 0.05 * jax.random.normal(jax.random.fold_in(key, 2), x.shape)

    def loss(crit, x):
        (w, _, _), _ = crit.apply(state, x, y, True)
        return w

    v_new, g_new = jax.value_and_grad(lambda a: loss(crit_new, a))(x)
    v_old, g_old = jax.value_and_grad(lambda a: loss(crit_old, a))(x)
    assert float(v_new) == float(v_old)
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_old))
    (e_new, _, _), _ = crit_new.apply(state, x, y, False)
    (e_old, _, _), _ = crit_old.apply(state, x, y, False)
    assert float(e_new) == float(e_old)
