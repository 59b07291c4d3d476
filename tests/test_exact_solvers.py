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
