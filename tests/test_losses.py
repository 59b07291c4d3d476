"""Loss families: adversarial SHWD, pseudo-ensemble, max-SSW, zoo, baselines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shwd_tpu.flows import make_flow, SphereChartMLP
from shwd_tpu.losses import (
    SHWDConfig, SHWDLoss, TransportConfig, PseudoSHWDConfig, PseudoSHWDLoss,
    MaxSSWConfig, MaxSSWLoss, chamfer_criterion, make_sinkhorn_criterion,
    sphere_regularizer, sliced_wasserstein_distance,
    max_sliced_wasserstein_distance, gswd_polynomial, gswd_circular,
    augmented_sliced_wasserstein_distance, init_mapping,
    distributional_sliced_wasserstein_distance, init_transform_net,
    gsw_nn, max_gsw_nn, init_gsw_mlp,
)


def small_clouds(key, b=2, n=24):
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (b, n, 3))
    y = jax.random.normal(k2, (b, n, 3)) + jnp.array([1.0, 0, 0])
    return x, y


SHWD_CFG = SHWDConfig(
    transport=TransportConfig(cost="lp", p=2.0, solver="sinkhorn_fast",
                              eps=0.05, num_iters=30),
    max_iter=2, lam=0.1, phi_lr=1e-3)


def make_shwd():
    flow = make_flow("Residual", n_flow_layers=2, hidden_layers=3)
    return SHWDLoss(flow, SHWD_CFG)


def test_sphere_regularizer_zero_on_sphere():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 3))
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    assert float(sphere_regularizer(x)) < 1e-6
    assert float(sphere_regularizer(2 * x)) == pytest.approx(1.0, rel=1e-5)


def test_shwd_train_updates_phi_and_returns_finite():
    crit = make_shwd()
    state = crit.init(jax.random.PRNGKey(0))
    x, y = small_clouds(jax.random.PRNGKey(1))
    (w, sx, sy), new_state = crit.apply(state, x, y, train=True)
    assert np.isfinite(float(w)) and float(w) > 0
    assert sx.shape == x.shape
    # phi params changed by the inner ascent
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.phi_params, new_state.phi_params)
    assert max(jax.tree.leaves(diff)) > 0


def test_shwd_test_mode_freezes_phi():
    crit = make_shwd()
    state = crit.init(jax.random.PRNGKey(0))
    x, y = small_clouds(jax.random.PRNGKey(1))
    (_, _, _), new_state = crit.apply(state, x, y, train=False)
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.phi_params, new_state.phi_params)
    assert max(jax.tree.leaves(diff)) == 0


def test_shwd_gradient_reaches_clouds():
    crit = make_shwd()
    state = crit.init(jax.random.PRNGKey(0))
    x, y = small_clouds(jax.random.PRNGKey(1))

    def loss_fn(xx):
        (w, _, _), _ = crit.apply(state, xx, y, train=True)
        return w

    g = jax.grad(loss_fn)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_shwd_is_jittable():
    crit = make_shwd()
    state = crit.init(jax.random.PRNGKey(0))
    x, y = small_clouds(jax.random.PRNGKey(1))
    apply_train = jax.jit(lambda s, a, b: crit.apply(s, a, b, train=True))
    (w1, _, _), state = apply_train(state, x, y)
    (w2, _, _), state = apply_train(state, x, y)
    assert np.isfinite(float(w1)) and np.isfinite(float(w2))


def test_shwd_lam_decay_variant():
    import dataclasses
    cfg = dataclasses.replace(SHWD_CFG, lam_decay=0.999)
    crit = SHWDLoss(make_flow("Residual", 1, hidden_layers=3), cfg)
    state = crit.init(jax.random.PRNGKey(0))
    x, y = small_clouds(jax.random.PRNGKey(1))
    _, state = crit.apply(state, x, y, train=True)
    assert float(state.lam) == pytest.approx(0.1 * 0.999, rel=1e-5)


def test_shwd_refresh_variant():
    import dataclasses
    cfg = dataclasses.replace(SHWD_CFG, refresh=True, max_iter=1)
    crit = SHWDLoss(make_flow("Residual", 1, hidden_layers=3), cfg)
    state = crit.init(jax.random.PRNGKey(0))
    x, y = small_clouds(jax.random.PRNGKey(1))
    (_, _, _), s1 = crit.apply(state, x, y, train=True)
    (_, _, _), s2 = crit.apply(s1, x, y, train=True)
    assert np.isfinite(float(s2.lam))


def test_shwd_early_stop_skips_inner_work():
    """regulation.py:795-855: past the strike limit the inner adversarial
    optimization is skipped entirely — phi params must come out unchanged."""
    import dataclasses
    cfg = dataclasses.replace(SHWD_CFG, early_stop_strikes=2, max_iter=1)
    crit = SHWDLoss(make_flow("Residual", 1, hidden_layers=3), cfg)
    state = crit.init(jax.random.PRNGKey(0))
    x, y = small_clouds(jax.random.PRNGKey(1))

    # below the limit: inner loop runs, phi changes
    (_, _, _), s_run = crit.apply(state, x, y, train=True)
    diff = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.phi_params, s_run.phi_params)))
    assert diff > 0

    # past the limit: phi frozen
    struck = state._replace(strikes=jnp.asarray(3, jnp.int32))
    (w, _, _), s_skip = crit.apply(struck, x, y, train=True)
    assert np.isfinite(float(w))
    diff = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.phi_params, s_skip.phi_params)))
    assert diff == 0

    # add_strike increments the counter
    assert int(crit.add_strike(state).strikes) == 1


def test_pseudo_shwd_combines():
    flow = make_flow("Residual", 1, hidden_layers=3)
    x, y = small_clouds(jax.random.PRNGKey(1))
    vals = {}
    for combine in ("max", "mean", "softmax"):
        crit = PseudoSHWDLoss(flow, PseudoSHWDConfig(
            transport=SHWD_CFG.transport, phi_num=3, combine=combine))
        state = crit.init(jax.random.PRNGKey(0))
        (v, sx, sy), _ = crit.apply(state, x, y)
        vals[combine] = float(v)
        assert sx.shape == x.shape
    assert vals["max"] >= vals["mean"] - 1e-6


def test_max_ssw_loss_runs_and_ascends():
    phi = SphereChartMLP()
    crit = MaxSSWLoss(phi, MaxSSWConfig(num_projections=16, p=2, max_iter=3))
    state = crit.init(jax.random.PRNGKey(0))
    x, y = small_clouds(jax.random.PRNGKey(1), b=2, n=32)
    (v0, sx, sy), state = crit.apply(state, x, y, train=False)
    (v1, _, _), state = crit.apply(state, x, y, train=True)
    assert np.isfinite(float(v0)) and np.isfinite(float(v1))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(sx), axis=-1), 1.0, atol=1e-5)


def test_baseline_criteria():
    x, y = small_clouds(jax.random.PRNGKey(0))
    cd, _, _ = chamfer_criterion(x, y)
    sk, _, _ = make_sinkhorn_criterion(eps=0.05, num_iters=30)(x, y)
    assert float(cd) > 0 and float(sk) > 0


# ---------------------------------------------------------------------------
# sliced zoo
# ---------------------------------------------------------------------------

def test_swd_zero_identical_positive_separated():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
    key = jax.random.PRNGKey(1)
    assert float(sliced_wasserstein_distance(key, x, x)) < 1e-5
    y = x + jnp.array([2.0, 0, 0])
    assert float(sliced_wasserstein_distance(key, x, y)) > 0.5


def test_max_swd_at_least_plain_direction():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
    y = x + jnp.array([2.0, 0, 0])
    v = float(max_sliced_wasserstein_distance(jax.random.PRNGKey(1), x, y,
                                              max_iter=20))
    assert np.isfinite(v) and v > 0


def test_gswd_variants_run():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
    y = x + 0.5
    k = jax.random.PRNGKey(1)
    for f in (lambda: gswd_polynomial(k, x, y, 16, degree=3),
              lambda: gswd_circular(k, x, y, 16)):
        v = float(f())
        assert np.isfinite(v) and v >= 0


def test_aswd_and_dswd_stateful():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
    y = x + 0.5
    mp = init_mapping(jax.random.PRNGKey(1))
    v, mp2 = augmented_sliced_wasserstein_distance(
        jax.random.PRNGKey(2), x, y, mp, num_projections=16, max_iter=2)
    assert np.isfinite(float(v))
    tp = init_transform_net(jax.random.PRNGKey(3))
    v2, tp2 = distributional_sliced_wasserstein_distance(
        jax.random.PRNGKey(4), x, y, tp, num_projections=16, max_iter=2)
    assert np.isfinite(float(v2))


def test_gsw_nn_variants():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
    y = x + 0.5
    net = init_gsw_mlp(jax.random.PRNGKey(1))
    v = float(gsw_nn(x, y, net))
    v2, net2 = max_gsw_nn(x, y, net, max_iter=2)
    assert np.isfinite(v) and np.isfinite(float(v2))
