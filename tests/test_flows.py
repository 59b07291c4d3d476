"""Flow library: invertibility round-trips, Lipschitz bounds, log-dets.

Test pattern follows the vendored normflows ``FlowTest.checkForwardInverse``
idea (SURVEY.md §4) with numeric oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shwd_tpu.flows import (
    FlowChain, PlanarFlow, LipschitzMLP, ResidualFlow, ActNorm,
    SphereChartMLP, EncoderFlowChart, make_flow, make_residual_chain,
    spectral_linear_init, spectral_linear_apply,
)


def test_spectral_linear_norm_bounded():
    p, s = spectral_linear_init(jax.random.PRNGKey(0), 16, 16, power_iters=300)
    # inflate the weight so normalization must kick in
    p = {**p, "w": p["w"] * 50.0}
    from shwd_tpu.flows.lipschitz import spectral_linear_power_iter
    s = spectral_linear_power_iter(p, s, 300)
    x = jax.random.normal(jax.random.PRNGKey(1), (100, 16))
    y = spectral_linear_apply(p, s, x, coeff=0.95)
    # effective spectral norm of the map (minus bias) must be <= ~0.95
    y0 = spectral_linear_apply(p, s, jnp.zeros((1, 16)), coeff=0.95)
    ratios = jnp.linalg.norm(y - y0, axis=-1) / jnp.linalg.norm(x, axis=-1)
    assert float(jnp.max(ratios)) <= 0.96


def test_lipschitz_mlp_contraction():
    net = LipschitzMLP([3, 8, 8, 3], lipschitz_const=0.9, init_zeros=False)
    params, state = net.init(jax.random.PRNGKey(0))
    x1 = jax.random.normal(jax.random.PRNGKey(1), (200, 3))
    x2 = x1 + 0.01 * jax.random.normal(jax.random.PRNGKey(2), (200, 3))
    d_out = jnp.linalg.norm(net.apply(params, state, x1) - net.apply(params, state, x2), axis=-1)
    d_in = jnp.linalg.norm(x1 - x2, axis=-1)
    assert float(jnp.max(d_out / d_in)) < 1.0


def test_residual_flow_inverse_roundtrip():
    flow = ResidualFlow(LipschitzMLP([3, 8, 8, 3], 0.9, init_zeros=False))
    params, state = flow.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (50, 3))
    y, _ = flow.apply(params, state, x)
    x_rec = flow.inverse(params, state, y)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec), atol=1e-4)


def test_residual_chain_zero_init_near_constant_shift():
    chain = make_residual_chain(3)
    params, state = chain.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (40, 3))
    y, _ = chain.apply(params, state, x)
    # reference init_zeros divides only the last *weight* by 1000; the last
    # bias stays uniform, so the init map is x + (approx constant) shift.
    shift = np.asarray(y - x)
    np.testing.assert_allclose(
        shift, np.broadcast_to(shift.mean(0, keepdims=True), shift.shape),
        atol=5e-2)


def test_residual_logdet_matches_bruteforce():
    flow = ResidualFlow(LipschitzMLP([3, 8, 3], 0.9, init_zeros=False))
    params, state = flow.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    _, ld = flow.apply(params, state, x, logdet=True)

    def fwd(pt):
        return flow.apply(params, state, pt[None])[0][0]

    jac = jax.vmap(jax.jacfwd(fwd))(x)
    want = np.linalg.slogdet(np.asarray(jac))[1]
    np.testing.assert_allclose(np.asarray(ld), want, atol=1e-4)


def test_planar_flow_logdet_and_shape():
    flow = PlanarFlow(3)
    params, state = flow.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 5, 3))
    y, ld = flow.apply(params, state, x, logdet=True)
    assert y.shape == x.shape and ld.shape == (6, 5)

    def fwd(pt):
        return flow.apply(params, state, pt)[0]

    jac = jax.vmap(jax.jacfwd(fwd))(x.reshape(-1, 3))
    want = np.linalg.slogdet(np.asarray(jac))[1]
    np.testing.assert_allclose(np.asarray(ld).ravel(), want, atol=1e-4)


def test_actnorm_data_init_and_inverse():
    an = ActNorm(3)
    params, state = an.init(jax.random.PRNGKey(0))
    x = 3.0 * jax.random.normal(jax.random.PRNGKey(1), (500, 3)) + 2.0
    params = an.init_from_data(params, x)
    y, _ = an.apply(params, state, x)
    assert abs(float(jnp.mean(y))) < 0.05
    assert abs(float(jnp.std(y)) - 1.0) < 0.05
    x_rec = an.inverse(params, state, y)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec), atol=1e-4)


def test_chart_outputs_on_sphere():
    for mod in (SphereChartMLP(), EncoderFlowChart()):
        params, state = mod.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 20, 3))
        y, _ = mod.apply(params, state, x)
        norms = np.asarray(jnp.linalg.norm(y, axis=-1))
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_make_flow_factory_variants():
    for name in ("Planar", "Residual"):
        chain = make_flow(name, n_flow_layers=2)
        params, state = chain.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 3))
        y = chain(params, state, x)
        assert y.shape == x.shape
    with pytest.raises(ValueError):
        make_flow("Nope")


def test_flow_chain_vmaps_over_ensemble():
    # phi-ensemble: stacked params, vmapped apply (pseudo loss building block)
    chain = make_flow("Residual", n_flow_layers=1, hidden_layers=3)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    ps_ss = [chain.init(k) for k in keys]
    params = jax.tree.map(lambda *a: jnp.stack(a), *[p for p, _ in ps_ss])
    state = jax.tree.map(lambda *a: jnp.stack(a), *[s for _, s in ps_ss])
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    ys = jax.vmap(lambda p, s: chain(p, s, x))(params, state)
    assert ys.shape == (4, 8, 3)
    # members differ
    assert float(jnp.std(ys, axis=0).mean()) > 0
