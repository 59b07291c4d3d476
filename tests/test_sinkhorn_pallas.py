"""Fused Pallas point-cloud Sinkhorn vs XLA path and exact oracle.

All kernels run in interpret mode here (CPU test mesh); the real-TPU path is
exercised by bench.py / the verify recipe.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shwd_tpu.ops.costs import cost_matrix
from shwd_tpu.ops.sinkhorn import emd2_approx
from shwd_tpu.ops.sinkhorn_pallas import (
    emd2_points, fused_supported, sinkhorn_points,
)


def exact_emd_assignment(C):
    from scipy.optimize import linear_sum_assignment
    r, c = linear_sum_assignment(C)
    return float(C[r, c].mean())


def test_fused_matches_xla_lp2(rng):
    x = jnp.asarray(rng.normal(size=(1, 48, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 48, 3)).astype(np.float32))
    want = np.asarray(emd2_approx(cost_matrix(x, y, "lp", 2.0),
                                  eps=5e-3, num_iters=60, num_scales=4))
    got = np.asarray(sinkhorn_points(x, y, "lp", 2.0, 5e-3, 60, 4, True))
    np.testing.assert_allclose(got, want, rtol=1e-3)


@pytest.mark.parametrize("kind,p", [("geodesic", 2.0), ("cosine", 2.0)])
def test_fused_matches_xla_spherical_costs(rng, kind, p):
    x = rng.normal(size=(1, 40, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    y = rng.normal(size=(1, 40, 3)).astype(np.float32)
    y /= np.linalg.norm(y, axis=-1, keepdims=True)
    x, y = jnp.asarray(x), jnp.asarray(y)
    want = np.asarray(emd2_approx(cost_matrix(x, y, kind, p),
                                  eps=5e-3, num_iters=60, num_scales=4))
    got = np.asarray(sinkhorn_points(x, y, kind, p, 5e-3, 60, 4, True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_fused_close_to_exact_emd(rng):
    """Non-square N != M exercises the padding/masking path."""
    x = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
    C = np.asarray(cost_matrix(x, y, "lp", 2.0))[0]
    want = exact_emd_assignment(C)
    got = float(sinkhorn_points(x, y, "lp", 2.0, 2e-3, 200, 6, True)[0])
    np.testing.assert_allclose(got, want, rtol=0.02)


def test_fused_batch_and_padding(rng):
    """B > 1 with per-item eps schedule; values match per-item XLA runs."""
    x = jnp.asarray(rng.normal(size=(3, 20, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(3, 20, 3)).astype(np.float32))
    got = np.asarray(sinkhorn_points(x, y, "lp", 2.0, 5e-3, 60, 4, True))
    for i in range(3):
        want = float(emd2_approx(cost_matrix(x[i:i+1], y[i:i+1], "lp", 2.0),
                                 eps=5e-3, num_iters=60, num_scales=4)[0])
        np.testing.assert_allclose(got[i], want, rtol=1e-3)


def test_fused_gradients_match_envelope(rng):
    """Custom VJP (plan detached, pulled through differentiable cost) must
    match the XLA path's gradient."""
    x = jnp.asarray(rng.normal(size=(1, 24, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 24, 3)).astype(np.float32))

    def loss_fused(x, y):
        return jnp.sum(sinkhorn_points(x, y, "lp", 2.0, 5e-3, 60, 4, True))

    def loss_xla(x, y):
        return jnp.sum(emd2_approx(cost_matrix(x, y, "lp", 2.0),
                                   eps=5e-3, num_iters=60, num_scales=4))

    gx_f, gy_f = jax.grad(loss_fused, argnums=(0, 1))(x, y)
    gx_x, gy_x = jax.grad(loss_xla, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_x),
                               rtol=5e-3, atol=1e-5)


def test_fused_supported_gates():
    assert fused_supported(128, 128, "lp", 2.0)
    assert not fused_supported(128, 128, "lp", 3.0)      # lp needs p=2
    assert fused_supported(128, 128, "geodesic", 3.0)
    assert not fused_supported(4096, 4096, "lp", 2.0)    # VMEM budget


def test_emd2_points_dispatcher_fallback(rng):
    """On CPU the dispatcher must route to the XLA path and agree with it."""
    x = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
    got = np.asarray(emd2_points(x, y, "lp", 2.0, eps=5e-3, num_iters=40,
                                 num_scales=3))
    want = np.asarray(emd2_approx(cost_matrix(x, y, "lp", 2.0),
                                  eps=5e-3, num_iters=40, num_scales=3))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_warmup_kernel_matches_xla_per_item(rng):
    """emd2_warmup_pallas (streaming VMEM kernel, interpret mode) matches the
    XLA annealed schedule per item — per-item eps0, incl. lane padding."""
    from shwd_tpu.ops.sinkhorn_pallas import emd2_warmup_pallas
    for (b, n, m) in ((1, 40, 40), (2, 24, 40), (1, 48, 33)):
        x = rng.normal(size=(b, n, 3)).astype(np.float32)
        y = rng.normal(size=(b, m, 3)).astype(np.float32)
        c = jnp.asarray(
            np.sum((x[:, :, None, :] - y[:, None, :, :]) ** 2, -1))
        v1, f1, g1 = emd2_warmup_pallas(c, eps=1e-3, num_iters=30,
                                        num_scales=4, interpret=True)
        for i in range(b):
            v2, f2, g2 = emd2_approx(c[i:i + 1], eps=1e-3, num_iters=30,
                                     num_scales=4, return_potentials=True)
            np.testing.assert_allclose(float(v1[i]), float(v2[0]), rtol=1e-3)
            np.testing.assert_allclose(np.asarray(f1[i]), np.asarray(f2[0]),
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(g1[i]), np.asarray(g2[0]),
                                       atol=1e-4)
