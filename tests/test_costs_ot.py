"""Cost matrices and OT kernels vs torch/scipy oracles.

scipy.optimize.linear_sum_assignment gives the exact EMD for uniform weights
with N == M — the same answer POT's network simplex returns to the reference
(``s2_wasserstein.py:40-45``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from shwd_tpu.ops import (
    lp_cost, cosine_cost, geodesic_cost, emd1d, emd1d_general, emd1d_circle,
    circle_ot, sinkhorn_log, emd2_approx, chamfer, chamfer_pallas,
    sliced_wasserstein_sphere, stiefel_frames, project_to_circle,
)


def exact_emd_assignment(C):
    """Exact EMD <P*, C> for uniform weights, N == M, via assignment."""
    r, c = linear_sum_assignment(C)
    return C[r, c].mean()


# ---------------------------------------------------------------------------
# cost matrices
# ---------------------------------------------------------------------------

def test_lp_cost_oracle(rng):
    x = rng.normal(size=(2, 10, 3)).astype(np.float32)
    y = rng.normal(size=(2, 12, 3)).astype(np.float32)
    for p in (1, 2, 3):
        got = np.asarray(lp_cost(jnp.asarray(x), jnp.asarray(y), p))
        want = np.sum(np.abs(x[:, :, None] - y[:, None]) ** p, -1)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_cosine_and_geodesic_cost(rng):
    x = rng.normal(size=(2, 8, 3)).astype(np.float32)
    y = rng.normal(size=(2, 9, 3)).astype(np.float32)
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    yn = y / np.linalg.norm(y, axis=-1, keepdims=True)
    cos = np.einsum("bnd,bmd->bnm", xn, yn)
    np.testing.assert_allclose(
        np.asarray(cosine_cost(jnp.asarray(x), jnp.asarray(y), 2)),
        (1 - cos) ** 2, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(geodesic_cost(jnp.asarray(x), jnp.asarray(y), 2)),
        np.arccos(np.clip(cos, -1 + 1e-7, 1 - 1e-7)) ** 2, atol=1e-4)


# ---------------------------------------------------------------------------
# 1D OT
# ---------------------------------------------------------------------------

def test_emd1d_sort_formula(rng):
    u = rng.normal(size=(5, 64)).astype(np.float32)
    v = rng.normal(size=(5, 64)).astype(np.float32)
    got = np.asarray(emd1d(jnp.asarray(u), jnp.asarray(v), p=2))
    want = np.mean((np.sort(u, -1) - np.sort(v, -1)) ** 2, -1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_emd1d_general_matches_assignment(rng):
    # n == m case must agree with the equal-size formula
    u = rng.normal(size=(3, 16)).astype(np.float32)
    v = rng.normal(size=(3, 16)).astype(np.float32)
    got = np.asarray(emd1d_general(jnp.asarray(u), jnp.asarray(v), p=2))
    want = np.mean((np.sort(u, -1) - np.sort(v, -1)) ** 2, -1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_emd1d_general_unequal_sizes_vs_dense(rng):
    u = rng.normal(size=(8,)).astype(np.float64)
    v = rng.normal(size=(12,)).astype(np.float64)
    got = float(emd1d_general(jnp.asarray(u)[None], jnp.asarray(v)[None], p=2)[0])
    # oracle: exact transportation on the line via northwest-corner on sorted
    us, vs = np.sort(u), np.sort(v)
    ui, vi, want = 0, 0, 0.0
    ua, va = 1 / 8, 1 / 12
    ru, rv = ua, va
    while ui < 8 and vi < 12:
        m = min(ru, rv)
        want += m * (us[ui] - vs[vi]) ** 2
        ru -= m
        rv -= m
        if ru <= 1e-15:
            ui += 1
            ru = ua
        if rv <= 1e-15:
            vi += 1
            rv = va
    np.testing.assert_allclose(got, want, rtol=1e-4)


def brute_force_circle_w(u, v, p, shifts=2000):
    """Oracle: min over cyclic shifts of the target support of matched cost.

    For equal-size uniform measures on S^1, the optimal plan is a cyclic
    order-preserving matching; scan all n relative offsets exactly, refined
    over continuous rotations via dense theta grid for safety.
    """
    n = len(u)
    us = np.sort(u)
    vs = np.sort(v)
    best = np.inf
    for k in range(n):
        d = np.abs(us - np.roll(vs, k))
        d = np.minimum(d, 1 - d)
        best = min(best, np.mean(d ** p))
    return best


def test_emd1d_circle_vs_bruteforce(rng):
    u = rng.uniform(size=(24,)).astype(np.float64)
    v = rng.uniform(size=(24,)).astype(np.float64)
    got = float(emd1d_circle(jnp.asarray(u)[None], jnp.asarray(v)[None])[0])
    want = brute_force_circle_w(u, v, p=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_circle_ot_p2_vs_bruteforce(rng):
    u = rng.uniform(size=(16,)).astype(np.float64)
    v = rng.uniform(size=(16,)).astype(np.float64)
    got = float(circle_ot(jnp.asarray(u)[None].astype(jnp.float32),
                          jnp.asarray(v)[None].astype(jnp.float32), p=2)[0])
    want = brute_force_circle_w(u, v, p=2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_circle_ot_batched(rng):
    u = rng.uniform(size=(4, 7, 20)).astype(np.float32)
    v = rng.uniform(size=(4, 7, 20)).astype(np.float32)
    out = circle_ot(jnp.asarray(u), jnp.asarray(v), p=2)
    assert out.shape == (4, 7)
    # each row must match its individual solve
    single = circle_ot(jnp.asarray(u[1, 3])[None], jnp.asarray(v[1, 3])[None], p=2)
    np.testing.assert_allclose(np.asarray(out)[1, 3], np.asarray(single)[0], rtol=1e-5)


def test_circle_w1_rotation_invariance(rng):
    # shifting both measures by the same rotation leaves W unchanged
    u = rng.uniform(size=(32,)).astype(np.float64)
    v = rng.uniform(size=(32,)).astype(np.float64)
    base = float(emd1d_circle(jnp.asarray(u)[None], jnp.asarray(v)[None])[0])
    s = 0.37
    shifted = float(emd1d_circle(jnp.asarray((u + s) % 1)[None],
                                 jnp.asarray((v + s) % 1)[None])[0])
    np.testing.assert_allclose(base, shifted, rtol=1e-6)


# ---------------------------------------------------------------------------
# Sinkhorn / near-exact EMD
# ---------------------------------------------------------------------------

def test_sinkhorn_converges_to_exact(rng):
    x = rng.normal(size=(20, 3))
    y = rng.normal(size=(20, 3))
    C = np.sum((x[:, None] - y[None]) ** 2, -1).astype(np.float32)
    want = exact_emd_assignment(C)
    got, _, _ = sinkhorn_log(jnp.asarray(C), eps=0.005, num_iters=2000)
    np.testing.assert_allclose(float(got), want, rtol=0.02)


def test_emd2_approx_close_to_exact(rng):
    x = rng.normal(size=(2, 32, 3))
    y = rng.normal(size=(2, 32, 3))
    C = np.sum((x[:, :, None] - y[:, None]) ** 2, -1).astype(np.float32)
    want = np.array([exact_emd_assignment(C[i]) for i in range(2)])
    got = np.asarray(emd2_approx(jnp.asarray(C), eps=2e-3, num_iters=200, num_scales=6))
    np.testing.assert_allclose(got, want, rtol=0.02)


def test_sinkhorn_colinear_fixture():
    # the reference's only hand-checkable fixture (Sinkhorn_fixed.py:97-116):
    # two colinear clouds offset by 8 along x -> W2 ~ 8, W2^2 ~ 64
    x = jnp.stack([jnp.arange(4.0), jnp.zeros(4), jnp.zeros(4)], -1)[None]
    y = x + jnp.array([8.0, 0, 0])
    C = lp_cost(x, y, 2)
    val = emd2_approx(C, eps=1e-3, num_iters=300, num_scales=5)
    np.testing.assert_allclose(float(val[0]) ** 0.5, 8.0, rtol=0.01)


# ---------------------------------------------------------------------------
# Chamfer
# ---------------------------------------------------------------------------

def test_chamfer_oracle(rng):
    x = rng.normal(size=(3, 40, 3)).astype(np.float32)
    y = rng.normal(size=(3, 50, 3)).astype(np.float32)
    d = np.sum((x[:, :, None] - y[:, None]) ** 2, -1)
    want = d.min(2).mean() + d.min(1).mean()
    got = float(chamfer(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_chamfer_pallas_matches_xla(rng):
    x = jnp.asarray(rng.normal(size=(2, 70, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 90, 3)).astype(np.float32))
    want = float(chamfer(x, y))
    got = float(chamfer_pallas(x, y, tile_n=32, tile_m=32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# spherical slicing
# ---------------------------------------------------------------------------

def test_stiefel_frames_orthonormal():
    f = stiefel_frames(jax.random.PRNGKey(0), 50)
    gram = jnp.einsum("ldi,ldj->lij", f, f)
    np.testing.assert_allclose(np.asarray(gram), np.tile(np.eye(2), (50, 1, 1)),
                               atol=1e-5)


def test_project_to_circle_range(rng):
    x = jnp.asarray(rng.normal(size=(4, 30, 3)).astype(np.float32))
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    f = stiefel_frames(jax.random.PRNGKey(1), 10)
    ang = project_to_circle(x, f)
    assert ang.shape == (4, 10, 30)
    a = np.asarray(ang)
    assert (a >= 0).all() and (a < 1).all()


def test_ssw_zero_for_identical_clouds(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    val = sliced_wasserstein_sphere(jax.random.PRNGKey(0), x, x, 20, p=2)
    assert float(val) < 1e-6


def test_ssw_separates_clouds(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    # antipodal cloud should be far
    val_far = sliced_wasserstein_sphere(jax.random.PRNGKey(0), x, -x, 20, p=2)
    # reference smoke test: inputs2 = zeros-like separation check
    assert float(val_far) > 1e-3


def test_ssw_differentiable(rng):
    x = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))

    def f(pts):
        return sliced_wasserstein_sphere(jax.random.PRNGKey(0), pts,
                                         jnp.roll(pts, 1, 0) + 0.1, 8, p=2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()


# -- round-4 kernel components (gather-free hot path) ------------------------

def test_batch_slice_matches_window_and_clamps(rng):
    from shwd_tpu.ops.ot1d import _batch_slice
    for (k, size) in ((384, 128), (771, 257), (130, 128), (128, 128)):
        b = 23
        a = rng.random((b, k)).astype(np.float32)
        # include out-of-range starts: dynamic_slice clamp semantics
        st = rng.integers(-3, k - size + 4, b)
        out = np.asarray(_batch_slice(jnp.asarray(a), jnp.asarray(st), size))
        stc = np.clip(st, 0, k - size)
        ref = np.stack([a[i, stc[i]:stc[i] + size] for i in range(b)])
        np.testing.assert_array_equal(out, ref)


def test_batch_slice_grad_is_masked_scatter(rng):
    from shwd_tpu.ops.ot1d import _batch_slice
    a = rng.random((5, 48)).astype(np.float32)
    st = np.array([0, 3, 16, 31, 20])
    g = jax.grad(lambda x: jnp.sum(_batch_slice(x, jnp.asarray(st), 16) ** 2))(
        jnp.asarray(a))
    ref = np.zeros_like(a)
    for i in range(5):
        ref[i, st[i]:st[i] + 16] = 2 * a[i, st[i]:st[i] + 16]
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-6)


def test_sort_lastdim_value_and_vjp(rng):
    from shwd_tpu.ops.ot1d import sort_lastdim
    x = rng.random((7, 33)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(sort_lastdim(jnp.asarray(x))),
                                  np.sort(x, -1))
    # VJP == inverse-permutation of cotangent (compare vs jnp.sort autodiff)
    ct = rng.random((7, 33)).astype(np.float32)
    _, vjp = jax.vjp(sort_lastdim, jnp.asarray(x))
    _, vjp_ref = jax.vjp(lambda v: jnp.sort(v, axis=-1), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(vjp(jnp.asarray(ct))[0]),
                               np.asarray(vjp_ref(jnp.asarray(ct))[0]),
                               rtol=1e-6)


def test_corr_windows_matches_direct(rng):
    """The DFT-matmul correlation (period-n cc + suffix-sum shift terms)
    equals the direct sliding-window correlation against V3 = [v-1, v, v+1]."""
    from shwd_tpu.ops.ot1d import _corr_windows
    for n in (16, 64, 128):
        u = np.sort(rng.random((9, n)).astype(np.float32), -1)
        v = np.sort(rng.random((9, n)).astype(np.float32), -1)
        v3 = np.concatenate([v - 1, v, v + 1], -1)
        ref = np.stack([np.einsum("bi,bi->b", u.astype(np.float64),
                                  v3[:, j:j + n].astype(np.float64))
                        for j in range(2 * n + 1)], -1)
        out = np.asarray(_corr_windows(jnp.asarray(u), jnp.asarray(v)))
        # f32 accumulation noise ~4e-5 abs; corr feeds an argmin whose
        # selected vertex is then evaluated exactly, so abs tolerance is
        # the right check here
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_circle_ot_p2_eq_is_exact_vertex_min(rng):
    from shwd_tpu.ops.ot1d import _circle_ot_p2_eq
    n = 64
    u = np.sort(rng.random((17, n)).astype(np.float32), -1)
    v = np.sort(rng.random((17, n)).astype(np.float32), -1)
    v3 = np.concatenate([v - 1, v, v + 1], -1)
    a = np.stack([np.sum((u - v3[:, j:j + n]) ** 2, -1)
                  for j in range(2 * n + 1)], -1)
    ref = a.min(-1) / n
    out = np.asarray(_circle_ot_p2_eq(jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-9)
