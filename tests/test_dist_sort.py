"""Distributed point-axis sort + OT kernels on the 8-device CPU mesh.

Oracles are the single-device kernels in ``shwd_tpu.ops.ot1d`` (themselves
oracle-tested against the reference's torch code / POT in test_costs_ot.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from shwd_tpu.ops import ot1d
from shwd_tpu.ops.spherical import (
    stiefel_frames, project_to_circle, sliced_cost_sphere,
)
from shwd_tpu.parallel import (
    make_points_mesh, dist_sort, dist_cumsum, dist_emd1d,
    dist_emd1d_circle, make_dist_ssw,
)

D = 8


def _run_spmd(fn, mesh, *args, in_specs=None, out_specs=P(None, None)):
    specs = in_specs or tuple(
        P(*([None] * (a.ndim - 1) + ["points"])) for a in args)
    f = shard_map(fn, mesh=mesh, in_specs=specs, out_specs=out_specs,
                  check_vma=False)
    return jax.jit(f)(*args)


def test_dist_sort_matches_jnp_sort():
    mesh = make_points_mesh(points=D)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 5, 64)).astype(np.float32))
    got = _run_spmd(lambda a: dist_sort(a, D), mesh, x,
                    out_specs=P(None, None, "points"))
    np.testing.assert_allclose(np.asarray(got),
                               np.sort(np.asarray(x), axis=-1), rtol=0)


def test_dist_sort_payload_follows_keys():
    mesh = make_points_mesh(points=D)
    rng = np.random.default_rng(1)
    keys = jnp.asarray(rng.permutation(128).astype(np.float32)[None])
    payload = -2.0 * keys  # payload determined by key -> order-checkable

    def f(k, p):
        return jnp.stack(dist_sort(k, D, payload=p))

    got = _run_spmd(f, mesh, keys, payload,
                    out_specs=P(None, None, "points"))
    ks, ps = np.asarray(got[0]), np.asarray(got[1])
    np.testing.assert_allclose(ks, np.sort(np.asarray(keys), axis=-1))
    np.testing.assert_allclose(ps, -2.0 * ks)


def test_dist_cumsum():
    mesh = make_points_mesh(points=D)
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    got = _run_spmd(lambda a: dist_cumsum(a, D), mesh, w,
                    out_specs=P(None, "points"))
    np.testing.assert_allclose(np.asarray(got),
                               np.cumsum(np.asarray(w), axis=-1),
                               rtol=2e-5, atol=2e-6)


def test_dist_emd1d_matches_single_device():
    mesh = make_points_mesh(points=D)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(5, 128)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(5, 128)).astype(np.float32) + 0.3)
    want = np.asarray(ot1d.emd1d(u, v, p=2))
    got = _run_spmd(lambda a, b: dist_emd1d(a, b, D, p=2), mesh, u, v,
                    out_specs=P(None))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_dist_emd1d_circle_matches_single_device():
    mesh = make_points_mesh(points=D)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.uniform(size=(6, 128)).astype(np.float32))
    v = jnp.asarray(rng.uniform(size=(6, 64)).astype(np.float32))
    want = np.asarray(ot1d.emd1d_circle(u, v))
    got = _run_spmd(lambda a, b: dist_emd1d_circle(a, b, D), mesh, u, v,
                    out_specs=P(None))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-6)


def test_dist_ssw_matches_single_device_w1():
    mesh = make_points_mesh(points=4, data=2)
    key = jax.random.PRNGKey(0)
    b, n, L = 4, 64, 6
    x = jax.random.normal(key, (b, n, 3))
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = jnp.roll(x, 1, axis=1) + 0.05
    frames = stiefel_frames(jax.random.PRNGKey(1), L)
    want = float(jnp.mean(sliced_cost_sphere(x, y, frames[None], p=1)))

    ssw = make_dist_ssw(mesh)
    sh = NamedSharding(mesh, P("data", "points"))
    xs, ys = jax.device_put(x, sh), jax.device_put(y, sh)
    fs = jax.device_put(frames, NamedSharding(mesh, P()))
    got = float(jax.jit(ssw)(xs, ys, fs))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_dist_ssw_gradients_flow():
    mesh = make_points_mesh(points=D)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 32, 3))
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 3))
    frames = stiefel_frames(jax.random.PRNGKey(4), 4)
    ssw = make_dist_ssw(mesh)
    sh = NamedSharding(mesh, P(None, "points"))
    g = jax.jit(jax.grad(lambda a: ssw(a, y, frames)))(jax.device_put(x, sh))
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0
