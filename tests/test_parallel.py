"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4(d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from shwd_tpu.parallel import (
    make_mesh, batch_sharding, frames_sharding, make_sharded_ssw,
    make_sharded_transport,
)
from shwd_tpu.ops.spherical import stiefel_frames, sliced_cost_sphere
from shwd_tpu.ops import lp_cost
from shwd_tpu.ops.sinkhorn import emd2_approx


def test_mesh_shapes():
    mesh = make_mesh(data=4, slices=2)
    assert mesh.shape == {"data": 4, "slices": 2}
    mesh2 = make_mesh()
    assert mesh2.shape["data"] == len(jax.devices())


def test_sharded_ssw_matches_single_device():
    mesh = make_mesh(data=4, slices=2)
    key = jax.random.PRNGKey(0)
    b, n, L = 8, 32, 16
    x = jax.random.normal(key, (b, n, 3))
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = jnp.roll(x, 1, axis=1) + 0.05
    frames = stiefel_frames(jax.random.PRNGKey(1), L)

    want = float(jnp.mean(sliced_cost_sphere(x, y, frames[None], p=2)))

    ssw = make_sharded_ssw(mesh, p=2)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    fs = jax.device_put(frames, frames_sharding(mesh))
    got = float(jax.jit(ssw)(xs, ys, fs))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_transport_matches_single_device():
    mesh = make_mesh(data=8, slices=1)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 16, 3))
    y = x + 0.1

    c = lp_cost(x, y, 2)
    want = float(jnp.mean(jnp.maximum(
        emd2_approx(c, eps=5e-3, num_iters=50, num_scales=4), 1e-30) ** 0.5))

    transport = make_sharded_transport(mesh, cost="lp", p=2.0)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    got = float(jax.jit(transport)(xs, ys))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sharded_ssw_grad_flows():
    mesh = make_mesh(data=4, slices=2)
    ssw = make_sharded_ssw(mesh, p=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 3))
    y = x + 0.2
    frames = stiefel_frames(jax.random.PRNGKey(1), 8)
    g = jax.jit(jax.grad(lambda a: ssw(a, y, frames)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0
