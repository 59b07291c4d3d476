"""Synthetic genus-0 geometry samplers (cube / ellipsoid / sphere surfaces).

JAX-native, key-driven equivalents of the generators in the reference's
Wasserstein-flow notebooks (``Wasserstein_flow_problem/Flow_cube.ipynb`` cell 2
and ``Flow_ellipsoid*.ipynb`` cell 2): uniform and biased samplings of the cube
surface, and (biased) samplings of ellipsoid surfaces. These drive the
gradient-flow benchmark (BASELINE.md, Flow_cube config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_cube_surface(key: jax.Array, n: int, side: float = 1.0,
                        biased: bool = False) -> jax.Array:
    """Sample n points on the surface of a cube centred at the origin.

    ``biased=False``: face chosen uniformly, in-face coordinates uniform.
    ``biased=True``: in-face coordinates Beta(2, 5)-distributed, matching the
    notebook's biased target cloud (a corner-skewed density on each face).
    """
    k_face, k_uv, k_beta = jax.random.split(key, 3)
    face = jax.random.randint(k_face, (n,), 0, 6)
    if biased:
        uv = jax.random.beta(k_beta, 2.0, 5.0, (n, 2))
    else:
        uv = jax.random.uniform(k_uv, (n, 2))
    uv = (uv - 0.5) * side
    half = side / 2.0

    axis = face % 3              # which coordinate is pinned to a face
    pinned = jnp.where(face < 3, half, -half)
    u, v = uv[:, 0], uv[:, 1]
    c0 = jnp.where(axis == 0, pinned, u)
    c1 = jnp.where(axis == 1, pinned, jnp.where(axis == 0, u, v))
    c2 = jnp.where(axis == 2, pinned, v)
    return jnp.stack([c0, c1, c2], axis=-1)


def sample_ellipsoid_surface(key: jax.Array, n: int,
                             semi_axes=(2.0, 1.0, 1.0),
                             biased_scale: float | None = None) -> jax.Array:
    """Sample n points on an ellipsoid surface x^2/a^2 + y^2/b^2 + z^2/c^2 = 1.

    Uniform-on-sphere directions stretched by the semi-axes (the notebook's
    construction). ``biased_scale`` concentrates the Gaussian draw along one
    octant the way the notebook's biased target does (scale 0.25 / 0.1).
    """
    a, b, c = semi_axes
    z = jax.random.normal(key, (n, 3))
    if biased_scale is not None:
        z = jnp.abs(z) * biased_scale + 0.5
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    return z * jnp.array([a, b, c])


def sample_sphere_surface(key: jax.Array, n: int, radius: float = 1.0) -> jax.Array:
    """Uniform points on S^2 of given radius."""
    z = jax.random.normal(key, (n, 3))
    return radius * z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
