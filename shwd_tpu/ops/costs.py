"""Pairwise transport-cost matrices for spherical and Euclidean OT.

TPU-native equivalents of the reference cost kernels:
- Lp cost          -> ``losses/s2_wasserstein.py:52-63``  (sum |x - y|^p)
- cosine cost      -> ``losses/s2_wasserstein_sub.py``    ((1 - cos)^p)
- geodesic cost    -> ``losses/s2_wasserstein.py:112-123`` (arccos(cos)^p)
- squared-L2 cost  -> notebook ``wasserstein_distance`` cells / main_rotation.py:82-92

All are batched (B, N, D) x (B, M, D) -> (B, N, M) and written to lower onto
the MXU: the inner products go through a single ``einsum`` (batched matmul)
instead of an N x M broadcast where possible. The arccos input is clipped away
from +-1 so gradients stay finite — the reference had real NaN incidents here
(``max_spherical_w_cos_with_regulation.py:529-553`` NaN forensics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_ACOS = 1e-7


def lp_cost(x: jax.Array, y: jax.Array, p: float = 2) -> jax.Array:
    """C[b, i, j] = sum_d |x[b,i,d] - y[b,j,d]|^p.

    Numerics note (load-bearing): for p == 2 the matmul expansion
    ||x||^2 + ||y||^2 - 2 x.y cancels catastrophically once the clouds
    nearly coincide (|x-y|^2 ~ 1e-6 as a difference of O(1) terms), and on
    TPU the default-precision einsum adds bf16-multiply noise on top —
    measured to stall Wasserstein flows at W2 ~ 1e-2 where the reference
    reaches 7e-4. For the geometric D <= 8 case we therefore use the direct
    broadcast difference (error relative to the *difference*, not the
    magnitudes); the MXU expansion, in HIGHEST precision, only for large D.
    """
    if p == 2:
        if x.shape[-1] <= 8:
            diff = x[..., :, None, :] - y[..., None, :, :]
            return jnp.sum(diff * diff, axis=-1)
        x2 = jnp.sum(x * x, axis=-1)[..., :, None]
        y2 = jnp.sum(y * y, axis=-1)[..., None, :]
        xy = jnp.einsum("...nd,...md->...nm", x, y,
                        precision=jax.lax.Precision.HIGHEST)
        return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)
    diff = jnp.abs(x[..., :, None, :] - y[..., None, :, :])
    return jnp.sum(diff**p, axis=-1)


def cosine_similarity(x: jax.Array, y: jax.Array, eps: float = 1e-8) -> jax.Array:
    """S[b, i, j] = cos angle between x[b,i] and y[b,j] via one batched matmul."""
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    return jnp.einsum("...nd,...md->...nm", xn, yn,
                      precision=jax.lax.Precision.HIGHEST)


def cosine_cost(x: jax.Array, y: jax.Array, p: float = 1) -> jax.Array:
    """C = (1 - cos)^p — the 'cos dissimilarity' cost (s2_wasserstein_sub.py)."""
    return (1.0 - cosine_similarity(x, y)) ** p


def geodesic_cost(x: jax.Array, y: jax.Array, p: float = 1) -> jax.Array:
    """C = arccos(cos)^p — great-circle distance cost on S^2.

    Reference ``Geodesic_distance_W.geodesic_cost_matrix``
    (s2_wasserstein.py:112-123). Inputs need not be exactly unit norm; the
    cosine is clipped to keep arccos (and its gradient) finite.
    """
    cos = jnp.clip(cosine_similarity(x, y), -1.0 + _EPS_ACOS, 1.0 - _EPS_ACOS)
    return jnp.arccos(cos) ** p


def sqeuclidean_cost(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared Euclidean cost (the exact-W2 eval cost in the flow notebooks)."""
    return lp_cost(x, y, p=2)


def cost_matrix(x: jax.Array, y: jax.Array, kind: str = "lp", p: float = 2) -> jax.Array:
    """Dispatch on cost kind: 'lp' | 'cosine' | 'geodesic' | 'sqeuclidean'."""
    if kind == "lp":
        return lp_cost(x, y, p)
    if kind == "cosine":
        return cosine_cost(x, y, p)
    if kind == "geodesic":
        return geodesic_cost(x, y, p)
    if kind == "sqeuclidean":
        return sqeuclidean_cost(x, y)
    raise ValueError(f"unknown cost kind: {kind!r}")
