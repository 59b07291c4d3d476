"""The sliced-Wasserstein distance zoo from the flow notebooks.

JAX-native rebuilds of every distance defined in the 24 kB zoo cell of
``Wasserstein_flow_problem/Flow_cube.ipynb`` (cell 5): SWD, max-SWD,
generalized SWD (polynomial / circular / neural), augmented SWD (ASWD) and
distributional SWD (DSWD). These are the comparison methods of the
gradient-flow benchmark (BASELINE.md) — SHWD must beat them.

Design: every adversarial variant (max-*, ASWD, DSWD) shares one generic
``adversarial_maximize`` built on optax + ``lax.scan`` — the notebook's
repeated detach/Adam/renormalize loops, compiled into the loss. Distances are
stateless w.r.t. clouds; learned components (Mapping, TransformNet, MLP)
carry explicit params like the flows do.
"""

from __future__ import annotations

import functools
import math
from itertools import combinations
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


def rand_projections(key: jax.Array, dim: int, num_projections: int = 100) -> jax.Array:
    """L uniform directions on S^{dim-1} (notebook ``rand_projections``)."""
    p = jax.random.normal(key, (num_projections, dim))
    return p / jnp.linalg.norm(p, axis=-1, keepdims=True)


def _projected_w(xp: jax.Array, yp: jax.Array, p: float) -> jax.Array:
    """Notebook convention: sum_i |sort(xp) - sort(yp)|^p per projection,
    then (mean over projections)^(1/p). xp, yp: (N, L)."""
    d = jnp.abs(jnp.sort(xp.T, axis=1) - jnp.sort(yp.T, axis=1))
    w = jnp.sum(d ** p, axis=1)
    return jnp.mean(w) ** (1.0 / p)


def sliced_wasserstein_distance(key, x, y, num_projections: int = 100,
                                p: float = 2) -> jax.Array:
    """Plain SWD (notebook ``sliced_wasserstein_distance``); x, y: (N, 3)."""
    proj = rand_projections(key, x.shape[-1], num_projections)
    return _projected_w(x @ proj.T, y @ proj.T, p)


# ---------------------------------------------------------------------------
# generic inner maximization (the notebooks' detach/Adam/renormalize loops)
# ---------------------------------------------------------------------------

def adversarial_maximize(objective: Callable, params, max_iter: int = 10,
                         lr: float = 0.005, betas=(0.999, 0.999),
                         project: Callable | None = None, xs=None):
    """Run ``max_iter`` Adam ascent steps on ``objective(params)`` (maximized),
    optionally re-projecting params after each step (e.g. renormalization).
    When ``xs`` is given (an array scanned over its leading axis, e.g.
    per-step PRNG keys for objectives that redraw randomness every inner
    step), the objective is called as ``objective(params, x)`` and its length
    overrides ``max_iter``. Returns final params. Fully jittable (lax.scan)."""
    opt = optax.adam(lr, b1=betas[0], b2=betas[1])

    def step(carry, x):
        params, opt_state = carry
        obj = objective if xs is None else functools.partial(objective, x=x)
        grads = jax.grad(lambda q: -obj(q))(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        if project is not None:
            params = project(params)
        return (params, opt_state), None

    (params, _), _ = jax.lax.scan(step, (params, opt.init(params)), xs,
                                  length=max_iter if xs is None else None)
    return params


def max_sliced_wasserstein_distance(key, x, y, p: float = 2,
                                    max_iter: int = 10) -> jax.Array:
    """Max-SWD: one direction optimized by Adam (notebook ``max_sliced_...``)."""
    theta0 = rand_projections(key, x.shape[-1], 1)
    xd, yd = jax.lax.stop_gradient(x), jax.lax.stop_gradient(y)

    def obj(theta):
        return _projected_w(xd @ theta.T, yd @ theta.T, p)

    def renorm(theta):
        return theta / jnp.linalg.norm(theta, axis=-1, keepdims=True)

    theta = jax.lax.stop_gradient(
        adversarial_maximize(obj, theta0, max_iter, project=renorm))
    return _projected_w(x @ theta.T, y @ theta.T, p)


# ---------------------------------------------------------------------------
# generalized SWD: polynomial and circular defining functions
# ---------------------------------------------------------------------------

def poly_degree_matrix(degree: int, dim: int) -> np.ndarray:
    """Exponent matrix of all degree-``degree`` monomials in ``dim`` variables
    (notebook ``poly_degree`` stars-and-bars construction). Static/NumPy —
    computed at trace time."""
    comb = list(combinations(np.arange(1, degree + dim), dim - 1))
    out = np.zeros((len(comb), dim), dtype=np.float32)
    for i, c in enumerate(comb):
        c = list(c) + [degree + dim]
        for j, index in enumerate(c):
            out[i, j] = index - 1 if j == 0 else index - c[j - 1] - 1
    return out


def _poly_features(samples: jax.Array, degree_matrix: jax.Array) -> jax.Array:
    """(N, d) -> (N, n_monomials): prod_k x_k^{e_k} per monomial row."""
    return jnp.prod(samples[:, None, :] ** degree_matrix[None, :, :], axis=-1)


def gswd_polynomial(key, x, y, num_projections: int = 100, degree: int = 5,
                    p: float = 2) -> jax.Array:
    """GSWD with random homogeneous-polynomial defining function."""
    dm = jnp.asarray(poly_degree_matrix(degree, x.shape[-1]))
    coeff = jax.random.normal(key, (dm.shape[0], num_projections))
    coeff = coeff / jnp.linalg.norm(coeff, axis=0, keepdims=True)
    return _projected_w(_poly_features(x, dm) @ coeff,
                        _poly_features(y, dm) @ coeff, p)


def max_gswd_polynomial(key, x, y, degree: int = 3, p: float = 2,
                        max_iter: int = 10) -> jax.Array:
    """max-GSWD-polynomial (notebook ``max_GSWD_polynomial_{3,5}``)."""
    dm = jnp.asarray(poly_degree_matrix(degree, x.shape[-1]))
    coeff0 = jax.random.normal(key, (dm.shape[0], 1))
    coeff0 = coeff0 / jnp.linalg.norm(coeff0, axis=0, keepdims=True)
    fx, fy = _poly_features(jax.lax.stop_gradient(x), dm), \
        _poly_features(jax.lax.stop_gradient(y), dm)

    def obj(c):
        return _projected_w(fx @ c, fy @ c, p)

    def renorm(c):
        return c / jnp.linalg.norm(c, axis=0, keepdims=True)

    coeff = jax.lax.stop_gradient(
        adversarial_maximize(obj, coeff0, max_iter, project=renorm))
    return _projected_w(_poly_features(x, dm) @ coeff,
                        _poly_features(y, dm) @ coeff, p)


def gswd_polynomial3_2d(key, x, y, num_projections: int = 100,
                        p: float = 2) -> jax.Array:
    """Notebook ``GSWD_polynomial3``: hand-rolled homogeneous cubic in the
    first two coordinates, features (y^3, x y^2, x^2 y, x^3)."""
    def feats(s):
        a, b = s[:, 0], s[:, 1]
        return jnp.stack([b ** 3, a * b ** 2, a ** 2 * b, a ** 3], axis=-1)

    theta = rand_projections(key, 4, num_projections)
    return _projected_w(feats(x) @ theta.T, feats(y) @ theta.T, p)


def _circular_features(samples, theta, r):
    """sqrt of squared distances to anchor points theta*r (notebook
    ``circular_function``): (N, L)."""
    d2 = jnp.sum((samples[:, None, :] - (theta * r)[None, :, :]) ** 2, axis=-1)
    return jnp.sqrt(jnp.maximum(d2, 1e-20))


def gswd_circular(key, x, y, num_projections: int = 100, r: float = 1.0,
                  p: float = 2) -> jax.Array:
    theta = rand_projections(key, x.shape[-1], num_projections)
    return _projected_w(_circular_features(x, theta, r),
                        _circular_features(y, theta, r), p)


def max_gswd_circular(key, x, y, r: float = 1.0, p: float = 2,
                      max_iter: int = 10) -> jax.Array:
    theta0 = rand_projections(key, x.shape[-1], 1)
    xd, yd = jax.lax.stop_gradient(x), jax.lax.stop_gradient(y)

    def obj(t):
        return _projected_w(_circular_features(xd, t, r),
                            _circular_features(yd, t, r), p)

    def renorm(t):
        return t / jnp.linalg.norm(t, axis=-1, keepdims=True)

    theta = jax.lax.stop_gradient(
        adversarial_maximize(obj, theta0, max_iter, project=renorm))
    return _projected_w(_circular_features(x, theta, r),
                        _circular_features(y, theta, r), p)


# ---------------------------------------------------------------------------
# augmented SWD (learned augmentation map phi(x) = [x, Wx + b])
# ---------------------------------------------------------------------------

def init_mapping(key, dim: int = 3):
    """Notebook ``Mapping``: one linear layer, output concatenated to input."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(dim)
    return {"w": jax.random.uniform(kw, (dim, dim), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (dim,), minval=-bound, maxval=bound)}


def _mapping_apply(params, x):
    return jnp.concatenate([x, x @ params["w"].T + params["b"]], axis=-1)


def augmented_sliced_wasserstein_distance(key, x, y, mapping_params,
                                          num_projections: int = 100,
                                          p: float = 2, max_iter: int = 10,
                                          lam: float = 20.0, lr: float = 0.005):
    """ASWD (notebook ``augmented_sliced_wassersten_distance``): maximize SWD
    of the augmented clouds, L2-norm regularizer on the embedding; returns
    (distance, new_mapping_params) — the mapping persists across flow steps."""
    k1, k2 = jax.random.split(key)
    xd, yd = jax.lax.stop_gradient(x), jax.lax.stop_gradient(y)
    n_scale = 512.0 / x.shape[0]

    def obj(params):
        fx = _mapping_apply(params, xd)
        fy = _mapping_apply(params, yd)
        reg = lam * jnp.mean(jnp.linalg.norm(fx, axis=1) + jnp.linalg.norm(fy, axis=1))
        proj = rand_projections(k1, fx.shape[-1], num_projections)
        d = jnp.abs(jnp.sort((fx @ proj.T).T, 1) - jnp.sort((fy @ proj.T).T, 1))
        w = (jnp.mean(jnp.sum(d ** p, axis=1) * n_scale)) ** (1.0 / p)
        return w - reg  # maximize W - reg

    new_params = adversarial_maximize(obj, mapping_params, max_iter, lr=lr,
                                      betas=(0.5, 0.999))
    new_params = jax.lax.stop_gradient(new_params)
    fx = _mapping_apply(new_params, x)
    fy = _mapping_apply(new_params, y)
    proj = rand_projections(k2, fx.shape[-1], num_projections)
    return _projected_w(fx @ proj.T, fy @ proj.T, p), new_params


# ---------------------------------------------------------------------------
# distributional SWD (learned projection distribution)
# ---------------------------------------------------------------------------

def init_transform_net(key, dim: int = 3):
    """Notebook ``TransformNet``: linear layer + renormalize to the sphere."""
    return init_mapping(key, dim)


def _transform_net_apply(params, pro):
    out = pro @ params["w"].T + params["b"]
    return out / jnp.linalg.norm(out, axis=1, keepdims=True)


def distributional_sliced_wasserstein_distance(key, x, y, net_params,
                                               num_projections: int = 100,
                                               p: float = 2, max_iter: int = 10,
                                               lam: float = 1.0, lr: float = 0.005):
    """DSWD: push random directions through a learned sphere-map, regularized
    by cosine diversity (notebook ``distributional_sliced_...``). Returns
    (distance, new_net_params)."""
    keys = jax.random.split(key, max_iter + 2)
    xd, yd = jax.lax.stop_gradient(x), jax.lax.stop_gradient(y)
    dim = x.shape[-1]

    # the notebook redraws base directions every inner step -> per-step keys
    # scanned through the shared helper
    def obj(params, x):
        pro = rand_projections(x, dim, num_projections)
        proj = _transform_net_apply(params, pro)
        cosd = jnp.mean(jnp.abs(
            proj @ proj.T / jnp.clip(
                jnp.linalg.norm(proj, axis=1, keepdims=True)
                * jnp.linalg.norm(proj, axis=1, keepdims=True).T, 1e-8)))
        w = _projected_w(xd @ proj.T, yd @ proj.T, p)
        return w - lam * cosd

    params = jax.lax.stop_gradient(
        adversarial_maximize(obj, net_params, lr=lr, betas=(0.5, 0.999),
                             xs=keys[:max_iter]))
    pro = rand_projections(keys[-1], dim, num_projections)
    proj = _transform_net_apply(params, pro)
    return _projected_w(x @ proj.T, y @ proj.T, p), params


# ---------------------------------------------------------------------------
# neural GSW (MLP defining function)
# ---------------------------------------------------------------------------

def init_gsw_mlp(key, din: int = 3, dout: int = 10, num_filters: int = 32,
                 depth: int = 3):
    """Notebook ``MLP``: depth x (linear + leaky-relu) + linear head."""
    widths = [din] + [num_filters] * depth + [dout]
    keys = jax.random.split(key, len(widths) - 1)
    layers = []
    for i, k in enumerate(keys):
        kw, kb = jax.random.split(k)
        bound = 1.0 / math.sqrt(widths[i])
        layers.append({
            "w": jax.random.uniform(kw, (widths[i + 1], widths[i]),
                                    minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (widths[i + 1],),
                                    minval=-bound, maxval=bound)})
    return tuple(layers)


def _gsw_mlp_apply(params, x):
    h = x
    for i, p in enumerate(params):
        h = h @ p["w"].T + p["b"]
        if i < len(params) - 1:
            h = jax.nn.leaky_relu(h, 0.01)
    return h


def gsw_nn(x, y, net_params, p: float = 2) -> jax.Array:
    """gsw_nn_{1,3}: SWD through a fixed neural defining function."""
    return _projected_w(_gsw_mlp_apply(net_params, x),
                        _gsw_mlp_apply(net_params, y), p)


def max_gsw_nn(x, y, net_params, p: float = 2, max_iter: int = 10,
               lr: float = 0.005):
    """max_gsw_nn_{1,3}: adversarially train the defining net. Returns
    (distance, new_net_params)."""
    xd, yd = jax.lax.stop_gradient(x), jax.lax.stop_gradient(y)

    def obj(params):
        return _projected_w(_gsw_mlp_apply(params, xd),
                            _gsw_mlp_apply(params, yd), p)

    new_params = adversarial_maximize(obj, net_params, max_iter, lr=lr,
                                      betas=(0.5, 0.999))
    new_params = jax.lax.stop_gradient(new_params)
    return gsw_nn(x, y, new_params, p), new_params
