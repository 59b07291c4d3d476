"""Planar flow f(z) = z + u * tanh(w.z + b).

Functional rebuild of ``normflows_ishikawa/flows/planar.py:8-81`` including
the u-reparameterization enforcing w.u > -1 (invertibility) and the exact
log-det. The alternative phi of ``Norm_Flow_structure("Planar", L)``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .base import Flow


class PlanarFlow(Flow):
    def __init__(self, dim: int = 3, act: str = "tanh"):
        if act != "tanh":
            raise NotImplementedError("only tanh planar flows are built")
        self.dim = dim

    def init(self, key):
        ku, kw = jax.random.split(key)
        lim_w = math.sqrt(2.0 / self.dim)
        lim_u = math.sqrt(2.0)
        params = {
            "u": jax.random.uniform(ku, (self.dim,), minval=-lim_u, maxval=lim_u),
            "w": jax.random.uniform(kw, (self.dim,), minval=-lim_w, maxval=lim_w),
            "b": jnp.zeros(()),
        }
        return params, {}

    def _constrained_u(self, params):
        u, w = params["u"], params["w"]
        inner = jnp.dot(w, u)
        # softplus(inner) - 1 - inner, as in planar.py:54-56
        return u + (jax.nn.softplus(inner) - 1.0 - inner) * w / jnp.sum(w * w)

    def apply(self, params, state, x, logdet: bool = False):
        w, b = params["w"], params["b"]
        u = self._constrained_u(params)
        lin = jnp.sum(w * x, axis=-1, keepdims=True) + b
        y = x + u * jnp.tanh(lin)
        if not logdet:
            return y, None
        h_prime = 1.0 / jnp.cosh(lin[..., 0]) ** 2
        ld = jnp.log(jnp.abs(1.0 + jnp.dot(w, u) * h_prime))
        return y, ld
