"""PointNet encoder: per-point MLP + global max-pool.

TPU-native rebuild of ``models/mlp_architecture.py`` (Conv1d-k1 stack
3-64-64-64-128-1024 with ReLU) and ``models/pooling.py`` (max over points).
A 1x1 Conv1d over points IS a per-point linear map, so the whole encoder is a
chain of (B, N, C) x (C, C') batched matmuls — exactly what the MXU wants; no
convolution machinery needed. bfloat16-friendly: all shapes static, features
padded to MXU-tile multiples by construction (64/128/1024).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _linear_init(key, n_in, n_out):
    """torch Conv1d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(n_in)
    return {
        "w": jax.random.uniform(kw, (n_out, n_in), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (n_out,), minval=-bound, maxval=bound),
    }


class PointNet:
    """Per-point feature extractor; returns (B, N, emb_dims) features."""

    def __init__(self, emb_dims: int = 1024,
                 widths: Sequence[int] = (3, 64, 64, 64, 128)):
        self.widths = tuple(widths) + (emb_dims,)
        self.emb_dims = emb_dims

    def init(self, key):
        keys = jax.random.split(key, len(self.widths) - 1)
        return tuple(_linear_init(k, self.widths[i], self.widths[i + 1])
                     for i, k in enumerate(keys))

    def apply(self, params, x: jax.Array) -> jax.Array:
        """x: (B, N, 3) -> (B, N, emb_dims); ReLU after every layer
        (including the last, as the reference does)."""
        h = x
        for p in params:
            h = jax.nn.relu(
                jnp.einsum("bnc,dc->bnd", h, p["w"]) + p["b"])
        return h


def max_pool(features: jax.Array) -> jax.Array:
    """(B, N, C) -> (B, C) global max over points (models/pooling.py:3-7)."""
    return jnp.max(features, axis=-2)
