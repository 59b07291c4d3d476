"""Learned-chart sphere maps: MLP -> angles -> S^2 embedding.

Functional rebuilds of the two non-flow phi architectures:

- ``SphereChartMLP``  <-> reference ``transform_to_sphere``
  (``losses/max_spherical_sliced_w.py:334-350``): Linear 3-16-4-2 with tanh,
  head mapped to spherical angles theta1 in [0, pi], theta2 in [-pi, pi],
  embedded on S^2.
- ``EncoderFlowChart`` <-> ``mini_batch_Residual_MSSW.py:327-409``: a
  per-point encoder to 2-D (the reference's Conv1d 3-8-8-2 is per-point, i.e.
  an MLP), a chain of 2-D residual flows, then the same angle embedding.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .base import Flow, FlowChain
from .lipschitz import LipschitzMLP
from .residual import ResidualFlow


def _linear_init(key, n_in, n_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(n_in)
    return {
        "w": jax.random.uniform(kw, (n_out, n_in), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (n_out,), minval=-bound, maxval=bound),
    }


def _angles_to_sphere(h2):
    """(..., 2) head -> (..., 3) points on S^2 (reference :344-350)."""
    theta1 = jnp.pi * (jnp.tanh(h2[..., 0]) / 2.0 + 0.5)
    theta2 = jnp.pi * jnp.tanh(h2[..., 1])
    return jnp.stack(
        [jnp.sin(theta1) * jnp.cos(theta2),
         jnp.sin(theta1) * jnp.sin(theta2),
         jnp.cos(theta1)], axis=-1)


class SphereChartMLP(Flow):
    """tanh MLP 3->16->4->2 -> angle embedding onto S^2."""

    def __init__(self, widths=(3, 16, 4, 2)):
        self.widths = tuple(widths)

    def init(self, key):
        keys = jax.random.split(key, len(self.widths) - 1)
        params = tuple(_linear_init(k, self.widths[i], self.widths[i + 1])
                       for i, k in enumerate(keys))
        return params, {}

    def apply(self, params, state, x, logdet: bool = False):
        h = x
        for i, p in enumerate(params):
            h = h @ p["w"].T + p["b"]
            if i < len(params) - 1:
                h = jnp.tanh(h)
        return _angles_to_sphere(h), None


class EncoderFlowChart(Flow):
    """Per-point 2-D encoder -> 2-D residual flows -> S^2 embedding.

    The mini-batch-residual-MSSW phi (mini_batch_Residual_MSSW.py:392-409).
    """

    def __init__(self, encoder_widths=(3, 8, 8, 2), n_flow_layers: int = 3,
                 hidden_units: int = 8, hidden_layers: int = 3,
                 lipschitz_const: float = 0.95):
        self.encoder_widths = tuple(encoder_widths)
        d = encoder_widths[-1]
        channels = [d] + [hidden_units] * (hidden_layers - 1) + [d]
        self.flow = FlowChain([
            ResidualFlow(LipschitzMLP(channels, lipschitz_const, init_zeros=True))
            for _ in range(n_flow_layers)
        ])

    def init(self, key):
        k_enc, k_flow = jax.random.split(key)
        keys = jax.random.split(k_enc, len(self.encoder_widths) - 1)
        enc = tuple(_linear_init(k, self.encoder_widths[i], self.encoder_widths[i + 1])
                    for i, k in enumerate(keys))
        fp, fs = self.flow.init(k_flow)
        return {"encoder": enc, "flow": fp}, {"flow": fs}

    def apply(self, params, state, x, logdet: bool = False):
        h = x
        for i, p in enumerate(params["encoder"]):
            h = h @ p["w"].T + p["b"]
            if i < len(params["encoder"]) - 1:
                h = jax.nn.relu(h)
        h, _ = self.flow.apply(params["flow"], state["flow"], h)
        return _angles_to_sphere(h), None

    def update_state(self, params, state, n_iter: int = 1):
        return {"flow": self.flow.update_state(params["flow"], state["flow"], n_iter)}
