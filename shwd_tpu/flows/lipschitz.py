"""Lipschitz-constrained MLP: Swish + spectrally-normalized linear layers.

TPU-native functional rebuild of the reference's residual-flow backbone
(``normflows_ishikawa/nets/lipschitz.py``): ``LipschitzMLP`` = alternating
Swish (learnable beta, /1.1 so |swish'| <= 1) and ``InducedNormLinear``
(spectral norm <= coeff via power iteration, *soft* normalization
``W / max(1, sigma/coeff)``).

Faithfulness notes vs the reference:
- sigma = u . (W v) is computed from the *live* weight, so gradients flow
  through the normalization factor (lipschitz.py:268-271) — reproduced here
  with u, v under ``stop_gradient``.
- The reference runs 200 power iterations at construction and then never
  updates u/v during training (forward calls ``compute_weight(update=False)``
  :278-280, and the trainers never call ``utils/optim.update_lipschitz``).
  Here u/v live in explicit state; ``update_state`` runs power iterations on
  demand so callers can choose the reference's frozen behaviour (never call
  it) or the better-conditioned per-step refresh.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from .base import Flow


def _normalize(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


def spectral_linear_init(key, in_features, out_features, zero_init=False,
                         power_iters: int = 200):
    """Init a spectrally-normalized linear layer: params {w, b}, state {u, v}."""
    kw, kb, ku, kv = jax.random.split(key, 4)
    # kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / math.sqrt(in_features)
    w = jax.random.uniform(kw, (out_features, in_features), minval=-bound, maxval=bound)
    if zero_init:
        w = w / 1000.0  # reference's approximate zero init (lipschitz.py:199-201)
    b = jax.random.uniform(kb, (out_features,), minval=-bound, maxval=bound)
    u = _normalize(jax.random.normal(ku, (out_features,)))
    v = _normalize(jax.random.normal(kv, (in_features,)))
    params = {"w": w, "b": b}
    state = {"u": u, "v": v}
    state = spectral_linear_power_iter(params, state, power_iters)
    return params, state


def spectral_linear_power_iter(params, state, n_iter: int = 1):
    """n_iter rounds of power iteration on (u, v) for the top singular pair."""
    w = jax.lax.stop_gradient(params["w"])

    def body(i, uv):
        u, v = uv
        u = _normalize(w @ v)
        v = _normalize(w.T @ u)
        return u, v

    u, v = jax.lax.fori_loop(0, n_iter, body, (state["u"], state["v"]))
    return {"u": u, "v": v}


def spectral_linear_apply(params, state, x, coeff: float = 0.97):
    """y = x @ W_hat^T + b with W_hat = W / max(1, sigma/coeff)."""
    u = jax.lax.stop_gradient(state["u"])
    v = jax.lax.stop_gradient(state["v"])
    w = params["w"]
    sigma = u @ (w @ v)          # differentiable through w (reference :268)
    factor = jnp.maximum(1.0, sigma / coeff)
    w_hat = w / factor
    return x @ w_hat.T + params["b"]


def swish(x, beta):
    """Reference Swish (lipschitz.py:642-648): x*sigmoid(x*softplus(beta))/1.1."""
    return (x * jax.nn.sigmoid(x * jax.nn.softplus(beta))) / 1.1


class LipschitzMLP:
    """channels e.g. [3, 8, 8, 8, 8, 8, 8, 3]: Swish -> SpectralLinear per layer.

    Matches reference ``LipschitzMLP`` (lipschitz.py:14-67): activation comes
    *before* each linear, last linear is (approximately) zero-initialized.
    Guaranteed Lipschitz constant < prod(coeff) < 1 for the whole net.
    """

    def __init__(self, channels: Sequence[int], lipschitz_const: float = 0.97,
                 init_zeros: bool = True):
        self.channels = tuple(channels)
        self.coeff = lipschitz_const
        self.init_zeros = init_zeros
        self.n_layers = len(channels) - 1

    def init(self, key):
        keys = jax.random.split(key, self.n_layers)
        params, state = [], []
        for i in range(self.n_layers):
            zero = self.init_zeros and i == self.n_layers - 1
            p, s = spectral_linear_init(keys[i], self.channels[i],
                                        self.channels[i + 1], zero_init=zero)
            p["beta"] = jnp.array([0.5])
            params.append(p)
            state.append(s)
        return tuple(params), tuple(state)

    def apply(self, params, state, x):
        for p, s in zip(params, state):
            x = swish(x, p["beta"])
            x = spectral_linear_apply(p, s, x, self.coeff)
        return x

    def update_state(self, params, state, n_iter: int = 1):
        return tuple(spectral_linear_power_iter(p, s, n_iter)
                     for p, s in zip(params, state))
