"""Invertible residual flow f(x) = x + g(x), ||g||_Lip < 1.

TPU-native rebuild of ``normflows_ishikawa/flows/residual.py`` +
``iResBlock``. Three design departures, all TPU-motivated:

- The SHWD hot path only needs the plain forward ``x + g(x)`` — the reference
  builds the whole Neumann-series/Hutchinson log-det graph and then throws the
  value away (``Norm_Flow_structure.forward`` discards log_det,
  s2_wasserstein.py:160-163). Here log-det is opt-in.
- For d = 3 the log-det is computed *exactly* with 3 forward-mode JVPs per
  point (a 3x3 Jacobian) — cheaper and noise-free vs the reference's
  stochastic ``neumann_logdet_estimator`` (residual.py:368-379), and fully
  jittable.
- The fixed-point inverse (reference ``_inverse_fixed_point`` :133-142, a
  data-dependent while) becomes a bounded ``lax.while_loop`` — jittable,
  convergence guaranteed by the Lipschitz bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Flow
from .lipschitz import LipschitzMLP


class ResidualFlow(Flow):
    """f(x) = x + net(x) with net Lipschitz < 1 (forward direction, matching
    the reference's ``Residual(net, reverse=False)`` used by SHWD)."""

    def __init__(self, net: LipschitzMLP):
        self.net = net

    def init(self, key):
        return self.net.init(key)

    def apply(self, params, state, x, logdet: bool = False):
        g = self.net.apply(params, state, x)
        y = x + g
        if not logdet:
            return y, None

        # exact log|det(I + Jg)| per point via d JVPs (d == 3 here)
        d = x.shape[-1]
        flat = x.reshape(-1, d)

        def gfun(pt):
            return self.net.apply(params, state, pt)

        eye = jnp.eye(d, dtype=x.dtype)
        jac_cols = [jax.jvp(gfun, (flat,), (jnp.broadcast_to(eye[i], flat.shape),))[1]
                    for i in range(d)]
        jg = jnp.stack(jac_cols, axis=-1)               # (P, d, d)
        ld = jnp.linalg.slogdet(jnp.eye(d) + jg)[1]
        return y, ld.reshape(x.shape[:-1])

    def update_state(self, params, state, n_iter: int = 1):
        return self.net.update_state(params, state, n_iter)

    def inverse(self, params, state, y, max_iter: int = 200, tol: float = 1e-6):
        """Banach fixed-point iteration x <- y - g(x) (contraction)."""

        def cond(carry):
            x, x_prev, i = carry
            return jnp.logical_and(
                i < max_iter,
                jnp.max(jnp.abs(x - x_prev)) > tol,
            )

        def body(carry):
            x, _, i = carry
            return y - self.net.apply(params, state, x), x, i + 1

        x0 = y - self.net.apply(params, state, y)
        x, _, _ = jax.lax.while_loop(cond, body, (x0, y, jnp.int32(0)))
        return x


def make_residual_chain(n_flow_layers: int = 3, dim: int = 3,
                        hidden_units: int = 8, hidden_layers: int = 7,
                        lipschitz_const: float = 0.95):
    """The reference's default phi: ``Norm_Flow_structure("Residual", L)``
    (s2_wasserstein.py:146-156): each block wraps a LipschitzMLP with channels
    [d, 8 x 6, d], coeff 0.95, zero-init last layer."""
    from .base import FlowChain

    channels = [dim] + [hidden_units] * (hidden_layers - 1) + [dim]
    return FlowChain([
        ResidualFlow(LipschitzMLP(channels, lipschitz_const, init_zeros=True))
        for _ in range(n_flow_layers)
    ])
