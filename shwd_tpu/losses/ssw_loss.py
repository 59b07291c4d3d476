"""Adversarial spherical sliced-Wasserstein loss (max-SSW).

Rebuild of ``max_spherical_wassersten_distance``
(``losses/max_spherical_sliced_w.py:498-536``), its batched twin
(``max_spherical_sliced_w_fast.py:346-380``) and the mini-batch residual
variant (``mini_batch_Residual_MSSW.py:413-452``):

    max_phi  sum_b SSW_p(phi(X_b), phi(Y_b))

phi is any flow/chart module (the reference uses ``transform_to_sphere`` or
an encoder+2-D-flow chart). The reference loops Python batches for the SSW
sum and for p >= 2 solves circle OT per item (:518-519); here everything is
one batched program — (B, L) problems solved at once — and the inner ascent
is a ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..flows.base import Flow
from ..ops.spherical import sliced_cost_sphere, stiefel_frames


@dataclasses.dataclass(frozen=True)
class MaxSSWConfig:
    num_projections: int = 100
    p: float = 2.0
    max_iter: int = 10
    phi_lr: float = 0.01
    phi_b1: float = 0.5
    phi_b2: float = 0.999
    minibatch: int = 0          # >0: inner steps see a random cloud subset
                                # (mini_batch_Residual_MSSW.py:434-437)
    power_iter_per_step: int = 1


class MaxSSWState(NamedTuple):
    phi_params: Any
    phi_state: Any
    opt_state: Any
    key: jax.Array


class MaxSSWLoss:
    def __init__(self, phi: Flow, cfg: MaxSSWConfig = MaxSSWConfig()):
        self.phi = phi
        self.cfg = cfg
        self.opt = optax.adam(cfg.phi_lr, b1=cfg.phi_b1, b2=cfg.phi_b2)

    def init(self, key: jax.Array) -> MaxSSWState:
        k_phi, k_carry = jax.random.split(key)
        params, fstate = self.phi.init(k_phi)
        return MaxSSWState(params, fstate, self.opt.init(params), k_carry)

    def _ssw_sum(self, params, fstate, x, y, key):
        """sum over batch of SSW_p^p(phi(x_b), phi(y_b)) (reference sums,
        :518-519, not means)."""
        sx, _ = self.phi.apply(params, fstate, x)
        sy, _ = self.phi.apply(params, fstate, y)
        frames = stiefel_frames(key, self.cfg.num_projections, x.shape[-1])
        return jnp.sum(sliced_cost_sphere(sx, sy, frames, p=self.cfg.p)), (sx, sy)

    def apply(self, state: MaxSSWState, x: jax.Array, y: jax.Array,
              train: bool = True):
        """x, y: (B, N, 3). Returns ((ssw, sphere_x, sphere_y), new_state)."""
        cfg = self.cfg
        if x.ndim == 2:
            x, y = x[None], y[None]
        if train:
            xd, yd = jax.lax.stop_gradient(x), jax.lax.stop_gradient(y)

            def step(carry, key):
                params, fstate, opt_state = carry
                k_frames, k_mb = jax.random.split(key)
                if cfg.minibatch > 0:
                    idx = jax.random.choice(
                        k_mb, x.shape[0], (cfg.minibatch,), replace=False)
                    xi, yi = xd[idx], yd[idx]
                else:
                    xi, yi = xd, yd
                grads = jax.grad(
                    lambda q: -self._ssw_sum(q, fstate, xi, yi, k_frames)[0]
                )(params)
                updates, opt_state = self.opt.update(grads, opt_state)
                params = optax.apply_updates(params, updates)
                if cfg.power_iter_per_step > 0:
                    fstate = self.phi.update_state(params, fstate,
                                                   cfg.power_iter_per_step)
                return (params, fstate, opt_state), None

            keys = jax.random.split(state.key, cfg.max_iter + 1)
            carry = (state.phi_params, state.phi_state, state.opt_state)
            carry, _ = jax.lax.scan(step, carry, keys[:-1])
            state = MaxSSWState(*carry, keys[-1])

        k_final, k_next = jax.random.split(state.key)
        ssw, (sx, sy) = self._ssw_sum(state.phi_params, state.phi_state,
                                      x, y, k_final)
        return (ssw, sx, sy), state._replace(key=k_next)
