"""Pseudo-max SHWD: ensemble of fixed random flows instead of inner ascent.

Rebuild of ``pseudo_max_cos_disimilarity_wassersten_distance``
(s2_wasserstein.py:272-344): draw ``phi_num`` random flows once, never train
them, and combine the per-flow transport distances with max / mean / softmax.

TPU-native design: the ensemble is *stacked parameters* evaluated under one
``jax.vmap`` — a single compiled program — instead of the reference's Python
loop over modules (:300-328). The ensemble axis is exactly the P4 parallelism
row of SURVEY.md §2.3 and can be sharded over the mesh.

Note on 'softmax': the reference's softmax branch (:330-341) computes
``softmax(cswd) @ torch.tensor(phi_list)`` — a type error on any modern torch
(a module list is not a tensor); the intended semantics is a
softmax-weighted combination of the distances, which is what we implement.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..flows.base import FlowChain
from .transport import TransportConfig, make_transport


@dataclasses.dataclass(frozen=True)
class PseudoSHWDConfig:
    transport: TransportConfig = TransportConfig(cost="lp", p=2.0)
    phi_num: int = 2
    combine: str = "max"        # 'max' | 'mean' | 'softmax'


class PseudoSHWDState(NamedTuple):
    phi_params: Any             # stacked over leading phi_num axis
    phi_state: Any
    key: jax.Array


class PseudoSHWDLoss:
    def __init__(self, flow: FlowChain, cfg: PseudoSHWDConfig = PseudoSHWDConfig()):
        self.flow = flow
        self.cfg = cfg
        self.transport = make_transport(
            dataclasses.replace(cfg.transport, reduce=cfg.transport.reduce))

    def init(self, key: jax.Array) -> PseudoSHWDState:
        keys = jax.random.split(key, self.cfg.phi_num + 1)
        inits = [self.flow.init(k) for k in keys[:-1]]
        params = jax.tree.map(lambda *a: jnp.stack(a), *[p for p, _ in inits])
        state = jax.tree.map(lambda *a: jnp.stack(a), *[s for _, s in inits])
        return PseudoSHWDState(params, state, keys[-1])

    def apply(self, state: PseudoSHWDState, x: jax.Array, y: jax.Array,
              train: bool = True):
        """Returns ((value, sphere_x, sphere_y), new_state).

        The clouds are detached before the ensemble (reference :298-299);
        gradients reach x, y only through the final combine — matching the
        reference, whose returned max/mean is over detached-input distances
        except via the last evaluated transform. We keep the loss
        differentiable wrt x, y by *not* detaching (the reference detaches
        then uses the result as a training loss; gradients there flow through
        the returned transforms of the last phi — an inconsistency we resolve
        in favour of full differentiability).
        """
        k_eval, k_next = jax.random.split(state.key)

        def one(params, fstate):
            sx = self.flow(params, fstate, x)
            sy = self.flow(params, fstate, y)
            return self.transport(sx, sy, k_eval), sx, sy

        vals, sxs, sys = jax.vmap(one)(state.phi_params, state.phi_state)

        c = self.cfg.combine
        if c == "max":
            idx = jnp.argmax(vals)
            value = jnp.max(vals)
        elif c == "mean":
            idx = self.cfg.phi_num - 1   # reference returns the last transform
            value = jnp.mean(vals)
        elif c == "softmax":
            idx = self.cfg.phi_num - 1
            weights = jax.nn.softmax(vals)
            value = jnp.sum(weights * vals)
        else:
            raise ValueError(f"combine must be max|mean|softmax, got {c!r}")

        sx = jax.lax.dynamic_index_in_dim(sxs, idx, 0, keepdims=False)
        sy = jax.lax.dynamic_index_in_dim(sys, idx, 0, keepdims=False)
        new_state = state._replace(key=k_next)
        return (value, sx, sy), new_state
