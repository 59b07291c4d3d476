"""Functional flow interface.

A flow is a static config object exposing pure functions:

    params, state = flow.init(key)
    y, logdet     = flow.apply(params, state, x, logdet=False)
    state         = flow.update_state(params, state, n_iter)   # power iteration etc.
    x             = flow.inverse(params, state, y)

``params`` are trainable pytrees (optimized by optax); ``state`` carries
non-trained buffers (spectral-norm u/v vectors, ActNorm init flags) explicitly
— the functional replacement for the reference's in-place buffer mutation
(``normflows_ishikawa/nets/lipschitz.py:223-271`` mutates u/v during forward).

All ``apply`` functions treat x as (..., d) and broadcast over leading dims, so
the same flow serves (N, 3) clouds and (B, N, 3) batches, and stacks under
``jax.vmap`` for phi-ensembles.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp


class Flow:
    """Base class; subclasses override init/apply (+ optionally inverse)."""

    def init(self, key: jax.Array):
        raise NotImplementedError

    def apply(self, params, state, x, logdet: bool = False):
        raise NotImplementedError

    def update_state(self, params, state, n_iter: int = 1):
        return state

    def inverse(self, params, state, y):
        raise NotImplementedError(f"{type(self).__name__} has no inverse")


class FlowChain(Flow):
    """Composition of flows, applied left to right (reference
    ``Norm_Flow_structure.forward``, s2_wasserstein.py:160-163)."""

    def __init__(self, flows: Sequence[Flow]):
        self.flows = tuple(flows)

    def init(self, key):
        keys = jax.random.split(key, max(len(self.flows), 1))
        ps, ss = [], []
        for f, k in zip(self.flows, keys):
            p, s = f.init(k)
            ps.append(p)
            ss.append(s)
        return tuple(ps), tuple(ss)

    def apply(self, params, state, x, logdet: bool = False):
        total = jnp.zeros(x.shape[:-1], x.dtype) if logdet else None
        for f, p, s in zip(self.flows, params, state):
            x, ld = f.apply(p, s, x, logdet=logdet)
            if logdet:
                total = total + ld
        return x, total

    def update_state(self, params, state, n_iter: int = 1):
        return tuple(
            f.update_state(p, s, n_iter)
            for f, p, s in zip(self.flows, params, state)
        )

    def inverse(self, params, state, y):
        for f, p, s in zip(reversed(self.flows), reversed(params), reversed(state)):
            y = f.inverse(p, s, y)
        return y

    def __call__(self, params, state, x):
        """Convenience: forward map only (the SHWD hot path)."""
        return self.apply(params, state, x, logdet=False)[0]
