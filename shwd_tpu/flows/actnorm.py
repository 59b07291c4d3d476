"""ActNorm: per-dimension affine y = exp(s) * x + t with data-dependent init.

Functional rebuild of ``normflows_ishikawa/flows/normalization.py`` (ActNorm
over AffineConstFlow). The reference initializes (s, t) from the first batch
via in-place mutation guarded by a ``data_dep_init_done`` buffer; here the
data-dependent init is an explicit ``init_from_data`` call — no hidden
first-forward behaviour under jit.

Used by some Flow_structure variants
(``max_spherical_w_cos_with_regulation.py:94``; commented alternative at
``s2_wasserstein.py:155``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Flow


class ActNorm(Flow):
    def __init__(self, dim: int = 3):
        self.dim = dim

    def init(self, key):
        params = {"s": jnp.zeros((self.dim,)), "t": jnp.zeros((self.dim,))}
        return params, {}

    def init_from_data(self, params, x):
        """Set (s, t) so that outputs are ~unit Gaussian on this batch."""
        flat = x.reshape(-1, self.dim)
        s = -jnp.log(jnp.std(flat, axis=0) + 1e-6)
        t = -jnp.mean(flat, axis=0) * jnp.exp(s)
        return {"s": s, "t": t}

    def apply(self, params, state, x, logdet: bool = False):
        y = x * jnp.exp(params["s"]) + params["t"]
        if not logdet:
            return y, None
        ld = jnp.broadcast_to(jnp.sum(params["s"]), x.shape[:-1])
        return y, ld

    def inverse(self, params, state, y):
        return (y - params["t"]) * jnp.exp(-params["s"])
