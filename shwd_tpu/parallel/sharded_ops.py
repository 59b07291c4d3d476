"""Sharded loss kernels: data x slices parallel spherical sliced-OT.

The SSW loss with both parallel axes live (SURVEY.md §2.3 P2 + P3):
- cloud batch sharded over ``data``
- projection frames sharded over ``slices``

Each device handles its (B/D_data, L/D_slices) block of circle-OT problems
end to end — projections, sort, level-median/bisection — entirely locally
(embarrassingly parallel), then one ``psum`` mean over ``slices`` and one
over ``data``. Collectives ride ICI; there is no resharding of the (B, L, N)
intermediate, which never materializes globally.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.spherical import sliced_cost_sphere
from ..ops.costs import cost_matrix as build_cost
from ..ops.sinkhorn import emd2_approx


def make_sharded_ssw(mesh: Mesh, p: float = 2.0) -> Callable:
    """Returns ssw(x, y, frames) -> scalar mean over (batch, slices).

    x, y: (B, N, 3) sharded P('data'); frames: (L, 3, 2) sharded P('slices').
    """

    def local(x, y, frames):
        # local block: (B_loc, N, 3) x (L_loc, 3, 2)
        cost = sliced_cost_sphere(x, y, frames[None, ...], p=p)  # (B_loc,)
        # mean over slices axis: local mean then psum-mean over 'slices'
        s = jax.lax.pmean(cost, axis_name="slices")
        return jax.lax.pmean(jnp.mean(s), axis_name="data")[None]

    wrapped = shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("data"), P("slices")),
        out_specs=P(None),
    )

    def ssw(x, y, frames):
        return wrapped(x, y, frames)[0]

    return ssw


def make_sharded_transport(mesh: Mesh, cost: str = "lp", p: float = 2.0,
                           eps: float = 5e-3, num_iters: int = 50,
                           num_scales: int = 4) -> Callable:
    """Batched near-exact EMD with the batch sharded over 'data'.

    Each device Sinkhorn-solves its local (B/D, N, M) cost stack; one psum
    for the batch mean. The W = EMD^{1/p} convention matches
    ``losses.transport``.
    """

    def local(x, y):
        c = build_cost(x, y, cost, p)
        val = emd2_approx(c, eps=eps, num_iters=num_iters,
                          num_scales=num_scales)
        w = jnp.maximum(val, 1e-30) ** (1.0 / p)
        s = jax.lax.pmean(jnp.mean(w), axis_name="data")
        return jax.lax.pmean(s, axis_name="slices")[None]

    wrapped = shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(None),
    )

    def transport(x, y):
        return wrapped(x, y)[0]

    return transport
