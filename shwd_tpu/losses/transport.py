"""Batched spherical transport distances — the 'CSW' family.

Functional equivalents of the reference's distance modules
``Cos_disimilarity_W`` (s2_wasserstein.py:13-66, Lp cost despite the name),
``Geodesic_distance_W`` (:73-126), and the cosine-cost variant in
``s2_wasserstein_sub.py``: build a (B, N, M) cost matrix, solve OT per batch
item, take the 1/p root, mean over batch.

The reference solves each item with POT's CPU network simplex in a Python
loop (:40-45) — the throughput ceiling SURVEY.md §3.1 identifies. Here the
whole batch is one fused TPU computation; the solver is pluggable:

- 'sinkhorn':  eps-scaled log-domain Sinkhorn (near-exact, differentiable) —
  the default EMD surrogate on TPU.
- 'sinkhorn_fast': single-temperature Sinkhorn (entropic, fastest).
- 'ssw': spherical sliced-Wasserstein (no cost matrix at all) — the
  performance path; cost kind is ignored.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops import cost_matrix as build_cost
from ..ops.sinkhorn import emd2_approx, sinkhorn_log
from ..ops.sinkhorn_pallas import emd2_points
from ..ops.spherical import sliced_cost_sphere, stiefel_frames


@dataclasses.dataclass(frozen=True)
class TransportConfig:
    cost: str = "lp"            # 'lp' | 'cosine' | 'geodesic'
    p: float = 2.0
    # 'sinkhorn' | 'sinkhorn_div' | 'sinkhorn_fast' | 'ssw' | 'exact' |
    # 'auction' | 'hybrid' (annealed-Sinkhorn duals + auction, exact)
    solver: str = "sinkhorn"
    eps: float = 5e-3
    num_iters: int = 50
    num_scales: int = 4
    num_projections: int = 100  # ssw only
    reduce: str = "mean"        # batch reduction: 'mean' (ref) | 'sum' | 'none'


def make_transport(cfg: TransportConfig) -> Callable:
    """Returns w(x, y, key=None) -> scalar (or (B,) if reduce='none').

    x, y: (B, N, 3) / (B, M, 3) (or unbatched (N, 3)). Matches the reference
    convention: per-item W = (OT cost)^(1/p), then batch mean.
    """

    def reduce(v):
        if cfg.reduce == "mean":
            return jnp.mean(v)
        if cfg.reduce == "sum":
            return jnp.sum(v)
        return v

    if cfg.solver == "ssw":
        def w(x, y, key=None):
            if key is None:
                key = jax.random.PRNGKey(0)
            batched = x.ndim == 3
            frames = stiefel_frames(key, cfg.num_projections, x.shape[-1])
            val = sliced_cost_sphere(x, y, frames, p=cfg.p) ** (1.0 / cfg.p)
            return reduce(val) if batched else val
        return w

    def w(x, y, key=None):
        batched = x.ndim == 3
        if cfg.solver == "sinkhorn":
            # dispatches to the fused Pallas kernel on TPU (cost matrix +
            # all eps-scaled iterations VMEM-resident), XLA elsewhere
            xb = x if batched else x[None]
            yb = y if batched else y[None]
            val = emd2_points(xb, yb, cfg.cost, cfg.p, eps=cfg.eps,
                              num_iters=cfg.num_iters,
                              num_scales=cfg.num_scales)
            if not batched:
                val = val[0]
            val = jnp.maximum(val, 1e-30) ** (1.0 / cfg.p)
            return reduce(val) if batched else val
        if cfg.solver == "sinkhorn_div":
            from ..ops.sinkhorn import sinkhorn_divergence_cost
            val = sinkhorn_divergence_cost(
                build_cost(x, y, cfg.cost, cfg.p),
                build_cost(x, x, cfg.cost, cfg.p),
                build_cost(y, y, cfg.cost, cfg.p),
                eps=cfg.eps, num_iters=cfg.num_iters,
                num_scales=cfg.num_scales)
            val = jnp.maximum(val, 1e-30) ** (1.0 / cfg.p)
            return reduce(val) if batched else val
        c = build_cost(x, y, cfg.cost, cfg.p)
        if not batched:
            c = c[None]
        if cfg.solver == "sinkhorn_fast":
            val, _, _ = sinkhorn_log(c, eps=cfg.eps, num_iters=cfg.num_iters)
        elif cfg.solver == "exact":
            # host-callback network simplex / JV assignment, plan-VJP —
            # the reference's exact-EMD semantics (parity mode)
            from ..ops.emd_exact import emd2_exact_jax
            val = emd2_exact_jax(c)
        elif cfg.solver == "auction":
            # on-device exact assignment (equal sizes): eps-scaled auction
            from ..ops.auction import auction_emd2
            val = auction_emd2(c, 1e-7)
        elif cfg.solver == "hybrid":
            # on-device exact: annealed-Sinkhorn duals + warm-started
            # auction — the flagship's exact-EMD path on TPU; the cfg
            # Sinkhorn schedule controls the dual warm-up depth
            from ..ops.auction import hybrid_emd2
            val = hybrid_emd2(c, 1e-7, cfg.eps, cfg.num_iters,
                              cfg.num_scales)
        else:
            raise ValueError(f"unknown solver {cfg.solver!r}")
        if not batched:
            val = val[0]
        val = jnp.maximum(val, 1e-30) ** (1.0 / cfg.p)
        return reduce(val) if batched else val

    return w


# NOTE: a persistent-dual exact solver ('hybrid_warm', carrying auction
# prices across calls) was built and measured in rounds 2-3 and REMOVED:
# it lost to the cold hybrid path in both its candidate regimes — 43 vs
# 21 ms/iter under adversarial phi drift and 89 vs 10 ms/iter even with a
# frozen phi (benchmarks/warm_timing.json) — because the CS-repair phases
# at tight eps cost more sweeps than a fresh annealed warm-up saves.
