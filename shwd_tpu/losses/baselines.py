"""Baseline losses: Chamfer and Sinkhorn, with the trainer-facing signature.

Equivalents of the reference's baseline criteria:
- ``chamfer_criterion``   <-> pytorch3d ``chamfer_distance`` as wired in
  ``train_CD.py:326-328`` / ``test_ERROR.py:216``.
- ``sinkhorn_criterion``  <-> ``losses/Sinkhorn_fixed.py`` /
  Comparison ``losses/sinkhorn.py`` (log-domain, optional 1/p root).

Both return ``(loss, x, y)`` so trainers can treat every criterion uniformly
(the SHWD criteria return ``(w, sphere_x, sphere_y)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.chamfer import chamfer
from ..ops.sinkhorn import sinkhorn_loss


def chamfer_criterion(x: jax.Array, y: jax.Array):
    return chamfer(x, y), x, y


def make_sinkhorn_criterion(eps: float = 0.01, num_iters: int = 100,
                            p: float = 2, wasserstein_root: bool = False):
    def crit(x, y):
        return sinkhorn_loss(x, y, eps=eps, num_iters=num_iters, p=p,
                             wasserstein_root=wasserstein_root), x, y
    return crit
