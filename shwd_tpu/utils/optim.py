"""Optimizer builders matching the reference's torch semantics.

``torch.optim.Adam(weight_decay=wd)`` folds the L2 penalty into the gradient
BEFORE the adaptive rescaling (coupled L2), which is materially different
from optax.adamw's decoupled decay at the reference's wd = 0.1 — measured to
change the late-phase dynamics of the adversarial phi (the decoupled form
shrinks phi too aggressively once gradients are small, destabilizing the
converged flow). Every reference optimizer (``train_W_COS.py:374,392``,
flow notebooks cell 6) is this coupled form.
"""

from __future__ import annotations

import optax


def torch_adam(lr: float, weight_decay: float = 0.0, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: grad += wd * w, then Adam scaling."""
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    steps.append(optax.scale(-lr))
    return optax.chain(*steps)
