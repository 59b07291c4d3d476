"""The adversarial Sphere-Homeomorphic Wasserstein Distance (SHWD).

Functional, fully-jittable rebuild of the reference's
``max_cos_disimilarity_wassersten_distance`` (s2_wasserstein.py:211-262) and
its legacy variants (max_spherical_w_cos_with_regulation.py:795-1004):

    SHWD(X, Y) = max_phi  W_p(phi(X), phi(Y))
                 s.t. phi(X), phi(Y) ~ on S^2  (L1 sphere regularizer)

Per call (train mode): ``max_iter`` inner ascent steps on phi against
*detached* clouds — each step is one ``lax.scan`` iteration carrying
(phi params, phi opt state, spectral-norm state) — then a final forward with
gradients flowing to X and Y. The whole thing compiles to a single XLA
program; the reference instead runs Python-loop autograd with a per-item CPU
EMD inside (SURVEY.md §3.1 hot-loop analysis).

Variant capabilities (SURVEY.md §2.1 'legacy regulated-max' row), all config
flags rather than separate classes:
- ``lam_decay``    lambda <- 0.999 * lambda after each train call (:846, :913)
- ``early_stop``   skip inner optimization after N strikes (:795-855)
- ``refresh``      re-initialize phi from a fresh key every call (:931-1004)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..flows.base import FlowChain
from .transport import TransportConfig, make_transport


@dataclasses.dataclass(frozen=True)
class SHWDConfig:
    transport: TransportConfig = TransportConfig(cost="lp", p=2.0)
    max_iter: int = 1
    lam: float = 0.1
    phi_lr: float = 1e-3
    phi_weight_decay: float = 0.0
    phi_b1: float = 0.9
    phi_b2: float = 0.999
    lam_decay: float = 1.0          # 0.999 reproduces the legacy decay variant
    early_stop_strikes: int = 0     # >0 enables early-stop gating
    refresh: bool = False
    power_iter_per_step: int = 1    # spectral-norm refresh cadence (0 = frozen,
                                    # the reference's effective behaviour)


class SHWDState(NamedTuple):
    """Everything the criterion carries across calls (the reference keeps this
    as module/optimizer mutable state: phi, phi_op, lam, early-stop count)."""
    phi_params: Any
    phi_state: Any
    opt_state: Any
    lam: jax.Array
    strikes: jax.Array        # early-stop counter
    key: jax.Array            # for refresh / ssw projections


def sphere_regularizer(x: jax.Array) -> jax.Array:
    """sum | ||x|| - 1 | / (B * N) — reference :224-232, :248-250."""
    norms = jnp.linalg.norm(x, axis=-1)
    return jnp.sum(jnp.abs(norms - 1.0)) / norms.size


class SHWDLoss:
    """Callable criterion; state explicit. Usage:

        flow = make_flow("Residual", 3)
        crit = SHWDLoss(flow, SHWDConfig(...))
        state = crit.init(key)
        (loss, sphere_x, sphere_y), state = crit.apply(state, x, y, train=True)
    """

    def __init__(self, flow: FlowChain, cfg: SHWDConfig = SHWDConfig()):
        self.flow = flow
        self.cfg = cfg
        self.transport = make_transport(cfg.transport)
        # hybrid exact-EMD solver: the inner-ascent solve and the final
        # forward see the same clouds through phi one Adam step apart, so
        # the second solve warm-restarts from the first's matching+duals
        # (293 vs 1687 auction sweeps at the flagship config, identical
        # values — ops/auction.py::hybrid_assignment_warm)
        self._warm_hybrid = cfg.transport.solver == "hybrid"
        # coupled-L2 Adam, matching torch.optim.Adam(weight_decay=...) —
        # the reference's phi_op (train_W_COS.py:392, flow notebooks cell 6)
        from ..utils.optim import torch_adam
        self.opt = torch_adam(cfg.phi_lr, cfg.phi_weight_decay,
                              b1=cfg.phi_b1, b2=cfg.phi_b2)

    def _transport_warm(self, sx, sy, warm):
        """Hybrid-solver transport with warm matching threading. Value and
        batch-mean reduction match make_transport's hybrid branch exactly;
        the envelope gradient (plan/N) arises from differentiating the
        gather at the stop-gradiented optimal permutation."""
        import jax.numpy as jnp

        from ..ops import cost_matrix as build_cost
        from ..ops.auction import hybrid_assignment_warm

        tp = self.cfg.transport
        batched = sx.ndim == 3
        if not batched:
            sx, sy = sx[None], sy[None]
        c = build_cost(sx, sy, tp.cost, tp.p)
        assign_value, assign, prices, _ = hybrid_assignment_warm(
            c, warm[0], warm[1], eps_final=1e-7, sink_eps=tp.eps,
            sink_iters=tp.num_iters, sink_scales=tp.num_scales)
        val = jnp.take_along_axis(
            c, assign_value[..., None].astype(jnp.int32), axis=-1)[..., 0]
        val = jnp.mean(val, axis=-1)
        val = jnp.maximum(val, 1e-30) ** (1.0 / tp.p)
        if tp.reduce == "mean":
            val = jnp.mean(val)
        elif tp.reduce == "sum":
            val = jnp.sum(val)
        return val, (assign, jax.lax.stop_gradient(prices))

    def init(self, key: jax.Array, x: Optional[jax.Array] = None,
             y: Optional[jax.Array] = None) -> SHWDState:
        """``x``/``y`` are accepted (and ignored) for call-site stability."""
        k_flow, k_carry = jax.random.split(key)
        params, fstate = self.flow.init(k_flow)
        return SHWDState(
            phi_params=params,
            phi_state=fstate,
            opt_state=self.opt.init(params),
            lam=jnp.asarray(self.cfg.lam, jnp.float32),
            strikes=jnp.zeros((), jnp.int32),
            key=k_carry,
        )

    # -- internals ---------------------------------------------------------

    def _flow_pair(self, params, fstate, x, y):
        """One batched flow forward over both clouds (concat along the point
        axis) — halves the dispatch count of the many small MLP ops vs two
        separate chains; the flow is per-point so the split is exact."""
        n = x.shape[-2]
        s = self.flow(params, fstate, jnp.concatenate([x, y], axis=-2))
        return s[..., :n, :], s[..., n:, :]

    def _inner_objective(self, params, fstate, x, y, lam, key, warm=None):
        """phi's ascent objective: lam * reg - W (minimized => W maximized).

        Returns (objective, new_warm); ``new_warm`` is the hybrid solver's
        matching state (passed through unchanged for other solvers)."""
        sx, sy = self._flow_pair(params, fstate, x, y)
        if self._warm_hybrid and warm is not None:
            w, warm = self._transport_warm(sx, sy, warm)
        else:
            w = self.transport(sx, sy, key)
        reg = lam * (sphere_regularizer(sx) + sphere_regularizer(sy))
        return reg - w, warm

    def _warm_sentinel(self, x):
        from ..ops.auction import hybrid_warm_sentinel
        b = x.shape[0] if x.ndim == 3 else 1
        return hybrid_warm_sentinel(b, x.shape[-2], x.dtype)

    def _inner_scan(self, state: SHWDState, x, y):
        """max_iter adversarial steps on detached clouds via lax.scan."""
        xd = jax.lax.stop_gradient(x)
        yd = jax.lax.stop_gradient(y)
        cfg = self.cfg

        def step(carry, key):
            params, fstate, opt_state, warm = carry
            grads, warm = jax.grad(self._inner_objective, has_aux=True)(
                params, fstate, xd, yd, state.lam, key,
                warm)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if cfg.power_iter_per_step > 0:
                fstate = self.flow.update_state(params, fstate,
                                                cfg.power_iter_per_step)
            return (params, fstate, opt_state, warm), None

        keys = jax.random.split(state.key, cfg.max_iter + 1)
        warm0 = self._warm_sentinel(x) if self._warm_hybrid else None
        carry = (state.phi_params, state.phi_state, state.opt_state, warm0)
        carry, _ = jax.lax.scan(step, carry, keys[:-1])
        return carry, keys[-1]

    # -- public ------------------------------------------------------------

    def apply(self, state: SHWDState, x: jax.Array, y: jax.Array,
              train: bool = True):
        """Returns ((w, sphere_x, sphere_y), new_state).

        ``train`` is a static Python bool (jit with static_argnums or two
        jitted wrappers), matching the reference's train/test string switch
        (:239-257).
        """
        cfg = self.cfg
        if train:
            if cfg.refresh:
                k_re, k_use = jax.random.split(state.key)
                params, fstate = self.flow.init(k_re)
                state = state._replace(phi_params=params, phi_state=fstate,
                                       opt_state=self.opt.init(params),
                                       key=k_use)
            if cfg.early_stop_strikes > 0:
                # run the inner loop only while strikes are below the limit;
                # lax.cond executes a single branch at runtime, so once the
                # strike limit is hit the inner adversarial work is actually
                # SKIPPED (the reference's point: regulation.py:795-855), not
                # computed-and-discarded.
                def _run(_):
                    return self._inner_scan(state, x, y)

                def _skip(_):
                    keys = jax.random.split(state.key, cfg.max_iter + 1)
                    warm0 = (self._warm_sentinel(x) if self._warm_hybrid
                             else None)
                    return ((state.phi_params, state.phi_state,
                             state.opt_state, warm0), keys[-1])

                go = state.strikes <= cfg.early_stop_strikes
                (params, fstate, opt_state, warm), key = jax.lax.cond(
                    go, _run, _skip, None)
            else:
                ((params, fstate, opt_state, warm),
                 key) = self._inner_scan(state, x, y)
            lam = state.lam * cfg.lam_decay
            state = SHWDState(params, fstate, opt_state, lam,
                              state.strikes, key)
        else:
            warm = self._warm_sentinel(x) if self._warm_hybrid else None
        # final (undetached) forward — gradient path to x and y; the hybrid
        # solver warm-restarts from the inner step's matching (train mode)
        k_final, k_next = jax.random.split(state.key)
        sx, sy = self._flow_pair(state.phi_params, state.phi_state, x, y)
        if self._warm_hybrid:
            w, _ = self._transport_warm(sx, sy, warm)
        else:
            w = self.transport(sx, sy, k_final)
        state = state._replace(key=k_next)
        return (w, sx, sy), state

    def add_strike(self, state: SHWDState) -> SHWDState:
        """Trainer hook for the early-stop variant: count a non-improving
        epoch (the reference increments its counter outside the loss)."""
        return state._replace(strikes=state.strikes + 1)
