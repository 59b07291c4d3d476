"""Wasserstein gradient flow: deform a point cloud to minimize a distance.

TPU-native rebuild of the flow notebooks' experiment loop
(``Wasserstein_flow_problem/Flow_cube.ipynb`` cell 8): the evolving cloud's
coordinates are the parameters, Adam descends the chosen distance toward a
fixed target, exact W2 (or Chamfer, for the ``_CD_metric`` twins) is recorded
every ``eval_interval`` iterations.

TPU design: the *entire* flow step — distance (including SHWD's inner
adversarial phi update) + Adam on the coordinates — is one jitted function,
scanned ``eval_interval`` steps at a time; only the cheap eval metric leaves
the device. The reference pays ~0.69 s per SHWD step on CPU
(BASELINE.md); this loop is the benchmark that must beat it by >=10x.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..flows import make_flow
from ..losses.shwd import SHWDConfig, SHWDLoss
from ..losses.transport import TransportConfig
from ..losses import sliced_zoo
from ..ops.chamfer import chamfer
from ..ops.spherical import sliced_wasserstein_sphere


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    # SHWD | SWD | MSWD | SSWD | SSWD_W1 | ASWD | DSWD | CD | W2 |
    # GSWD_POLY | GSWD_POLY3 | MGSWD_POLY | GSWD_CIRC | MGSWD_CIRC |
    # GSW_NN | MGSW_NN      (the notebooks' full method zoo, cell 6)
    method: str = "SHWD"
    num_iterations: int = 400
    eval_interval: int = 5
    lr: float = 0.01
    num_projections: int = 100
    # SHWD knobs (notebook cell 6 params)
    shwd_layers: int = 5
    shwd_lam: float = 0.1
    shwd_max_iter: int = 1
    shwd_phi_lr: float = 0.001
    shwd_phi_wd: float = 0.1
    shwd_solver: str = "sinkhorn"  # EMD surrogate used inside SHWD
    # deep-annealed Sinkhorn reaches exact-EMD accuracy (<0.3% rel at
    # eps=1e-5 across the whole convergence range, measured vs the native
    # network simplex); anything coarser stalls the flow ~100x above the
    # reference's fixed point
    shwd_eps: float = 1e-5
    shwd_num_iters: int = 150
    shwd_num_scales: int = 10
    # hybrid dual warm-up: the auction makes the permutation
    # exact regardless, so this Sinkhorn stage only controls auction sweep
    # counts. Round-3 frontier sweep on the 400-iter cube flow (identical
    # trajectories throughout): 40x8 = 14.7 ms/iter beats 50x8 (15.7),
    # 100x8 (20.6), 150x10 (31.5); dropping SCALES is what blows up —
    # 50x4 costs 33.6 ms and 25x4 over 1 s/iter in auction sweeps.
    hybrid_warmup_iters: int = 40
    hybrid_warmup_scales: int = 8
    eval_metric: str = "w2"        # 'w2' exact EMD | 'cd' chamfer
    # cosine-decay the point LR to lr * lr_decay_alpha over the run
    # (1.0 = constant LR, the notebooks' setting)
    lr_decay_alpha: float = 1.0
    seed: int = 0


@dataclasses.dataclass
class FlowResult:
    clouds: np.ndarray             # final evolved cloud
    eval_values: np.ndarray        # metric every eval_interval iters
    eval_iters: np.ndarray
    interval_seconds: np.ndarray   # wall time per reporting interval
    steps_per_second: float
    flops_per_step: float = float("nan")  # analytic (XLA cost analysis)


def _make_point_opt(cfg: FlowConfig):
    if cfg.lr_decay_alpha < 1.0:
        sched = optax.cosine_decay_schedule(cfg.lr, cfg.num_iterations,
                                            alpha=cfg.lr_decay_alpha)
        return optax.adam(sched, b1=0.9, b2=0.999)
    return optax.adam(cfg.lr, b1=0.9, b2=0.999)


def _make_loss_step(cfg: FlowConfig):
    """Returns (init_state, step(points, state, key) -> (points, state, loss))."""
    opt = _make_point_opt(cfg)

    if cfg.method == "SHWD":
        flow = make_flow("Residual", cfg.shwd_layers)
        hybrid = cfg.shwd_solver == "hybrid"
        crit = SHWDLoss(flow, SHWDConfig(
            transport=TransportConfig(cost="lp", p=2.0, solver=cfg.shwd_solver,
                                      eps=cfg.shwd_eps,
                                      num_iters=cfg.hybrid_warmup_iters
                                      if hybrid else cfg.shwd_num_iters,
                                      num_scales=cfg.hybrid_warmup_scales
                                      if hybrid else cfg.shwd_num_scales,
                                      num_projections=cfg.num_projections),
            max_iter=cfg.shwd_max_iter, lam=cfg.shwd_lam,
            phi_lr=cfg.shwd_phi_lr, phi_weight_decay=cfg.shwd_phi_wd))

        def init_state(key, source=None, target=None):
            return {"opt": opt.init(jnp.zeros((1, 3))),
                    "crit": crit.init(key, source, target)}

        def step(points, target, state, key):
            def loss_fn(pts):
                (w, _, _), new_crit = crit.apply(state["crit"], pts[None],
                                                 target[None], train=True)
                return w, new_crit

            (loss, new_crit), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(points)
            updates, new_opt = opt.update(grads, state["opt"])
            return (optax.apply_updates(points, updates),
                    {"opt": new_opt, "crit": new_crit}, loss)

        return init_state, step

    def plain_loss(pts, target, key):
        L = cfg.num_projections
        if cfg.method == "SWD":
            return sliced_zoo.sliced_wasserstein_distance(key, pts, target, L)
        if cfg.method == "MSWD":
            return sliced_zoo.max_sliced_wasserstein_distance(key, pts, target)
        if cfg.method == "SSWD":
            return sliced_wasserstein_sphere(key, pts, target, L, p=2)
        if cfg.method == "SSWD_W1":
            return sliced_wasserstein_sphere(key, pts, target, L, p=1)
        if cfg.method == "CD":
            return chamfer(pts[None], target[None])
        if cfg.method == "W2":
            # the notebooks' exact-EMD flow method, the TPU way: eps-scaled
            # log-Sinkhorn converging to the exact plan (differentiable)
            from ..ops.costs import cost_matrix
            from ..ops.sinkhorn import emd2_approx
            c = cost_matrix(pts[None], target[None], "lp", 2.0)
            return emd2_approx(c, eps=5e-3, num_iters=50, num_scales=4)[0]
        if cfg.method == "GSWD_POLY":
            return sliced_zoo.gswd_polynomial(key, pts, target, L, degree=5)
        if cfg.method == "GSWD_POLY3":
            return sliced_zoo.gswd_polynomial3_2d(key, pts, target, L)
        if cfg.method == "MGSWD_POLY":
            return sliced_zoo.max_gswd_polynomial(key, pts, target, degree=3)
        if cfg.method == "GSWD_CIRC":
            return sliced_zoo.gswd_circular(key, pts, target, L)
        if cfg.method == "MGSWD_CIRC":
            return sliced_zoo.max_gswd_circular(key, pts, target)
        raise ValueError(f"unknown flow method {cfg.method!r}")

    # methods with a persistent adversarial/learned state (notebook keeps the
    # Mapping / TransformNet / defining-MLP alive across flow iterations)
    stateful = {
        "ASWD": (
            lambda k: sliced_zoo.init_mapping(k, 3),
            lambda key, pts, target, phi: (
                sliced_zoo.augmented_sliced_wasserstein_distance(
                    key, pts, target, phi,
                    num_projections=cfg.num_projections, max_iter=10,
                    lam=0.05 / jnp.mean(jnp.abs(target))))),
        "DSWD": (
            lambda k: sliced_zoo.init_transform_net(k, 3),
            lambda key, pts, target, phi: (
                sliced_zoo.distributional_sliced_wasserstein_distance(
                    key, pts, target, phi,
                    num_projections=cfg.num_projections, max_iter=10))),
        "GSW_NN": (
            lambda k: sliced_zoo.init_gsw_mlp(k, 3),
            lambda key, pts, target, phi: (
                sliced_zoo.gsw_nn(pts, target, phi), phi)),
        "MGSW_NN": (
            lambda k: sliced_zoo.init_gsw_mlp(k, 3),
            lambda key, pts, target, phi: (
                sliced_zoo.max_gsw_nn(pts, target, phi, max_iter=10))),
    }
    if cfg.method in stateful:
        phi_init, phi_loss = stateful[cfg.method]

        def init_state(key, source=None, target=None):
            return {"opt": opt.init(jnp.zeros((1, 3))), "phi": phi_init(key)}

        def step(points, target, state, key):
            def loss_fn(pts):
                return phi_loss(key, pts, target, state["phi"])

            (loss, new_phi), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(points)
            updates, new_opt = opt.update(grads, state["opt"])
            return (optax.apply_updates(points, updates),
                    {"opt": new_opt, "phi": new_phi}, loss)

        return init_state, step

    def init_state(key, source=None, target=None):
        return {"opt": opt.init(jnp.zeros((1, 3)))}

    def step(points, target, state, key):
        loss, grads = jax.value_and_grad(
            lambda pts: plain_loss(pts, target, key))(points)
        updates, new_opt = opt.update(grads, state["opt"])
        return optax.apply_updates(points, updates), {"opt": new_opt}, loss

    return init_state, step


def run_flow(source: jax.Array, target: jax.Array, cfg: FlowConfig,
             eval_fn: Optional[Callable] = None, verbose: bool = False
             ) -> FlowResult:
    """Evolve ``source`` toward ``target``; record eval metric per interval.

    ``eval_fn(points, target) -> float`` defaults to exact W2 via the native
    network-simplex (notebook parity) or Chamfer for eval_metric='cd'.
    """
    if eval_fn is None:
        if cfg.eval_metric == "cd":
            def eval_fn(p, t):
                return float(chamfer(jnp.asarray(p)[None], jnp.asarray(t)[None]))
        else:
            from ..ops.emd_exact import w2_exact
            eval_fn = w2_exact

    init_state, step = _make_loss_step(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    k_init, key = jax.random.split(key)
    state = init_state(k_init, jnp.asarray(source), jnp.asarray(target))
    # re-init opt state with real shapes
    state["opt"] = _make_point_opt(cfg).init(jnp.asarray(source))

    def interval(points, state, key):
        """eval_interval jitted steps under one lax.scan."""
        keys = jax.random.split(key, cfg.eval_interval)

        def body(carry, k):
            pts, st = carry
            pts, st, loss = step(pts, target, st, k)
            return (pts, st), loss

        (points, state), losses = jax.lax.scan(body, (points, state), keys)
        return points, state, losses

    interval_jit = jax.jit(interval)

    points = jnp.asarray(source)
    evals = [eval_fn(np.asarray(points), np.asarray(target))]
    iters = [0]
    times = []
    n_intervals = cfg.num_iterations // cfg.eval_interval
    # warm-up compile outside the timed region
    _ = jax.block_until_ready(interval_jit(points, state, key)[0])
    from ..utils.profiling import compiled_flops
    flops_step = compiled_flops(interval_jit, points, state, key) \
        / cfg.eval_interval
    for it in range(n_intervals):
        key, k_int = jax.random.split(key)
        t0 = time.perf_counter()
        points, state, losses = interval_jit(points, state, k_int)
        jax.block_until_ready(points)
        times.append(time.perf_counter() - t0)
        metric = eval_fn(np.asarray(points), np.asarray(target))
        evals.append(metric)
        iters.append((it + 1) * cfg.eval_interval)
        if verbose:
            print(f"iter {iters[-1]:5d}  {cfg.eval_metric}={metric:.6f}  "
                  f"interval={times[-1]*1000:.1f} ms")

    times_arr = np.asarray(times)
    return FlowResult(
        clouds=np.asarray(points),
        eval_values=np.asarray(evals),
        eval_iters=np.asarray(iters),
        interval_seconds=times_arr,
        steps_per_second=cfg.eval_interval / max(times_arr.mean(), 1e-12),
        flops_per_step=flops_step,
    )
