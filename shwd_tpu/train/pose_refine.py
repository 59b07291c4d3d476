"""Distributed pose refinement — bundle adjustment over object batches.

The north-star capability beyond the reference (BASELINE.md: "a distributed
pose refinement stage analogous to bundle adjustment over object batches"):
given B (source, target) cloud pairs, optimize a per-object SE(3) pose
directly — Adam on a raw 7-vector (quaternion + translation), the same
parameterization PCRNet regresses (models/pcrnet.py; reference
``create_pose_7d``) — against a differentiable cloud distance.

Design:
- one jitted program: ``lax.scan`` over Adam steps, each step = transform
  all B clouds + per-object loss + per-object gradients. Objects are
  independent (the loss SUMS over the batch, so gradients never mix), which
  makes the stage embarrassingly parallel over the mesh ``data`` axis: shard
  the batch, GSPMD runs every shard locally, no collectives in the loop.
- loss is pluggable: per-object Chamfer (default — the classic ICP-style
  refinement objective), spherical sliced-W, or fused-Sinkhorn EMD.
- composes with the learned registration model: seed ``init_pose`` from
  PCRNet's estimate and polish it (coarse net + fine refinement).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.chamfer import chamfer_directional
from ..ops.quaternion import (
    create_pose_7d, pose_translation, quat_to_matrix, quaternion_transform,
)
from ..ops.sinkhorn_pallas import emd2_points
from ..ops.spherical import sliced_cost_sphere, stiefel_frames


@dataclasses.dataclass(frozen=True)
class PoseRefineConfig:
    loss: str = "cd"            # 'cd' | 'ssw' | 'sinkhorn'
    num_steps: int = 100
    lr: float = 0.01
    p: float = 2.0
    num_projections: int = 64   # ssw
    eps: float = 5e-3           # sinkhorn
    num_iters: int = 30
    num_scales: int = 3


class PoseRefineResult(NamedTuple):
    pose_7d: jax.Array          # (B, 7) normalized quaternion + translation
    est_R: jax.Array            # (B, 3, 3)
    est_t: jax.Array            # (B, 3)
    losses: jax.Array           # (num_steps,) summed objective trace
    per_object_loss: jax.Array  # (B,) final per-object loss


_IDENTITY_POSE = jnp.asarray([1.0, 0, 0, 0, 0, 0, 0])


def _per_object_loss(cfg: PoseRefineConfig, moved, target, key):
    if cfg.loss == "cd":
        return (chamfer_directional(moved, target)
                + chamfer_directional(target, moved))
    if cfg.loss == "ssw":
        frames = stiefel_frames(key, cfg.num_projections, moved.shape[-1])
        return sliced_cost_sphere(moved, target, frames, p=cfg.p)
    if cfg.loss == "sinkhorn":
        return emd2_points(moved, target, "lp", cfg.p, eps=cfg.eps,
                           num_iters=cfg.num_iters,
                           num_scales=cfg.num_scales)
    raise ValueError(f"unknown refine loss {cfg.loss!r}")


def refine_poses(source: jax.Array, target: jax.Array,
                 cfg: PoseRefineConfig = PoseRefineConfig(),
                 key: Optional[jax.Array] = None,
                 init_pose: Optional[jax.Array] = None) -> PoseRefineResult:
    """Optimize per-object poses aligning source -> target.

    source: (B, N, 3), target: (B, M, 3). ``init_pose``: optional (B, 7) raw
    pose (e.g. PCRNet output) — identity by default. Fully jittable; shard
    the batch over the mesh 'data' axis for multi-chip refinement (objects
    never interact).
    """
    b = source.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    if init_pose is None:
        init_pose = jnp.broadcast_to(_IDENTITY_POSE, (b, 7))
    opt = optax.adam(cfg.lr)

    def objective(raw, k):
        pose = create_pose_7d(raw)
        moved = quaternion_transform(source, pose)
        per_obj = _per_object_loss(cfg, moved, target, k)
        return jnp.sum(per_obj), per_obj

    def step(carry, k):
        raw, opt_state = carry
        (total, _), grads = jax.value_and_grad(objective, has_aux=True)(raw, k)
        updates, opt_state = opt.update(grads, opt_state)
        raw = optax.apply_updates(raw, updates)
        return (raw, opt_state), total

    keys = jax.random.split(key, cfg.num_steps + 1)
    (raw, _), losses = jax.lax.scan(
        step, (init_pose, opt.init(init_pose)), keys[:-1])

    pose = create_pose_7d(raw)
    _, per_obj = objective(raw, keys[-1])
    return PoseRefineResult(
        pose_7d=pose,
        est_R=quat_to_matrix(pose[..., :4]),
        est_t=pose_translation(pose),
        losses=losses,
        per_object_loss=per_obj,
    )


def refine_model_output(source: jax.Array, target: jax.Array,
                        est_R: jax.Array, est_t: jax.Array,
                        cfg: PoseRefineConfig = PoseRefineConfig(),
                        key: Optional[jax.Array] = None) -> PoseRefineResult:
    """Polish a learned registration estimate (coarse-to-fine).

    Takes PCRNet's (est_R (B,3,3), est_t (B,1,3) or (B,3)) and refines from
    there. The rotation is converted to a quaternion init via the standard
    Shepperd branch-free form.
    """
    r = est_R
    t = est_t.reshape(est_t.shape[0], 3)
    # rotation matrix -> quaternion (w, x, y, z), numerically safe branchless
    m00, m11, m22 = r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]
    w = jnp.sqrt(jnp.maximum(1.0 + m00 + m11 + m22, 1e-12)) / 2.0
    x = (r[..., 2, 1] - r[..., 1, 2]) / jnp.maximum(4.0 * w, 1e-8)
    y = (r[..., 0, 2] - r[..., 2, 0]) / jnp.maximum(4.0 * w, 1e-8)
    z = (r[..., 1, 0] - r[..., 0, 1]) / jnp.maximum(4.0 * w, 1e-8)
    init = jnp.concatenate([jnp.stack([w, x, y, z], -1), t], axis=-1)
    return refine_poses(source, target, cfg, key, init_pose=init)
