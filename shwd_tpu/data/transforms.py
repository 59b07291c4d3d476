"""Rigid-transform / noise / outlier dataset math — all on-device.

TPU-native rebuild of the reference data pipeline
(``data_utils/Data_set_maker.py`` + the ``Data_set_transformation*`` family):
every sample pairs a clean target cloud with a noisy, rigidly-transformed
source cloud plus the ground-truth pose. The reference precomputes random
SE(3) transforms in numpy per index and applies them in a torch Dataset;
here the whole batch of transforms is drawn and applied as pure jnp math —
one jitted function per epoch, no host loop.

Distribution parity (Data_set_maker.py:154-171):
- rotation: per-axis Euler angles uniform in +-angle_range deg, order "xyz";
- translation: direction uniform on the sphere (normalized cube sample),
  magnitude sqrt(max_translation);
- noise: N(mean, sigma^2) on the source only (:293-300);
- outliers (Data_set_transformation_outlier.py:197-203): replace
  ``outlier_num`` random points of the source with N(0, sigma_out^2).

Axis-restricted rotation modes reproduce the commented x/y/z-only variants
(:158-163) and the test-split builders (``Data_set_transformation_test.py``,
x-axis-only ``rot=[[max_rot,0,0]]``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.quaternion import (
    create_pose_7d, euler_to_quaternion, pose_translation, quat_to_matrix,
    quaternion_rotate,
)


@dataclasses.dataclass(frozen=True)
class TransformConfig:
    angle_range_deg: float = 45.0
    translation_range: float = 1.0
    noise_mean: float = 0.0
    noise_sigma: float = 0.02
    rotation_axes: str = "xyz"       # 'xyz' | 'x' | 'y' | 'z' (restricted modes)
    fixed_angle: bool = False        # True: angle == angle_range (test sweeps)
    outlier_num: int = 0
    outlier_sigma: float = 1.0


class RegistrationBatch(NamedTuple):
    target: jax.Array           # (B, M, 3) clean template
    source: jax.Array           # (B, N, 3) noisy, transformed source
    igt_rotation: jax.Array     # (B, 3, 3) ground-truth rotation (R^T as stored
                                # by the reference — see make_pose)
    igt_translation: jax.Array  # (B, 3)


def random_pose_7d(key: jax.Array, batch: int, cfg: TransformConfig) -> jax.Array:
    """Draw B ground-truth poses, matching create_random_transform (:154-171)."""
    k_rot, k_trans = jax.random.split(key)
    max_rot = jnp.deg2rad(cfg.angle_range_deg)
    if cfg.fixed_angle:
        euler = jnp.zeros((batch, 3))
        axis_idx = {"x": 0, "y": 1, "z": 2}[cfg.rotation_axes]
        euler = euler.at[:, axis_idx].set(max_rot)
    else:
        euler = jax.random.uniform(k_rot, (batch, 3), minval=-max_rot,
                                   maxval=max_rot)
        if cfg.rotation_axes != "xyz":
            mask = jnp.array([a in cfg.rotation_axes for a in "xyz"],
                             dtype=euler.dtype)
            euler = euler * mask
    quat = euler_to_quaternion(euler, "xyz")
    trans = jax.random.uniform(k_trans, (batch, 3), minval=-1.0, maxval=1.0)
    trans = (jnp.sqrt(cfg.translation_range)
             * trans / jnp.linalg.norm(trans, axis=-1, keepdims=True))
    return create_pose_7d(jnp.concatenate([quat, trans], axis=-1))


def apply_pose(source: jax.Array, pose_7d: jax.Array):
    """Transform (B, N, 3) source; return (transformed, igt_R, igt_t).

    igt_rotation is the applied rotation R (the reference stores
    ``quaternion_rotate(eye, igt).permute(1,0)`` == (R^T)^T == R,
    Data_set_maker.py:224); the error metric composes R @ est_R and expects
    est_R ~ R^T at convergence (train_W_COS.py:82).
    """
    transformed = (quaternion_rotate(source, pose_7d)
                   + pose_translation(pose_7d)[:, None, :])
    igt_rot = quat_to_matrix(pose_7d[..., :4])
    return transformed, igt_rot, pose_translation(pose_7d)


def make_registration_batch(key: jax.Array, target: jax.Array,
                            source: jax.Array,
                            cfg: TransformConfig) -> RegistrationBatch:
    """Full pipeline: noise source -> (optional) outliers -> rigid transform."""
    k_pose, k_noise, k_out_idx, k_out_val = jax.random.split(key, 4)
    b, n, _ = source.shape
    noisy = source + (cfg.noise_mean
                      + cfg.noise_sigma * jax.random.normal(k_noise, source.shape))
    if cfg.outlier_num > 0:
        # replace outlier_num random points per cloud with N(0, sigma_out)
        idx = jax.vmap(lambda k: jax.random.choice(
            k, n, (cfg.outlier_num,), replace=False))(
                jax.random.split(k_out_idx, b))
        vals = cfg.outlier_sigma * jax.random.normal(
            k_out_val, (b, cfg.outlier_num, 3))
        onehot = jax.nn.one_hot(idx, n, dtype=noisy.dtype)       # (B, K, N)
        mask = jnp.sum(onehot, axis=1)[..., None]                # (B, N, 1)
        replaced = jnp.einsum("bkn,bkd->bnd", onehot, vals)
        noisy = noisy * (1 - mask) + replaced
    pose = random_pose_7d(k_pose, b, cfg)
    transformed, igt_rot, igt_t = apply_pose(noisy, pose)
    return RegistrationBatch(target, transformed, igt_rot, igt_t)
