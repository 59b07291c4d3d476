"""Quaternion / SE(3) kernels.

TPU-native (pure jnp, jit/vmap-friendly) equivalents of the reference's pose
math in ``Point_Cloud_Resistration/data_utils/Data_set_maker.py:25-102`` (qmul,
qrot, euler_to_quaternion) and ``:174-219`` (pose-7d create / rotate /
transform / 4x4 compose), plus the rotation/translation error metrics of
``train_W_COS.py:78-85`` re-derived in closed form (no transforms3d).

Conventions match the reference: quaternions are (w, x, y, z); a pose-7d is
``[quat(4), translation(3)]`` with the quaternion normalized on use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qmul(q: jax.Array, r: jax.Array) -> jax.Array:
    """Hamilton product of quaternion arrays, broadcasting over leading dims.

    Matches ``Data_set_maker.py:25-38`` (result = r applied after q under the
    reference's outer-product formulation).
    """
    w1, x1, y1, z1 = jnp.moveaxis(q, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(r, -1, 0)
    # Hamilton product q (x) r — same as the reference's terms[] expansion.
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return jnp.stack([w, x, y, z], axis=-1)


def qrot(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by quaternions q (..., 4), broadcasting.

    Rodrigues-via-cross-product form, as in ``Data_set_maker.py:40-52``.
    """
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def euler_to_quaternion(e: jax.Array, order: str = "xyz") -> jax.Array:
    """Euler angles (..., 3) -> quaternion (..., 4).

    Mirrors ``Data_set_maker.py:59-102`` including the final antipodal sign
    flip for right-handed orders.
    """
    x, y, z = jnp.moveaxis(e, -1, 0)
    zeros = jnp.zeros_like(x)
    comp = {
        "x": jnp.stack([jnp.cos(x / 2), jnp.sin(x / 2), zeros, zeros], axis=-1),
        "y": jnp.stack([jnp.cos(y / 2), zeros, jnp.sin(y / 2), zeros], axis=-1),
        "z": jnp.stack([jnp.cos(z / 2), zeros, zeros, jnp.sin(z / 2)], axis=-1),
    }
    result = comp[order[0]]
    for axis in order[1:]:
        result = qmul(result, comp[axis])
    if order in ("xyz", "yzx", "zxy"):
        result = -result
    return result


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# pose-7d helpers (quat + translation), reference Data_set_maker.py:174-219
# ---------------------------------------------------------------------------

def create_pose_7d(vec: jax.Array) -> jax.Array:
    """Normalize the quaternion part of a raw (..., 7) pose vector."""
    quat = vec[..., :4]
    quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
    return jnp.concatenate([quat, vec[..., 4:]], axis=-1)


def pose_quaternion(pose_7d: jax.Array) -> jax.Array:
    return pose_7d[..., :4]


def pose_translation(pose_7d: jax.Array) -> jax.Array:
    return pose_7d[..., 4:]


def quaternion_rotate(points: jax.Array, pose_7d: jax.Array) -> jax.Array:
    """Rotate (..., N, 3) points by the quaternion of (..., 7) pose."""
    quat = pose_quaternion(pose_7d)[..., None, :]
    return qrot(jnp.broadcast_to(quat, points.shape[:-1] + (4,)), points)


def quaternion_transform(points: jax.Array, pose_7d: jax.Array) -> jax.Array:
    """Apply full rigid transform: R*p + t (reference :210-212)."""
    return quaternion_rotate(points, pose_7d) + pose_translation(pose_7d)[..., None, :]


def convert2transformation(rot: jax.Array, trans: jax.Array) -> jax.Array:
    """(B,3,3) rotation + (B,1,3) translation -> (B,4,4) homogeneous matrix.

    Reference ``Data_set_maker.py:214-219``.
    """
    batch = rot.shape[0]
    top = jnp.concatenate([rot, jnp.swapaxes(trans, -1, -2)], axis=-1)  # (B,3,4)
    bottom = jnp.broadcast_to(
        jnp.array([[[0.0, 0.0, 0.0, 1.0]]], dtype=rot.dtype), (batch, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# error metrics (reference train_W_COS.py:78-85 / test_ERROR.py:66-88)
# ---------------------------------------------------------------------------

def rotation_error_deg(rot: jax.Array, est_rot: jax.Array) -> jax.Array:
    """|axis-angle(R @ R_hat)| in degrees, batched over leading dims.

    The reference composes ``rotation @ est_rotation`` and extracts the angle
    with transforms3d. Here the angle uses the atan2 form
    ``atan2(||skew(E)||, (tr(E) - 1) / 2)`` which is numerically robust at
    small angles and on TPU (arccos alone loses ~0.1 deg near cos ~ 1 with
    the TPU's transcendental approximations).
    """
    err = jnp.einsum("...ij,...jk->...ik", rot, est_rot)
    tr = jnp.trace(err, axis1=-2, axis2=-1)
    cos = (tr - 1.0) / 2.0
    axis = jnp.stack([
        err[..., 2, 1] - err[..., 1, 2],
        err[..., 0, 2] - err[..., 2, 0],
        err[..., 1, 0] - err[..., 0, 1],
    ], axis=-1)
    sin = jnp.linalg.norm(axis, axis=-1) / 2.0
    return jnp.abs(jnp.degrees(jnp.arctan2(sin, cos)))


def translation_error(rot: jax.Array, trans: jax.Array, est_trans: jax.Array) -> jax.Array:
    """L2 of (-R^T t - t_hat), batched (reference :80-81).

    ``trans``/``est_trans`` have shape (..., 3) (or (..., 1, 3) squeezed by
    caller).
    """
    target = -jnp.einsum("...ji,...j->...i", rot, trans)
    return jnp.sqrt(jnp.sum(jnp.square(target - est_trans), axis=-1))
