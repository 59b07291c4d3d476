"""Quaternion/SE(3) kernels vs scipy + reference-formula oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from shwd_tpu.ops import (
    qmul, qrot, euler_to_quaternion, quat_to_matrix, create_pose_7d,
    quaternion_rotate, quaternion_transform, convert2transformation,
    rotation_error_deg, translation_error,
)


def _rand_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_qmul_matches_scipy(rng):
    q = _rand_quat(rng, (16,))
    r = _rand_quat(rng, (16,))
    got = np.asarray(qmul(jnp.asarray(q), jnp.asarray(r)))
    # scipy uses (x,y,z,w); its "*" is Hamilton: (q*r) rotates by q after r.
    sq = Rotation.from_quat(np.roll(q, -1, axis=-1))
    sr = Rotation.from_quat(np.roll(r, -1, axis=-1))
    want = np.roll((sq * sr).as_quat(), 1, axis=-1)
    # sign ambiguity: compare up to antipode
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-6)


def test_qrot_matches_matrix(rng):
    q = _rand_quat(rng, (8,))
    v = rng.normal(size=(8, 3))
    got = np.asarray(qrot(jnp.asarray(q), jnp.asarray(v)))
    R = Rotation.from_quat(np.roll(q, -1, axis=-1)).as_matrix()
    want = np.einsum("bij,bj->bi", R, v)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_quat_to_matrix_consistent_with_qrot(rng):
    q = _rand_quat(rng, (8,))
    v = rng.normal(size=(8, 3))
    R = np.asarray(quat_to_matrix(jnp.asarray(q)))
    want = np.asarray(qrot(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(np.einsum("bij,bj->bi", R, v), want, atol=1e-6)


def test_euler_to_quaternion_xyz(rng):
    e = rng.uniform(-np.pi, np.pi, size=(10, 3))
    got = np.asarray(euler_to_quaternion(jnp.asarray(e), "xyz"))
    # The reference composes qx (x) qy (x) qz — intrinsic X-Y-Z in scipy terms.
    want = Rotation.from_euler("XYZ", e).as_quat()  # (x,y,z,w)
    want = np.roll(want, 1, axis=-1)
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-6)


def test_pose7d_roundtrip(rng):
    raw = rng.normal(size=(4, 7))
    pose = create_pose_7d(jnp.asarray(raw))
    assert np.allclose(np.linalg.norm(np.asarray(pose)[:, :4], axis=-1), 1.0, atol=1e-6)
    pts = jnp.asarray(rng.normal(size=(4, 32, 3)))
    out = quaternion_transform(pts, pose)
    # compare against explicit R p + t
    R = np.asarray(quat_to_matrix(pose[:, :4]))
    want = np.einsum("bij,bnj->bni", R, np.asarray(pts)) + np.asarray(pose)[:, None, 4:]
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_convert2transformation(rng):
    q = _rand_quat(rng, (3,))
    R = jnp.asarray(Rotation.from_quat(np.roll(q, -1, axis=-1)).as_matrix())
    t = jnp.asarray(rng.normal(size=(3, 1, 3)))
    T = np.asarray(convert2transformation(R, t))
    assert T.shape == (3, 4, 4)
    np.testing.assert_allclose(T[:, :3, :3], np.asarray(R), atol=1e-6)
    np.testing.assert_allclose(T[:, :3, 3], np.asarray(t)[:, 0], atol=1e-6)
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1.0], (3, 1)), atol=1e-6)


def test_rotation_error_deg_against_known():
    # rotate 30 degrees about z; est_rotation = identity => error = 30 deg
    R = Rotation.from_euler("z", 30, degrees=True).as_matrix()
    err = rotation_error_deg(jnp.asarray(R)[None], jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(err), [30.0], atol=1e-4)


def test_translation_error_matches_reference_formula(rng):
    # reference: trans_target = -(R^T t); error = ||target - est||
    R = Rotation.random(5, random_state=0).as_matrix()
    t = rng.normal(size=(5, 3))
    est = rng.normal(size=(5, 3))
    want = np.linalg.norm(-np.einsum("bji,bj->bi", R, t) - est, axis=-1)
    got = np.asarray(translation_error(jnp.asarray(R), jnp.asarray(t), jnp.asarray(est)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_qrot_jit_grad():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    v = jnp.ones((3,))
    g = jax.grad(lambda vv: jnp.sum(qrot(q, vv)))(v)
    assert g.shape == (3,)
