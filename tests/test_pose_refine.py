"""Distributed pose refinement: recovery of known rigid transforms."""

import numpy as np
import jax
import jax.numpy as jnp

from shwd_tpu.ops.quaternion import rotation_error_deg
from shwd_tpu.train.pose_refine import (
    PoseRefineConfig, refine_model_output, refine_poses,
)


def _make_problem(rng, b=4, n=64, angle_deg=20.0):
    """Random clouds; target = R @ source + t. Refinement must find (R, t)."""
    src = rng.normal(size=(b, n, 3)).astype(np.float32)
    angles = np.radians(rng.uniform(-angle_deg, angle_deg, size=(b,)))
    cs, ss = np.cos(angles), np.sin(angles)
    R = np.zeros((b, 3, 3), np.float32)
    R[:, 0, 0], R[:, 0, 1] = cs, -ss
    R[:, 1, 0], R[:, 1, 1] = ss, cs
    R[:, 2, 2] = 1.0
    t = 0.3 * rng.normal(size=(b, 1, 3)).astype(np.float32)
    tgt = np.einsum("bij,bnj->bni", R, src) + t
    return (jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(R),
            jnp.asarray(t[:, 0]))


def test_refine_recovers_rigid_transform(rng):
    src, tgt, R_true, t_true = _make_problem(rng)
    res = refine_poses(src, tgt, PoseRefineConfig(loss="cd", num_steps=300,
                                                  lr=0.02))
    # est transforms source onto target: est_R ~ R_true
    err = rotation_error_deg(jnp.swapaxes(res.est_R, -1, -2), R_true)
    assert float(jnp.max(err)) < 2.0
    np.testing.assert_allclose(np.asarray(res.est_t), np.asarray(t_true),
                               atol=0.05)
    # loss must have decreased massively
    assert float(res.losses[-1]) < 0.05 * float(res.losses[0])


def test_refine_loss_trace_monotone_overall(rng):
    src, tgt, _, _ = _make_problem(rng, b=2, n=48)
    res = refine_poses(src, tgt, PoseRefineConfig(num_steps=100, lr=0.02))
    assert float(res.losses[-1]) < float(res.losses[0])
    assert res.pose_7d.shape == (2, 7)
    # quaternions normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(res.pose_7d[:, :4]), axis=-1), 1.0,
        rtol=1e-5)


def test_refine_from_model_output_improves(rng):
    """Seeding from a noisy pose estimate must converge (coarse-to-fine)."""
    src, tgt, R_true, t_true = _make_problem(rng, b=3)
    # perturb the true pose slightly as the 'model output'
    eps = np.radians(5.0)
    c, s = np.cos(eps), np.sin(eps)
    P = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    R0 = jnp.asarray(np.einsum("ij,bjk->bik", P, np.asarray(R_true)))
    res = refine_model_output(
        src, tgt, R0, t_true + 0.05,
        PoseRefineConfig(loss="cd", num_steps=150, lr=0.01))
    err = rotation_error_deg(jnp.swapaxes(res.est_R, -1, -2), R_true)
    assert float(jnp.max(err)) < 2.0


def test_refine_sharded_over_data_axis(rng):
    """Batch sharded over an 8-device mesh: same result as replicated run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from shwd_tpu.parallel import make_mesh

    src, tgt, _, _ = _make_problem(rng, b=8, n=32)
    cfg = PoseRefineConfig(num_steps=50, lr=0.02)

    res_local = refine_poses(src, tgt, cfg)

    mesh = make_mesh(data=8, slices=1)
    sh = NamedSharding(mesh, P("data"))
    src_s = jax.device_put(src, sh)
    tgt_s = jax.device_put(tgt, sh)
    fn = jax.jit(lambda s, t: refine_poses(s, t, cfg))
    res_sharded = fn(src_s, tgt_s)

    np.testing.assert_allclose(np.asarray(res_sharded.pose_7d),
                               np.asarray(res_local.pose_7d),
                               rtol=1e-4, atol=1e-5)
