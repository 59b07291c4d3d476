"""PCRNet + data pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shwd_tpu.models import PCRNet, PointNet, max_pool
from shwd_tpu.data import (
    TransformConfig, make_registration_batch, random_pose_7d, apply_pose,
    shape_bank, normalize_scale, RegistrationDataset, DatasetConfig,
)
from shwd_tpu.ops import rotation_error_deg, translation_error, qrot


def test_pointnet_shapes():
    net = PointNet(emb_dims=64, widths=(3, 8, 16))
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 3))
    f = net.apply(params, x)
    assert f.shape == (2, 10, 64)
    assert max_pool(f).shape == (2, 64)


def test_pointnet_permutation_invariant_after_pool():
    net = PointNet(emb_dims=32, widths=(3, 8))
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 20, 3))
    perm = jax.random.permutation(jax.random.PRNGKey(2), 20)
    f1 = max_pool(net.apply(params, x))
    f2 = max_pool(net.apply(params, x[:, perm]))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)


def test_pcrnet_output_contract():
    model = PCRNet(PointNet(emb_dims=32, widths=(3, 8)))
    # shrink head for test speed
    model.HEAD_WIDTHS = (64, 16, 7)
    params = model.init(jax.random.PRNGKey(0))
    template = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 3))
    source = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 3))
    out = model.apply(params, template, source, iteration_num=3)
    assert out.est_R.shape == (4, 3, 3)
    assert out.est_t.shape == (4, 1, 3)
    assert out.est_T.shape == (4, 4, 4)
    assert out.transformed_source.shape == source.shape
    # est_R must be a rotation (orthonormal, det +1)
    R = np.asarray(out.est_R)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.tile(np.eye(3), (4, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    # transformed_source == est_R @ source + est_t (the composed transform)
    want = np.einsum("bij,bnj->bni", R, np.asarray(source)) + np.asarray(out.est_t)
    np.testing.assert_allclose(np.asarray(out.transformed_source), want,
                               atol=1e-3)


def test_pcrnet_jits():
    model = PCRNet(PointNet(emb_dims=32, widths=(3, 8)))
    model.HEAD_WIDTHS = (64, 16, 7)
    params = model.init(jax.random.PRNGKey(0))
    f = jax.jit(lambda p, t, s: model.apply(p, t, s, 2))
    out = f(params, jnp.ones((2, 8, 3)), jnp.ones((2, 8, 3)))
    assert np.isfinite(np.asarray(out.transformed_source)).all()


# ---------------------------------------------------------------------------
# data
# ---------------------------------------------------------------------------

def test_random_pose_respects_ranges():
    cfg = TransformConfig(angle_range_deg=45, translation_range=0.49)
    pose = random_pose_7d(jax.random.PRNGKey(0), 256, cfg)
    t = np.asarray(pose[:, 4:])
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 0.7, atol=1e-5)
    q = np.asarray(pose[:, :4])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


def test_apply_pose_consistent_with_error_metrics():
    # A perfect estimator recovering the inverse transform must yield ~0 error.
    cfg = TransformConfig(noise_sigma=0.0)
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 3))
    pose = random_pose_7d(key, 8, cfg)
    transformed, igt_R, igt_t = apply_pose(src, pose)
    # inverse transform: R^T (x - t)
    est_R = jnp.swapaxes(igt_R, -1, -2)
    est_t = -jnp.einsum("bji,bj->bi", igt_R, igt_t)
    rot_err = rotation_error_deg(igt_R, est_R)
    trans_err = translation_error(igt_R, igt_t, est_t)
    np.testing.assert_allclose(np.asarray(rot_err), 0.0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(trans_err), 0.0, atol=1e-5)
    # and it maps the transformed cloud back onto the source
    rec = jnp.einsum("bij,bnj->bni", est_R, transformed) + est_t[:, None]
    np.testing.assert_allclose(np.asarray(rec), np.asarray(src), atol=1e-4)


def test_make_registration_batch_with_outliers():
    cfg = TransformConfig(noise_sigma=0.01, outlier_num=4, outlier_sigma=2.0)
    tgt = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 3))
    src = tgt
    batch = make_registration_batch(jax.random.PRNGKey(1), tgt, src, cfg)
    assert batch.source.shape == (4, 32, 3)
    assert batch.igt_rotation.shape == (4, 3, 3)
    assert np.isfinite(np.asarray(batch.source)).all()


def test_fixed_angle_x_axis_mode():
    cfg = TransformConfig(angle_range_deg=30, rotation_axes="x",
                          fixed_angle=True, noise_sigma=0.0)
    pose = random_pose_7d(jax.random.PRNGKey(0), 4, cfg)
    igt_R = np.asarray(
        apply_pose(jnp.zeros((4, 1, 3)), pose)[1])
    err = rotation_error_deg(jnp.asarray(igt_R), jnp.eye(3)[None].repeat(4, 0))
    np.testing.assert_allclose(np.asarray(err), 30.0, atol=1e-3)


def test_shape_bank_normalized():
    bank = shape_bank(8, 64, seed=0)
    assert bank.shape == (8, 64, 3)
    assert np.abs(bank).max() <= 1.0 + 1e-5
    assert np.isfinite(bank).all()


def test_registration_dataset_batches(tmp_path):
    cfg = DatasetConfig(source_point_num=32, target_point_num=32,
                        num_synthetic=16, cache_dir=str(tmp_path))
    ds = RegistrationDataset(cfg, "train")
    rng = np.random.default_rng(0)
    tr, va = ds.train_val_indices(rng)
    assert len(tr) + len(va) == len(ds)
    batches = list(ds.batches(jax.random.PRNGKey(0), tr, batch_size=4, rng=rng))
    assert len(batches) == len(tr) // 4
    b = batches[0]
    assert b.source.shape == (4, 32, 3)
    assert b.target.shape == (4, 32, 3)
