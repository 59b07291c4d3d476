"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4(d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from shwd_tpu.parallel import (
    make_mesh, batch_sharding, frames_sharding, make_sharded_ssw,
    make_sharded_transport,
)
from shwd_tpu.ops.spherical import stiefel_frames, sliced_cost_sphere
from shwd_tpu.ops import lp_cost
from shwd_tpu.ops.sinkhorn import emd2_approx


def test_mesh_shapes():
    mesh = make_mesh(data=4, slices=2)
    assert mesh.shape == {"data": 4, "slices": 2}
    mesh2 = make_mesh()
    assert mesh2.shape["data"] == len(jax.devices())


def test_sharded_ssw_matches_single_device():
    mesh = make_mesh(data=4, slices=2)
    key = jax.random.PRNGKey(0)
    b, n, L = 8, 32, 16
    x = jax.random.normal(key, (b, n, 3))
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = jnp.roll(x, 1, axis=1) + 0.05
    frames = stiefel_frames(jax.random.PRNGKey(1), L)

    want = float(jnp.mean(sliced_cost_sphere(x, y, frames[None], p=2)))

    ssw = make_sharded_ssw(mesh, p=2)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    fs = jax.device_put(frames, frames_sharding(mesh))
    got = float(jax.jit(ssw)(xs, ys, fs))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_transport_matches_single_device():
    mesh = make_mesh(data=8, slices=1)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 16, 3))
    y = x + 0.1

    c = lp_cost(x, y, 2)
    want = float(jnp.mean(jnp.maximum(
        emd2_approx(c, eps=5e-3, num_iters=50, num_scales=4), 1e-30) ** 0.5))

    transport = make_sharded_transport(mesh, cost="lp", p=2.0)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    got = float(jax.jit(transport)(xs, ys))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sharded_ssw_grad_flows():
    mesh = make_mesh(data=4, slices=2)
    ssw = make_sharded_ssw(mesh, p=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 3))
    y = x + 0.2
    frames = stiefel_frames(jax.random.PRNGKey(1), 8)
    g = jax.jit(jax.grad(lambda a: ssw(a, y, frames)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def _fit_cfg(tmp_path, name, **kw):
    from shwd_tpu.data import DatasetConfig, TransformConfig
    from shwd_tpu.losses import SHWDConfig, TransportConfig
    from shwd_tpu.train import TrainConfig
    return TrainConfig(
        experiment=name, log_dir=str(tmp_path),
        criterion="w_cos",
        dataset=DatasetConfig(
            source_point_num=16, target_point_num=16, num_synthetic=64,
            synthetic_kinds=("composite",),
            transform=TransformConfig(noise_sigma=0.0)),
        num_epochs=2, batch_size=16, pcr_iteration_num=2,
        shwd=SHWDConfig(
            transport=TransportConfig(cost="geodesic", p=2.0, solver="ssw",
                                      num_projections=8),
            max_iter=1, lam=1e-4, phi_lr=1e-4),
        phi_num_flow_layer=1, seed=7, **kw)


def test_trainer_fit_on_mesh_matches_single_device(tmp_path):
    """VERDICT r2 #1: multi-device training through the production loop.

    fit() on the 8-device virtual mesh (data=4, slices=2) must produce
    finite losses and the same per-epoch trajectory as the single-device
    run at identical seeds (sharding changes layout, not math — only
    reduction order differs)."""
    from shwd_tpu.data import RegistrationDataset
    from shwd_tpu.train import Trainer

    cfg_single = _fit_cfg(tmp_path, "fit_single")
    cfg_mesh = _fit_cfg(tmp_path, "fit_mesh", mesh_data=4, mesh_slices=2)

    res_s = Trainer(cfg_single).fit(
        RegistrationDataset(cfg_single.dataset, "train"), verbose=False)
    res_m = Trainer(cfg_mesh).fit(
        RegistrationDataset(cfg_mesh.dataset, "train"), verbose=False)

    assert len(res_m["history"]) == 2
    for row_s, row_m in zip(res_s["history"], res_m["history"]):
        assert np.isfinite(row_m["train_loss"])
        np.testing.assert_allclose(row_m["train_loss"], row_s["train_loss"],
                                   rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(row_m["rot_error"], row_s["rot_error"],
                                   rtol=2e-3, atol=1e-3)


def test_trainer_fit_on_mesh_per_step_path(tmp_path):
    """The unfused (nan_guard) epoch path also shards batches over 'data'."""
    from shwd_tpu.data import RegistrationDataset
    from shwd_tpu.train import Trainer

    cfg = _fit_cfg(tmp_path, "fit_mesh_step", mesh_data=8, mesh_slices=1,
                   nan_guard=True)
    tr = Trainer(cfg)
    assert tr.mesh is not None and tr.mesh.shape == {"data": 8, "slices": 1}
    res = tr.fit(RegistrationDataset(cfg.dataset, "train"), verbose=False)
    assert all(np.isfinite(r["train_loss"]) for r in res["history"])
