"""End-to-end trainer + flow-driver + checkpoint tests (small configs)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shwd_tpu.data import DatasetConfig, RegistrationDataset, TransformConfig
from shwd_tpu.losses import SHWDConfig, TransportConfig
from shwd_tpu.train import TrainConfig, Trainer, FlowConfig, run_flow
from shwd_tpu.utils import save_checkpoint, load_checkpoint
from shwd_tpu.ops.sphere_sampling import sample_cube_surface


def tiny_config(tmp_path, criterion="cd", **kw):
    return TrainConfig(
        experiment="t",
        log_dir=str(tmp_path),
        criterion=criterion,
        dataset=DatasetConfig(source_point_num=24, target_point_num=24,
                              num_synthetic=16, cache_dir=str(tmp_path / "mc"),
                              transform=TransformConfig(noise_sigma=0.01)),
        num_epochs=2,
        batch_size=4,
        pcr_iteration_num=2,
        shwd=SHWDConfig(
            transport=TransportConfig(cost="lp", p=2.0, solver="sinkhorn_fast",
                                      eps=0.05, num_iters=20),
            max_iter=1, lam=1e-4, phi_lr=1e-4),
        phi_num_flow_layer=1,
        **kw,
    )


@pytest.mark.parametrize("criterion", ["cd", "w_cos", "pseudo_w_cos"])
def test_trainer_runs_and_checkpoints(tmp_path, criterion):
    cfg = tiny_config(tmp_path, criterion)
    tr = Trainer(cfg)
    ds = RegistrationDataset(cfg.dataset, "train")
    result = tr.fit(ds, verbose=False)
    assert len(result["history"]) == 2
    assert np.isfinite(result["history"][-1]["train_loss"])
    # the val split (3 of 16 items, < batch_size) must still be evaluated —
    # round-1 regression: drop_remainder silently yielded 0 val batches and
    # a fake 0.0 rot error. An untrained model on 45-deg-range poses must
    # show a clearly nonzero error.
    rot = result["history"][-1]["rot_error"]
    assert np.isfinite(rot) and rot > 1.0
    # checkpoint exists and loads back into the same structure
    state, epoch = load_checkpoint(
        tmp_path / "t" / "models" / "best_model_snap", result["state"])
    assert epoch >= 1
    for a, b in zip(jax.tree.leaves(state)[:3],
                    jax.tree.leaves(result["state"])[:3]):
        assert np.asarray(a).shape == np.asarray(b).shape


def test_trainer_resume(tmp_path):
    cfg = tiny_config(tmp_path, "cd")
    tr = Trainer(cfg)
    ds = RegistrationDataset(cfg.dataset, "train")
    tr.fit(ds, verbose=False)
    cfg2 = dataclasses.replace(
        cfg, num_epochs=3,
        load_model=str(tmp_path / "t" / "models" / "best_model_snap"))
    tr2 = Trainer(cfg2)
    res = tr2.fit(ds, verbose=False)
    assert res["history"][-1]["epoch"] == 3


def test_eval_raises_on_empty_val_set(tmp_path):
    cfg = tiny_config(tmp_path, "cd")
    tr = Trainer(cfg)
    ds = RegistrationDataset(cfg.dataset, "train")
    state = tr.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="no batches"):
        tr.eval_one_epoch(state, ds, np.array([], dtype=int),
                          jax.random.PRNGKey(1))


def test_early_stop_strikes_wired(tmp_path):
    """Trainer counts a strike for every non-improving val epoch; the
    criterion state carries the counter (regulation.py:795-855)."""
    cfg = tiny_config(tmp_path, "w_cos")
    cfg = dataclasses.replace(
        cfg, num_epochs=4,
        shwd=dataclasses.replace(cfg.shwd, early_stop_strikes=1))
    tr = Trainer(cfg)
    assert tr._early_stop_enabled
    ds = RegistrationDataset(cfg.dataset, "train")
    res = tr.fit(ds, verbose=False)
    h = res["history"]
    non_improving = sum(
        1 for i, row in enumerate(h)
        if row["val_loss"] >= min([np.inf] + [r["val_loss"] for r in h[:i]]))
    assert int(res["state"].crit_state.strikes) == non_improving


def test_nan_guard_dumps_and_raises(tmp_path, monkeypatch):
    cfg = dataclasses.replace(tiny_config(tmp_path, "cd"), nan_guard=True)
    tr = Trainer(cfg)
    ds = RegistrationDataset(cfg.dataset, "train")
    state = tr.init_state(jax.random.PRNGKey(0))
    monkeypatch.setattr(
        tr, "_train_step",
        lambda s, b, train=True: (s, jnp.asarray(float("nan"))))
    with pytest.raises(FloatingPointError, match="non-finite"):
        tr.train_one_epoch(state, ds, np.arange(len(ds)),
                           jax.random.PRNGKey(1), np.random.default_rng(0))
    dump = tmp_path / "t" / "nan_dump"
    assert (dump / "batch.npz").exists()
    assert (dump / "state_pre_step.npz").exists()


@pytest.mark.parametrize("criterion", ["cd", "w_cos"])
def test_fused_epoch_matches_per_step(tmp_path, criterion):
    """fused_epoch=True (one lax.scan dispatch per epoch) must reproduce the
    per-step path: same shuffle, same keys, same update order."""
    cfg_f = tiny_config(tmp_path, criterion)
    cfg_u = dataclasses.replace(cfg_f, fused_epoch=False,
                                experiment="t_unfused")
    losses = {}
    for tag, cfg in (("fused", cfg_f), ("unfused", cfg_u)):
        tr = Trainer(cfg)
        ds = RegistrationDataset(cfg.dataset, "train")
        state = tr.init_state(jax.random.PRNGKey(7))
        rng = np.random.default_rng(3)
        idx = np.arange(12)
        state, l1 = tr.train_one_epoch(state, ds, idx,
                                       jax.random.PRNGKey(11), rng)
        _, l2 = tr.train_one_epoch(state, ds, idx,
                                   jax.random.PRNGKey(12), rng)
        losses[tag] = (l1, l2)
    np.testing.assert_allclose(losses["fused"], losses["unfused"],
                               rtol=2e-4)


def test_config_roundtrip(tmp_path):
    cfg = tiny_config(tmp_path, "w_cos")
    cfg.save(tmp_path / "c.json")
    cfg2 = TrainConfig.load(tmp_path / "c.json")
    assert cfg2.criterion == "w_cos"
    assert cfg2.shwd.transport.solver == "sinkhorn_fast"
    assert cfg2.dataset.source_point_num == 24


def test_flow_driver_swd_converges():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    source = sample_cube_surface(k1, 200)
    target = sample_cube_surface(k2, 200, biased=True)
    cfg = FlowConfig(method="SWD", num_iterations=60, eval_interval=20,
                     num_projections=50)
    res = run_flow(source, target, cfg)
    assert res.eval_values[-1] < res.eval_values[0] * 0.7


@pytest.mark.parametrize("method", [
    "MSWD", "SSWD_W1", "ASWD", "DSWD", "W2", "GSWD_POLY", "GSWD_POLY3",
    "MGSWD_POLY", "GSWD_CIRC", "MGSWD_CIRC", "GSW_NN", "MGSW_NN",
])
def test_flow_driver_method_zoo_runs_and_descends(method):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    source = sample_cube_surface(k1, 96)
    target = sample_cube_surface(k2, 96, biased=True)
    cfg = FlowConfig(method=method, num_iterations=20, eval_interval=10,
                     num_projections=20)
    res = run_flow(source, target, cfg)
    assert np.isfinite(res.eval_values).all()
    # every zoo method should at least not increase exact W2 from the start
    assert res.eval_values[-1] <= res.eval_values[0] * 1.05


def test_flow_driver_lr_decay_schedule():
    """lr_decay_alpha < 1 must actually shrink late-run point updates
    (cosine decay wired through both opt constructions in run_flow)."""
    from shwd_tpu.train.flow_driver import _make_point_opt

    cfg = FlowConfig(num_iterations=100, lr=0.01, lr_decay_alpha=0.1)
    opt = _make_point_opt(cfg)
    p = jnp.ones((4, 3))
    g = jnp.full((4, 3), 0.5)
    st = opt.init(p)
    up0, st = opt.update(g, st)           # count 0: full lr
    for _ in range(99):
        up, st = opt.update(g, st)        # count 99: decayed to ~alpha*lr
    ratio = float(jnp.abs(up).mean() / jnp.abs(up0).mean())
    assert 0.05 < ratio < 0.2             # ~alpha, not 1.0

    const = _make_point_opt(FlowConfig(num_iterations=100, lr=0.01))
    stc = const.init(p)
    upc0, stc = const.update(g, stc)
    for _ in range(99):
        upc, stc = const.update(g, stc)
    assert float(jnp.abs(upc).mean() / jnp.abs(upc0).mean()) > 0.9


def test_flow_driver_shwd_decreases():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    source = sample_cube_surface(k1, 120)
    target = sample_cube_surface(k2, 120, biased=True)
    cfg = FlowConfig(method="SHWD", num_iterations=20, eval_interval=10,
                     shwd_layers=1, num_projections=30)
    res = run_flow(source, target, cfg)
    assert res.eval_values[-1] < res.eval_values[0]


def test_fused_eval_matches_loop_on_deterministic_transforms():
    """eval_one_epoch's one-dispatch fused path (scan + in-graph remainder)
    computes the same sample-weighted means as the per-batch loop. Keys
    differ between the paths by design, so the check uses a deterministic
    transform (fixed angle, no noise, no translation)."""
    import dataclasses
    from shwd_tpu.data import DatasetConfig, RegistrationDataset, TransformConfig
    from shwd_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        criterion="cd", batch_size=8, num_epochs=1,
        dataset=DatasetConfig(
            source_point_num=16, target_point_num=16, num_synthetic=20,
            synthetic_kinds=("composite",),
            transform=TransformConfig(angle_range_deg=30.0, fixed_angle=True,
                                      rotation_axes="x", translation_range=0.0,
                                      noise_sigma=0.0)))
    ds = RegistrationDataset(cfg.dataset, "train")
    idx = np.arange(len(ds))                   # 20 items -> 2 full + tail 4
    key = jax.random.PRNGKey(7)

    tr_fused = Trainer(cfg)
    state = tr_fused.init_state(jax.random.PRNGKey(0))
    fused = tr_fused.eval_one_epoch(state, ds, idx, key)

    tr_loop = Trainer(dataclasses.replace(cfg, fused_epoch=False))
    loop = tr_loop.eval_one_epoch(state, ds, idx, key)

    np.testing.assert_allclose(fused, loop, rtol=1e-5, atol=1e-6)
