"""Sweep runner (train_RUNNER/test_RUNNER parity) and HPO study tests."""

import dataclasses
import json
import math

import numpy as np
import pytest

from shwd_tpu.train.config import TrainConfig
from shwd_tpu.train.hpo import Study, TPESampler, Trial, create_study
from shwd_tpu.train.runner import (
    apply_overrides, expand_matrix, matrix_to_configs, run_eval_sweep,
    run_sweep,
)


# -- matrix expansion ---------------------------------------------------------

def test_expand_matrix_zip_is_positional():
    m = {"seed": [1, 2, 3], "dataset.transform.noise_sigma": [0.0, 0.02, 0.04],
         "criterion": ["cd"]}
    out = expand_matrix(m, "zip")
    assert len(out) == 3
    assert out[1] == {"seed": 2, "dataset.transform.noise_sigma": 0.02,
                      "criterion": "cd"}


def test_expand_matrix_zip_rejects_ragged():
    with pytest.raises(ValueError):
        expand_matrix({"a": [1, 2], "b": [1, 2, 3]}, "zip")


def test_expand_matrix_product():
    out = expand_matrix({"a": [1, 2], "b": [10, 20, 30]}, "product")
    assert len(out) == 6
    assert {"a": 2, "b": 30} in out


def test_apply_overrides_nested_paths():
    cfg = TrainConfig()
    new = apply_overrides(cfg, {
        "seed": 7,
        "dataset.transform.noise_sigma": 0.1,
        "shwd.transport.num_projections": 64,
        "shwd.lam": 0.5,
    })
    assert new.seed == 7
    assert new.dataset.transform.noise_sigma == 0.1
    assert new.shwd.transport.num_projections == 64
    assert new.shwd.lam == 0.5
    # original untouched (frozen dataclasses)
    assert cfg.seed != 7 or cfg.dataset.transform.noise_sigma != 0.1


def test_apply_overrides_unknown_field_raises():
    with pytest.raises(KeyError):
        apply_overrides(TrainConfig(), {"not_a_field": 1})


def test_matrix_to_configs_reference_style():
    """The reference's dict-of-lists block (train_RUNNER.py:82-481): one
    column per experiment, noise sweep with a shared seed."""
    m = {
        "experiment": [f"4_WD_128_128_{s}_noise" for s in
                       ("0.00", "0.02", "0.04", "0.1")],
        "dataset.transform.noise_sigma": [0.0, 0.02, 0.04, 0.1],
        "seed": [4],
        "criterion": ["w_cos"],
    }
    cfgs = matrix_to_configs(m)
    assert len(cfgs) == 4
    assert all(c.seed == 4 for c in cfgs)
    assert cfgs[3].dataset.transform.noise_sigma == 0.1
    assert cfgs[3].experiment.endswith("0.1_noise")


# -- end-to-end tiny sweep ----------------------------------------------------

def _tiny_cfg(tmp_path, name, criterion="cd"):
    from shwd_tpu.data.dataset import DatasetConfig
    return dataclasses.replace(
        TrainConfig(),
        experiment=name, log_dir=str(tmp_path / "log"), criterion=criterion,
        num_epochs=2, batch_size=4, pcr_iteration_num=1,
        dataset=DatasetConfig(source_point_num=16, target_point_num=16,
                              num_synthetic=16),
    )


def test_run_sweep_inprocess_and_eval_sweep(tmp_path):
    cfgs = [_tiny_cfg(tmp_path, "exp_a"), _tiny_cfg(tmp_path, "exp_b")]
    results = run_sweep(cfgs, mode="inprocess", verbose=False)
    assert len(results) == 2
    for cfg in cfgs:
        assert (tmp_path / "log" / cfg.experiment / "config.json").exists()
        assert (tmp_path / "log" / cfg.experiment / "models" /
                "best_model_snap.npz").exists()

    # test_RUNNER parity: evaluate from saved typed configs, no scraping
    out = run_eval_sweep(["exp_a", "exp_b"], log_dir=str(tmp_path / "log"))
    assert set(out) == {"exp_a", "exp_b"}
    for v in out.values():
        assert math.isfinite(v["mean_rot_error"])
        assert math.isfinite(v["mean_trans_error"])


# -- HPO ----------------------------------------------------------------------

def test_hpo_minimizes_quadratic():
    study = create_study("quad", seed=0)

    def objective(trial: Trial) -> float:
        x = trial.suggest_uniform("x", -10.0, 10.0)
        return (x - 3.0) ** 2

    study.optimize(objective, n_trials=60, verbose=False)
    assert abs(study.best_params["x"] - 3.0) < 1.5
    assert study.best_value < 2.0


def test_hpo_loguniform_range_and_tpe_beats_random():
    """TPE should concentrate samples; check the log-space target is found."""
    study = create_study("logq", seed=1)

    def objective(trial: Trial) -> float:
        lr = trial.suggest_loguniform("lr", 1e-7, 1e-1)
        return (math.log10(lr) + 4.0) ** 2     # optimum at 1e-4

    study.optimize(objective, n_trials=80, verbose=False)
    assert 1e-7 <= study.best_params["lr"] <= 1e-1
    assert abs(math.log10(study.best_params["lr"]) + 4.0) < 1.0


def test_hpo_storage_resume(tmp_path):
    path = tmp_path / "study.jsonl"

    def objective(trial):
        x = trial.suggest_uniform("x", 0.0, 1.0)
        return x

    s1 = create_study("s", storage=path, seed=0)
    s1.optimize(objective, n_trials=5, verbose=False)
    assert len(s1.trials) == 5

    # reload: optimize() counts existing trials toward n_trials (resume)
    s2 = create_study("s", storage=path, seed=0)
    assert len(s2.trials) == 5
    assert s2.best_value == s1.best_value
    s2.optimize(objective, n_trials=8, verbose=False)
    assert len(s2.trials) == 8
    lines = [l for l in path.read_text().splitlines() if l.strip()]
    assert len(lines) == 8


def test_hpo_categorical_and_int():
    study = create_study("cats", seed=2)

    def objective(trial):
        k = trial.suggest_categorical("k", ["a", "b", "c"])
        n = trial.suggest_int("n", 1, 5)
        return {"a": 3.0, "b": 1.0, "c": 2.0}[k] + 0.1 * n

    study.optimize(objective, n_trials=40, verbose=False)
    assert study.best_params["k"] == "b"
    assert 1 <= study.best_params["n"] <= 5
