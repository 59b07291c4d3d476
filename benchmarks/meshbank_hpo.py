"""HPO on the production meshbank workload (VERDICT r4 #2).

The mesh-bank registration row trails the synthetic-bank headline 7x; one
candidate cause is an lr/lambda mismatch (the pinned values were tuned on
the synthetic bank, and the meshbank epoch has 3x fewer optimizer steps —
512 train meshes vs 2048 synthetic items). TPE study over Adam lr /
weight-decay / SHWD lambda on short w_cos meshbank trainings.

Usage: python benchmarks/meshbank_hpo.py [n_trials=12] [epochs=100] [N=128]
Writes benchmarks/meshbank_hpo.json (+ study jsonl).
"""
import dataclasses as dc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shwd_tpu.data import DatasetConfig, RegistrationDataset, TransformConfig
from shwd_tpu.losses import SHWDConfig, TransportConfig
from shwd_tpu.train import TrainConfig, Trainer
from shwd_tpu.train.hpo import create_study

n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 12
epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 100
N = int(sys.argv[3]) if len(sys.argv) > 3 else 128

ROOT, CACHE = "mesh_bank", "meshbank_cache"

base = TrainConfig(
    experiment="meshbank_hpo",
    log_dir="log",
    criterion="w_cos",
    dataset=DatasetConfig(
        source_point_num=N, target_point_num=N,
        modelnet_root=ROOT, cache_dir=CACHE,
        transform=TransformConfig(noise_sigma=0.02)),
    batch_size=128,
    pcr_iteration_num=3,
)


def objective(trial):
    lr = trial.suggest_loguniform("adam_lr", 1e-4, 1e-2)
    wd = trial.suggest_loguniform("adam_weight_decay", 1e-12, 1e-4)
    lam = trial.suggest_loguniform("shwd_lambda", 1e-7, 1e-2)
    shwd = SHWDConfig(
        transport=TransportConfig(cost="lp", p=2.0, solver="sinkhorn"),
        max_iter=1, lam=lam, phi_lr=9.213233310357477e-05,
        phi_weight_decay=1.4096013153858628e-08)
    cfg = dc.replace(base, lr=lr, weight_decay=wd, shwd=shwd,
                     num_epochs=epochs,
                     experiment=f"meshbank_hpo_t{trial.number}")
    tr = Trainer(cfg)
    ds = RegistrationDataset(cfg.dataset, "train")
    res = tr.fit(ds, verbose=False)
    return float(res["best"]["rot"])


here = os.path.dirname(os.path.abspath(__file__))
study = create_study("meshbank_lr_wd_lam",
                     storage=os.path.join(here, "meshbank_hpo.jsonl"),
                     load_if_exists=True, seed=0)
study.sampler.n_startup = 6
t0 = time.perf_counter()
study.optimize(objective, n_trials=n_trials)
dt = time.perf_counter() - t0

out = {
    "study": "meshbank_lr_wd_lam", "criterion": "w_cos/sinkhorn",
    "n_trials": len(study.completed), "epochs_per_trial": epochs,
    "point_num": N, "total_s": dt,
    "best_value_rot_error_deg": study.best_value,
    "best_params": study.best_params,
    "all_values": [t["value"] for t in study.completed],
    "pinned_synthetic_values": {
        "adam_lr": 1e-3, "adam_weight_decay": 1.4096013153858628e-08,
        "shwd_lambda": 1.3111961119405346e-05},
}
with open(os.path.join(here, "meshbank_hpo.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
