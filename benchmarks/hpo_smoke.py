"""HPO smoke on the real workload: TPE study over short CD trainings.

Reference: ``Optimize_hyperparameters/train_OPTUNA_CD.py`` (objective
:297-315 — suggested Adam lr / weight-decay, minimize mean rotation error;
study :458-468 resumable). This run proves the first-party TPE loop and the
trainer's (fixed) eval metric compose on real hardware.

Usage: python benchmarks/hpo_smoke.py [n_trials] [epochs]
Writes benchmarks/hpo_smoke.json (+ the raw study jsonl next to it).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shwd_tpu.data import DatasetConfig, TransformConfig
from shwd_tpu.train import TrainConfig
from shwd_tpu.train.hpo import create_study, registration_hpo_objective

n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 10
epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 20
# argv[3]: study/artifact name — 'hpo_study_80ep' is the discriminative run
# (VERDICT r4 #6: >=60-epoch trials so lr/wd separate from noise)
name = sys.argv[3] if len(sys.argv) > 3 else "hpo_smoke"

base = TrainConfig(
    experiment=name,
    log_dir="log",
    criterion="cd",
    dataset=DatasetConfig(
        source_point_num=128, target_point_num=128, num_synthetic=512,
        synthetic_kinds=("composite",), cache_dir="modelnet_cache",
        transform=TransformConfig(noise_sigma=0.02)),
    batch_size=128,
    pcr_iteration_num=3,
)

here = os.path.dirname(os.path.abspath(__file__))
study = create_study("cd_lr_wd", storage=os.path.join(here, name + ".jsonl"),
                     load_if_exists=True, seed=0)
t0 = time.perf_counter()
study.optimize(registration_hpo_objective(base, num_epochs=epochs),
               n_trials=n_trials)
dt = time.perf_counter() - t0

out = {
    "study": "cd_lr_wd",
    "n_trials": len(study.completed),
    "epochs_per_trial": epochs,
    "total_s": dt,
    "best_value_rot_error_deg": study.best_value,
    "best_params": study.best_params,
    "all_values": [t["value"] for t in study.completed],
}
with open(os.path.join(here, name + ".json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
