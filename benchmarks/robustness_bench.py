"""Registration robustness on the real TPU: noise sweep + outliers.

The reference's canonical experiment matrix sweeps source noise sigma over
{0, 0.02, 0.04, 0.1} (train_RUNNER.py:174-190) and has an outlier dataset
variant that replaces ``outlier_num`` random source points with N(0,
sigma_out) draws (Data_set_transformation_outlier.py:197-203). This script
trains the flagship W_COS criterion for a short budget under each
perturbation and records the rot/trans-error curves, showing learning
survives every robustness setting.

Usage: python benchmarks/robustness_bench.py [epochs] [num_synthetic]
Writes benchmarks/robustness_tpu.json (one row per setting, merged on
re-runs so settings can be produced incrementally).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shwd_tpu.data import DatasetConfig, RegistrationDataset, TransformConfig
from shwd_tpu.train import TrainConfig, Trainer

SETTINGS = [
    {"name": "noise_0.00", "noise_sigma": 0.0},
    {"name": "noise_0.02", "noise_sigma": 0.02},
    {"name": "noise_0.04", "noise_sigma": 0.04},
    {"name": "noise_0.10", "noise_sigma": 0.1},
    # reference outlier evaluation scale: a handful of far-field replacements
    {"name": "outliers_10", "noise_sigma": 0.02,
     "outlier_num": 10, "outlier_sigma": 1.0},
]


def run(setting: dict, epochs: int, num_synthetic: int) -> dict:
    tcfg = TransformConfig(
        noise_sigma=setting["noise_sigma"],
        outlier_num=setting.get("outlier_num", 0),
        outlier_sigma=setting.get("outlier_sigma", 1.0))
    cfg = TrainConfig(
        experiment=f"robust_{setting['name']}",
        log_dir="log",
        criterion="w_cos",
        dataset=DatasetConfig(
            source_point_num=128, target_point_num=128,
            num_synthetic=num_synthetic,
            synthetic_kinds=("composite",),
            cache_dir="modelnet_cache",
            transform=tcfg),
        num_epochs=epochs,
        batch_size=128,
        pcr_iteration_num=3,
        # nan_guard forces the per-step (non-fused) epoch path
        # (train/trainer.py: fused_epoch and not nan_guard) — kept on here
        # because perturbed inputs are exactly where non-finite losses
        # would surface, and the robustness run is short.
        nan_guard=True,
    )
    tr = Trainer(cfg)
    ds = RegistrationDataset(cfg.dataset, "train")
    t0 = time.perf_counter()
    res = tr.fit(ds, verbose=False)
    dt = time.perf_counter() - t0
    h = res["history"]
    return {
        "setting": setting["name"], "criterion": "w_cos",
        "noise_sigma": setting["noise_sigma"],
        "outlier_num": setting.get("outlier_num", 0),
        "epochs": epochs, "num_synthetic": num_synthetic,
        "total_s": dt, "s_per_epoch": dt / epochs,
        "first_rot_error": h[0]["rot_error"],
        "best_rot_error": res["best"]["rot"],
        "best_trans_error": res["best"]["trans"],
        "final_rot_error": h[-1]["rot_error"],
        "rot_curve_every10": [r["rot_error"] for r in h[::10]],
    }


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    num_synthetic = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "robustness_tpu.json")
    rows: dict[str, dict] = {}
    if os.path.exists(out):
        with open(out) as f:
            rows = {r["setting"]: r for r in json.load(f)}
        # the artifact reads as ONE uniform sweep: refuse to silently mix
        # rows produced under a different training budget
        for r in rows.values():
            # .get: rows from a pre-guard script version lack these keys —
            # treat that as a mismatch, not a KeyError
            if (r.get("epochs"), r.get("num_synthetic")) != (epochs, num_synthetic):
                raise SystemExit(
                    f"existing row {r['setting']!r} was produced with "
                    f"epochs={r.get('epochs')}, num_synthetic={r.get('num_synthetic')}"
                    f" but this run uses {epochs}/{num_synthetic}; delete "
                    f"{out} or rerun with the matching budget")
    for setting in SETTINGS:
        r = run(setting, epochs, num_synthetic)
        print(json.dumps(r), flush=True)
        rows[r["setting"]] = r
        with open(out, "w") as f:
            json.dump(list(rows.values()), f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
