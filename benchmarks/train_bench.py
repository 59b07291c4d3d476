"""Registration training on the real TPU: prove the trainer learns.

Runs the canonical-ish config (128 pts, batch 128, noise 0.02, 45-deg /
1.0-unit pose range — train_RUNNER.py:95-132 values) for each requested
criterion and records the full rot/trans-error curves. Appends one JSON
object per criterion to benchmarks/registration_tpu.json.

Usage: python benchmarks/train_bench.py <criterion> <epochs> [out_json]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys
import time
from pathlib import Path

from shwd_tpu.data import DatasetConfig, RegistrationDataset, TransformConfig
from shwd_tpu.losses import SHWDConfig, TransportConfig
from shwd_tpu.losses.ssw_loss import MaxSSWConfig
from shwd_tpu.train import TrainConfig, Trainer


def run(criterion: str, epochs: int, num_synthetic: int = 2048,
        point_num: int = 128, solver: str | None = None,
        tag: str = "") -> dict:
    # solver override (VERDICT r4 #3): N>=512 trains on the evidenced 'ssw'
    # policy (benchmarks/solver_parity_1024.json) — the dense auction/hybrid
    # exact path blows up with N
    shwd = TrainConfig.__dataclass_fields__["shwd"].default
    if solver is not None:
        shwd = SHWDConfig(
            transport=TransportConfig(
                cost="geodesic" if solver == "ssw" else "lp",
                p=2.0, solver=solver),
            max_iter=1, lam=1.3111961119405346e-05,
            phi_lr=9.213233310357477e-05,
            phi_weight_decay=1.4096013153858628e-08)
    cfg = TrainConfig(
        experiment=f"bench_{criterion}{tag}",
        log_dir="log",
        criterion=criterion,
        shwd=shwd,
        dataset=DatasetConfig(
            source_point_num=point_num, target_point_num=point_num,
            num_synthetic=num_synthetic,
            # composite (chiral) shapes: pose is identifiable, like
            # ModelNet objects; the symmetric primitives put a ~25-deg
            # floor under rot error (flip-ambiguous minima)
            synthetic_kinds=("composite",),
            cache_dir="modelnet_cache",
            transform=TransformConfig(noise_sigma=0.02)),
        num_epochs=epochs,
        # max_ssw: probe-tuned winner (_probe_max_ssw.py batches 1-2): the
        # gentle-ascent chart (lr ~1e-4, one inner step) beats every
        # aggressive-adversary variant, which destabilize registration
        max_ssw=MaxSSWConfig(num_projections=100, max_iter=1, phi_lr=9.2e-5),
        batch_size=128,
        pcr_iteration_num=3,
        # nan_guard forces the per-step (unfused) epoch path so the offending
        # batch is identifiable — but per-batch dispatches cost ~0.2 s tunnel
        # RTT each. The hybrid exact-EMD run pays real device time per step
        # already (auction sweeps at early-epoch misalignment), so it uses
        # the fused one-dispatch epoch; its permutation VJP has no
        # logsumexp/NaN surface.
        nan_guard=(solver != "hybrid"),
    )
    tr = Trainer(cfg)
    ds = RegistrationDataset(cfg.dataset, "train")
    t0 = time.perf_counter()
    res = tr.fit(ds, verbose=True)
    dt = time.perf_counter() - t0
    h = res["history"]
    return {
        "criterion": criterion + tag, "epochs": epochs,
        "point_num": point_num, "solver": solver,
        "num_synthetic": num_synthetic,
        "total_s": dt, "s_per_epoch": dt / epochs,
        "first_rot_error": h[0]["rot_error"],
        "best_rot_error": res["best"]["rot"],
        "best_trans_error": res["best"]["trans"],
        "final_rot_error": h[-1]["rot_error"],
        "final_trans_error": h[-1]["trans_error"],
        "rot_curve_every10": [r["rot_error"] for r in h[::10]],
        "trans_curve_every10": [r["trans_error"] for r in h[::10]],
    }


def main():
    criterion = sys.argv[1] if len(sys.argv) > 1 else "w_cos"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    out_path = Path(sys.argv[3] if len(sys.argv) > 3
                    else "benchmarks/registration_tpu.json")
    point_num = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    solver = sys.argv[5] if len(sys.argv) > 5 else None
    tag = f"_{point_num}_{solver}" if len(sys.argv) > 4 else ""
    r = run(criterion, epochs, point_num=point_num, solver=solver, tag=tag)
    print(json.dumps(r))
    existing = []
    if out_path.exists():
        existing = json.loads(out_path.read_text())
        existing = [e for e in existing if e["criterion"] != criterion + tag]
    existing.append(r)
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=1)
    print("DONE", criterion)


if __name__ == "__main__":
    main()
