"""Short max_ssw tuning probes on the real TPU (VERDICT r2 #3).

Each variant trains 30 epochs on the registration bench config and prints
its rot-error trajectory; the winner gets the full 100-epoch run recorded
in benchmarks/registration_tpu.json. w_cos reaches ~21 deg at epoch 30.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys
import time

from shwd_tpu.data import DatasetConfig, RegistrationDataset, TransformConfig
from shwd_tpu.losses.ssw_loss import MaxSSWConfig
from shwd_tpu.train import TrainConfig, Trainer

VARIANTS = {
    "A_mlp_lr1e-2_it10": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=100, max_iter=10, phi_lr=0.01)),
    "B_mlp_lr5e-3_it5": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=100, max_iter=5, phi_lr=0.005)),
    "C_enc_lr5e-3_it5": dict(chart="encoder_flow", cfg=MaxSSWConfig(
        num_projections=100, max_iter=5, phi_lr=0.005)),
    "D_mlp_lr1e-2_it10_L200": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=200, max_iter=10, phi_lr=0.01)),
    # old round-2 settings for the record (shwd-borrowed knobs)
    "E_old_lr9e-5_it1": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=100, max_iter=1, phi_lr=9.2e-5)),
    # batch 2: the aggressive adversary destabilizes registration (A-D all
    # worse than E) -> gentler/frozen charts + projection-variance reduction
    "F_mlp_lr1e-3_it1": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=100, max_iter=1, phi_lr=1e-3)),
    "G_mlp_frozen_L256": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=256, max_iter=0, phi_lr=1e-3)),
    "H_mlp_lr9e-5_L256": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=256, max_iter=1, phi_lr=9.2e-5)),
    "I_enc_mb32_lr1e-4": dict(chart="encoder_flow", cfg=MaxSSWConfig(
        num_projections=100, max_iter=1, phi_lr=1e-4, minibatch=32)),
    # batch 3 (r4, VERDICT #8): sweep projections + chart AT the winning lr
    # (9.2e-5, variant E/H family) — the SSW kernel rebuild made large L
    # cheap (8.3 ms/step at L=100), so projection-variance reduction is now
    # nearly free
    "J_mlp_lr9e-5_L512": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=512, max_iter=1, phi_lr=9.2e-5)),
    "K_enc_lr9e-5_it1": dict(chart="encoder_flow", cfg=MaxSSWConfig(
        num_projections=100, max_iter=1, phi_lr=9.2e-5)),
    "L_mlp_lr3e-4_L256": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=256, max_iter=1, phi_lr=3e-4)),
    # batch 4 (r5, VERDICT r4 #4): the L=512 winner buys rotation by giving
    # up translation 20x (held-out trans 0.084 vs 0.003-0.006 elsewhere).
    # Hypothesis: the chart ascent erases translation-relevant signal, and
    # more projections amplify the adversary. Sweep the adversary strength
    # at L=512 with BOTH errors in the acceptance (combined score below).
    "M_mlp_lr3e-5_L512": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=512, max_iter=1, phi_lr=3e-5)),
    "O_mlp_frozen_L512": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=512, max_iter=0, phi_lr=9.2e-5)),
    "P_mlp_lr9e-5_L512_p1": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=512, max_iter=1, phi_lr=9.2e-5, p=1.0)),
    "Q_mlp_lr9e-5_L512_mb32": dict(chart="mlp", cfg=MaxSSWConfig(
        num_projections=512, max_iter=1, phi_lr=9.2e-5, minibatch=32)),
}


def run(name, chart, mcfg, epochs):
    cfg = TrainConfig(
        experiment=f"probe_{name}", log_dir="log",
        criterion="max_ssw", max_ssw_chart=chart, max_ssw=mcfg,
        dataset=DatasetConfig(
            source_point_num=128, target_point_num=128, num_synthetic=2048,
            synthetic_kinds=("composite",), cache_dir="modelnet_cache",
            transform=TransformConfig(noise_sigma=0.02)),
        num_epochs=epochs, batch_size=128, pcr_iteration_num=3)
    tr = Trainer(cfg)
    ds = RegistrationDataset(cfg.dataset, "train")
    t0 = time.perf_counter()
    res = tr.fit(ds, verbose=False)
    dt = time.perf_counter() - t0
    h = res["history"]
    # combined acceptance (VERDICT r4 #4): rot AND trans on the SAME epoch —
    # 100x weight makes 0.02 trans worth 2 deg rot
    combined = min(r["rot_error"] + 100 * r["trans_error"] for r in h)
    row = {"variant": name, "epochs": epochs, "s_per_epoch": dt / epochs,
           "best_rot": res["best"]["rot"], "final_rot": h[-1]["rot_error"],
           "best_trans": res["best"]["trans"],
           "final_trans": h[-1]["trans_error"],
           "best_combined_rot_plus_100trans": combined,
           "rot_curve_every5": [r["rot_error"] for r in h[::5]],
           "trans_curve_every5": [r["trans_error"] for r in h[::5]]}
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    only = set(sys.argv[2:])
    for name, v in VARIANTS.items():
        if only and name not in only:
            continue
        run(name, v["chart"], v["cfg"], epochs)
