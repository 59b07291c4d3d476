"""Short registration training on the real TPU: W_COS vs CD convergence."""
import json, time, dataclasses
import numpy as np
from shwd_tpu.data import DatasetConfig, RegistrationDataset, TransformConfig
from shwd_tpu.losses import SHWDConfig, TransportConfig
from shwd_tpu.train import TrainConfig, Trainer

def run(criterion, epochs):
    cfg = TrainConfig(
        experiment=f"bench_{criterion}",
        log_dir="log",
        criterion=criterion,
        dataset=DatasetConfig(
            source_point_num=128, target_point_num=128, num_synthetic=512,
            cache_dir="modelnet_cache",
            transform=TransformConfig(noise_sigma=0.02)),
        num_epochs=epochs,
        batch_size=128,
        pcr_iteration_num=3,
    )
    tr = Trainer(cfg)
    ds = RegistrationDataset(cfg.dataset, "train")
    t0 = time.perf_counter()
    res = tr.fit(ds, verbose=False)
    dt = time.perf_counter() - t0
    h = res["history"]
    return {
        "criterion": criterion, "epochs": epochs,
        "total_s": dt, "s_per_epoch": dt / epochs,
        "first_rot_error": h[0]["rot_error"],
        "best_rot_error": res["best"]["rot"],
        "best_trans_error": res["best"]["trans"],
        "final_rot_error": h[-1]["rot_error"],
        "final_trans_error": h[-1]["trans_error"],
        "rot_curve_every10": [r["rot_error"] for r in h[::10]],
    }

out = []
for crit, ep in [("w_cos", 300), ("cd", 300)]:
    r = run(crit, ep)
    print(json.dumps(r))
    out.append(r)
json.dump(out, open("benchmarks/registration_tpu.json", "w"), indent=1)
print("DONE")
