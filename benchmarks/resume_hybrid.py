"""Extend the 2000-epoch hybrid flagship from its best-rot checkpoint.

Usage: python benchmarks/resume_hybrid.py [total_epochs=2500]
Updates the w_cos_128_hybrid row + held-out eval if the run improves.
"""
import dataclasses as dc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shwd_tpu.data import RegistrationDataset
from shwd_tpu.train import TrainConfig, Trainer
from shwd_tpu.train.evaluate import evaluate

total = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
exp = "bench_w_cos_128_hybrid"
cfg = TrainConfig.load(f"log/{exp}/config.json")
cfg = dc.replace(cfg, num_epochs=total,
                 load_model=f"log/{exp}/models/best_rot_error_snap")
tr = Trainer(cfg)
ds = RegistrationDataset(cfg.dataset, "train")
res = tr.fit(ds, verbose=True)
print("resume best:", {k: float(v) for k, v in res["best"].items()}, flush=True)

ev = evaluate(cfg, checkpoint=f"log/{exp}/models/best_rot_error_snap",
              split="test")
print(json.dumps({"held_out_rot": ev.mean_rot_error,
                  "held_out_trans": ev.mean_trans_error}), flush=True)

p = "benchmarks/registration_tpu.json"
rows = json.load(open(p))
for r in rows:
    if r["criterion"] == "w_cos_128_hybrid":
        if float(res["best"]["rot"]) < r["best_rot_error"]:
            r["best_rot_error"] = float(res["best"]["rot"])
            r["best_trans_error"] = min(r["best_trans_error"],
                                        float(res["best"]["trans"]))
            r["resumed_to_epoch"] = total
            r["held_out_after_resume_rot"] = ev.mean_rot_error
            r["held_out_after_resume_trans"] = ev.mean_trans_error
            ep = "benchmarks/eval_bench_w_cos_128_hybrid.json"
            d = json.load(open(ep))
            d.update({"mean_rot_error_deg": ev.mean_rot_error,
                      "mean_trans_error": ev.mean_trans_error,
                      "checkpoint_epochs": total})
            json.dump(d, open(ep, "w"), indent=1)
            print("IMPROVED", flush=True)
        else:
            print("KEPT (no improvement over the 2000-epoch row)", flush=True)
json.dump(rows, open(p, "w"), indent=1)
print("DONE resume_hybrid")
