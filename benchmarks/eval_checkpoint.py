"""test_ERROR parity run: success-ratio curves from a trained checkpoint.

Reference: ``test_ERROR.py`` sweeps the rotation threshold 0..180 deg (181
full test passes) and translation 0..1 (:247-268) and pickles the curves.
Here ``shwd_tpu.train.evaluate`` collects per-sample errors in ONE pass and
broadcasts the thresholds; this script runs it against a trained experiment
and commits the curves.

Usage: python benchmarks/eval_checkpoint.py [experiment=bench_w_cos]
Writes benchmarks/eval_<experiment>.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from shwd_tpu.train import TrainConfig
from shwd_tpu.train.evaluate import evaluate

experiment = sys.argv[1] if len(sys.argv) > 1 else "bench_w_cos"
log_dir = os.path.join("log", experiment)
cfg = TrainConfig.load(os.path.join(log_dir, "config.json"))

res = evaluate(cfg, checkpoint=os.path.join(log_dir, "models",
                                            "best_rot_error_snap"),
               split="test")

out = {
    "experiment": experiment,
    "criterion": cfg.criterion,
    "split": "test",
    "n_samples": int(res.per_sample_rot.size),
    "mean_rot_error_deg": res.mean_rot_error,
    "mean_trans_error": res.mean_trans_error,
    "rot_thresholds_deg": res.rot_thresholds[::5].tolist(),
    "rot_success_ratio": res.rot_success_ratio[::5].tolist(),
    "trans_thresholds": res.trans_thresholds[::5].tolist(),
    "trans_success_ratio": res.trans_success_ratio[::5].tolist(),
}
here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(here, f"eval_{experiment}.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: v for k, v in out.items()
                  if not isinstance(v, list)}))
