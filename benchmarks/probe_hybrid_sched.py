"""Time the SHWD cube flow under different hybrid warm-up schedules.

The hybrid exact-EMD solver = annealed-Sinkhorn dual warm-up + auction
cleanup; the permutation is exact regardless of the warm-up depth, which
only trades logsumexp time against auction sweeps. Round-2 tuning settled
on (iters=100, scales=8) measured best overall; this probe re-checks the
frontier on the full 400-iter flow (the headline bench workload), since
most of the flow runs with *close* clouds where shallow warm-ups may win.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys
import time

import jax
import numpy as np

from shwd_tpu.ops.sphere_sampling import sample_cube_surface
from shwd_tpu.train.flow_driver import FlowConfig, run_flow

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
source = sample_cube_surface(k1, 1200)
target = sample_cube_surface(k2, 1200, biased=True)

SCHEDULES = [(25, 8), (35, 8), (40, 8), (60, 8)]
iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400

for warm_iters, warm_scales in SCHEDULES:
    cfg = FlowConfig(
        method="SHWD", num_iterations=iters, eval_interval=50,
        num_projections=100, shwd_layers=5, shwd_lam=0.1, shwd_max_iter=1,
        shwd_phi_lr=0.001, shwd_phi_wd=0.1, shwd_solver="hybrid",
        hybrid_warmup_iters=warm_iters, hybrid_warmup_scales=warm_scales,
        seed=0)
    res = run_flow(source, target, cfg)
    sec = float(np.mean(res.interval_seconds)) / cfg.eval_interval
    print(json.dumps({
        "warmup": [warm_iters, warm_scales],
        "seconds_per_iter": sec,
        "steps_per_second": res.steps_per_second,
        "final_w2": float(res.eval_values[-1]),
        "best_w2": float(np.min(res.eval_values)),
    }), flush=True)
