"""Time SHWD flow solvers head-to-head on the real TPU (cube workload).

Compares the cold 'hybrid' exact-EMD path (annealed-Sinkhorn duals + cold
auction per call) against 'hybrid_warm' (persistent duals: per step only
CS-violating persons re-auction). Both produce exact EMD values; the test
suite asserts identical flow trajectories (tests/test_exact_solvers.py:136).

Usage: python benchmarks/warm_timing.py [iters]
Writes benchmarks/warm_timing.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from shwd_tpu.ops.sphere_sampling import sample_cube_surface
from shwd_tpu.train.flow_driver import FlowConfig, run_flow

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400

# reference CPU timing for the SHWD cube flow, measured once and recorded in
# BENCH_r02.json / BASELINE.md ("reference_seconds_per_iter": 0.687)
REF_SEC_PER_ITER_BENCH_R02 = 0.687

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
source = sample_cube_surface(k1, 1200)
target = sample_cube_surface(k2, 1200, biased=True)

rows = []
# two regimes: the adversarial training loop (max_iter=1 phi updates shift
# the embedded clouds every step — heavy dual drift) and the frozen-phi /
# eval-mode loop (max_iter=0: only the small point-Adam motion perturbs the
# transport problem between calls — the persistent-dual solver's home turf)
for regime, max_iter in (("adversarial", 1), ("eval_mode", 0)):
    for solver in ("hybrid", "hybrid_warm"):
        cfg = FlowConfig(
            method="SHWD", num_iterations=iters, eval_interval=50,
            num_projections=100, shwd_layers=5, shwd_lam=0.1,
            shwd_max_iter=max_iter,
            shwd_phi_lr=0.001, shwd_phi_wd=0.1, shwd_solver=solver, seed=0)
        res = run_flow(source, target, cfg)
        sec = float(np.mean(res.interval_seconds)) / cfg.eval_interval
        row = {
            "regime": regime,
            "solver": solver,
            "seconds_per_iter": sec,
            "steps_per_second": res.steps_per_second,
            "final_w2": float(res.eval_values[-1]),
            "best_w2": float(np.min(res.eval_values)),
            "vs_reference": REF_SEC_PER_ITER_BENCH_R02 / sec,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "warm_timing.json")
with open(out, "w") as f:
    json.dump({"device": str(jax.devices()[0]), "iters": iters,
               "rows": rows}, f, indent=1)
