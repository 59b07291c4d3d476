"""Benchmark: SHWD loss-eval throughput on the Flow_cube configuration.

Measures what BASELINE.md defines as the headline: sliced/spherical
Wasserstein loss evaluations per second on the gradient-flow workload
(1200-point clouds, the notebook's SHWD config — Residual flow x5, lam 0.1,
inner max_iter 1). The reference runs ~0.69 s per SHWD iteration on its CPU
(Flow_cube.ipynb cell 8 stored outputs; BASELINE.md); ``vs_baseline`` is the
speedup of one full SHWD gradient-flow step (inner adversarial phi update +
outer point gradient) against that number.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SECONDS_PER_ITER = 0.687  # Flow_cube SHWD: 3.435 s / 5 iters


def main():
    import jax
    import jax.numpy as jnp

    from shwd_tpu.ops.sphere_sampling import sample_cube_surface
    from shwd_tpu.train.flow_driver import FlowConfig, run_flow

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n_points = 1200
    source = sample_cube_surface(k1, n_points)
    target = sample_cube_surface(k2, n_points, biased=True)

    cfg = FlowConfig(
        method="SHWD", num_iterations=100, eval_interval=25,
        num_projections=100, shwd_layers=5, shwd_lam=0.1, shwd_max_iter=1,
        shwd_phi_lr=0.001, shwd_phi_wd=0.1, shwd_solver="ssw", seed=0)

    # skip exact-W2 eval cost inside the timed loop (eval runs between
    # intervals and is excluded from interval_seconds by construction, but a
    # cheap eval keeps total wall time low)
    res = run_flow(source, target, cfg,
                   eval_fn=lambda p, t: 0.0)

    sec_per_iter = float(np.mean(res.interval_seconds)) / cfg.eval_interval
    result = {
        "metric": "shwd_flow_step_time_1200pts",
        "value": res.steps_per_second,
        "unit": "steps/s",
        "vs_baseline": REFERENCE_SECONDS_PER_ITER / sec_per_iter,
        "seconds_per_iter": sec_per_iter,
        "reference_seconds_per_iter": REFERENCE_SECONDS_PER_ITER,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
