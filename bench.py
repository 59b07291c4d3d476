"""Benchmark: SHWD gradient-flow throughput at reference accuracy.

Times the Flow_cube workload (1200-point clouds, Residual flow x5, lam 0.1,
inner max_iter 1 — Flow_cube.ipynb cell 6) with the solver configuration
whose accuracy matches the reference: the on-device 'hybrid' exact-EMD path
(annealed-Sinkhorn duals + warm-started auction). The reference reaches
final exact-W2 7.1e-4 at ~0.687 s per SHWD iteration on its own hardware
(cell 8 stored outputs; BASELINE.md). ``vs_baseline`` is the speedup of one
full SHWD flow step (inner adversarial phi update + outer point gradient);
``final_w2`` is the co-reported accuracy so the speed claim is only valid
when the run also converges (<= 1e-3).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "final_w2": N, ...}
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SECONDS_PER_ITER = 0.687  # Flow_cube SHWD: 3.435 s / 5 iters
REFERENCE_FINAL_W2 = 7.1e-4         # Flow_cube.ipynb cell 8


def registration_step_metric():
    """W_COS train-step throughput at the canonical registration config
    (B=128, N=128, hybrid exact-EMD solver, 3 flow layers, pcr 3) — the
    BASELINE.md north-star 'clouds/s' number, co-emitted so the driver
    artifact carries it (VERDICT r4 #6). Chain-slope timing discipline from
    benchmarks/throughput_1chip.py (amortized device time)."""
    import time

    import jax
    import jax.numpy as jnp

    from shwd_tpu.data import (DatasetConfig, RegistrationDataset,
                               TransformConfig)
    from shwd_tpu.losses import SHWDConfig, TransportConfig
    from shwd_tpu.train import TrainConfig, Trainer
    from shwd_tpu.utils.flops import wcos_train_step_flops
    from shwd_tpu.utils.profiling import mfu

    B, N = 128, 128
    cfg = TrainConfig(
        criterion="w_cos", batch_size=B,
        dataset=DatasetConfig(
            source_point_num=N, target_point_num=N, num_synthetic=256,
            synthetic_kinds=("composite",), cache_dir="modelnet_cache",
            transform=TransformConfig(noise_sigma=0.02)),
        pcr_iteration_num=3,
        shwd=SHWDConfig(
            transport=TransportConfig(cost="lp", p=2.0, solver="hybrid"),
            max_iter=1, lam=1.3e-5, phi_lr=9.2e-5),
        phi_num_flow_layer=3)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ds = RegistrationDataset(cfg.dataset, "train")
    bank_src = jnp.asarray(ds.sources)
    bank_tgt = jnp.asarray(ds.targets)
    rng = np.random.default_rng(0)
    ks = (4, 10)

    def chain(k_steps, key):
        idx = jnp.asarray(rng.integers(0, len(ds), size=(k_steps, B)))
        keys = jax.random.split(key, k_steps)
        return trainer._fused_epoch(state, bank_src, bank_tgt, idx, keys)

    key = jax.random.PRNGKey(1)
    for k in ks:
        key, kk = jax.random.split(key)
        _, loss = chain(k, kk)
        jax.block_until_ready(loss)
    best = {k: 1e18 for k in ks}
    for _ in range(2):
        for k in ks:
            key, kk = jax.random.split(key)
            t0 = time.perf_counter()
            _, loss = chain(k, kk)
            _ = float(loss)
            best[k] = min(best[k], time.perf_counter() - t0)
    step_s = (best[ks[1]] - best[ks[0]]) / (ks[1] - ks[0])
    tp = cfg.shwd.transport
    flops_step = wcos_train_step_flops(
        B, N, pcr_iterations=3, layers=3, solver="hybrid",
        num_projections=tp.num_projections, sink_iters=tp.num_iters,
        sink_scales=tp.num_scales, auction_sweeps=128, max_iter=1)
    util = mfu(flops_step, step_s)
    return {
        "registration_metric": "w_cos_train_step_B128_N128_hybrid",
        "registration_clouds_per_second": B / step_s,
        "registration_ms_per_step": step_s * 1e3,
        "registration_mfu": util["mfu"],
    }


def main():
    import jax

    from shwd_tpu.ops.sphere_sampling import sample_cube_surface
    from shwd_tpu.train.flow_driver import FlowConfig, run_flow

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n_points = 1200
    source = sample_cube_surface(k1, n_points)
    target = sample_cube_surface(k2, n_points, biased=True)

    # the accuracy-proven config (benchmarks/results_cube.json: SHWD/hybrid
    # final W2 5.9e-4 vs reference 7.1e-4)
    cfg = FlowConfig(
        method="SHWD", num_iterations=400, eval_interval=50,
        num_projections=100, shwd_layers=5, shwd_lam=0.1, shwd_max_iter=1,
        shwd_phi_lr=0.001, shwd_phi_wd=0.1, shwd_solver="hybrid", seed=0)

    res = run_flow(source, target, cfg)   # default eval_fn = exact W2

    from shwd_tpu.utils.flops import flow_step_flops
    from shwd_tpu.utils.profiling import mfu

    sec_per_iter = float(np.mean(res.interval_seconds)) / cfg.eval_interval
    # analytic model FLOPs (utils/flops.py): XLA cost_analysis undercounts
    # while/scan bodies (counts each op once, not per trip)
    flops_step = flow_step_flops(
        n_points, layers=cfg.shwd_layers, solver=cfg.shwd_solver,
        max_iter=cfg.shwd_max_iter, sink_iters=cfg.hybrid_warmup_iters,
        sink_scales=cfg.hybrid_warmup_scales, auction_sweeps=128,
        num_projections=cfg.num_projections)
    util = mfu(flops_step, sec_per_iter)
    result = {
        "metric": "shwd_flow_step_time_1200pts",
        "value": res.steps_per_second,
        "unit": "steps/s",
        "vs_baseline": REFERENCE_SECONDS_PER_ITER / sec_per_iter,
        "final_w2": float(res.eval_values[-1]),
        "best_w2": float(np.min(res.eval_values)),
        "reference_final_w2": REFERENCE_FINAL_W2,
        "seconds_per_iter": sec_per_iter,
        "reference_seconds_per_iter": REFERENCE_SECONDS_PER_ITER,
        "solver": cfg.shwd_solver,
        "device": str(jax.devices()[0]),
        **util,
    }
    # co-emit the registration-train-step headline (VERDICT r4 #6); the
    # flow metric stays the primary value/vs_baseline pair
    try:
        result.update(registration_step_metric())
    except Exception as e:              # never lose the flow metric
        result["registration_metric_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
