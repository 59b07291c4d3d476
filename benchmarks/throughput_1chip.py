"""Single-chip W_COS train-step throughput across configs (clouds/s).

VERDICT r2 #5: the BASELINE clouds/s report must cover the flagship
exact-EMD configuration, not only the cheapest SSW config. Rows:

- ssw_light:      the round-2 headline config (SSW solver, 1 flow layer,
                  pcr_iters 2) — the fastest production step
- hybrid_flagship: the accuracy-proven exact-EMD path at the canonical
                  registration config (hybrid solver, 3 flow layers,
                  pcr_iters 3 — train_RUNNER.py:369-391 scale)
- ssw_1024 / hybrid_1024: ModelNet eval scale (N=1024 points,
                  test_ERROR.py:239-240)

Timing discipline: fresh input buffers every call + scalar loss readback
(the tunnel memoizes repeated executions on identical buffers); min of 5.

Usage: python benchmarks/throughput_1chip.py
Writes benchmarks/scaling_tpu_1chip.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shwd_tpu.data import DatasetConfig
from shwd_tpu.data.transforms import RegistrationBatch
from shwd_tpu.losses import SHWDConfig, TransportConfig
from shwd_tpu.train import TrainConfig, Trainer

ROWS = [
    ("ssw_light", dict(B=128, N=128, solver="ssw", layers=1, pcr=2)),
    ("hybrid_flagship", dict(B=128, N=128, solver="hybrid", layers=3, pcr=3)),
    ("ssw_1024", dict(B=32, N=1024, solver="ssw", layers=1, pcr=2)),
    ("hybrid_1024", dict(B=32, N=1024, solver="hybrid", layers=3, pcr=3)),
]


def run(name, B, N, solver, layers, pcr):
    cfg = TrainConfig(
        criterion="w_cos", batch_size=B,
        dataset=DatasetConfig(source_point_num=N, target_point_num=N),
        pcr_iteration_num=pcr,
        shwd=SHWDConfig(
            transport=TransportConfig(
                cost="lp" if solver != "ssw" else "geodesic", p=2.0,
                solver=solver),
            max_iter=1, lam=1.3e-5, phi_lr=9.2e-5),
        phi_num_flow_layer=layers)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def batchgen():
        return RegistrationBatch(
            target=jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32)),
            source=jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32)),
            igt_rotation=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
            igt_translation=jnp.zeros((B, 3)))

    state, loss = trainer._train_step(state, batchgen(), train=True)
    jax.block_until_ready(loss)           # compile outside the timed region
    times = []
    for _ in range(5):
        batch = batchgen()
        jax.block_until_ready(batch.source)
        t0 = time.perf_counter()
        state, loss = trainer._train_step(state, batch, train=True)
        _ = float(loss)                   # scalar readback = full sync
        times.append(time.perf_counter() - t0)
    t = min(times)
    row = {"config": name, "batch": B, "points": N, "solver": solver,
           "flow_layers": layers, "pcr_iters": pcr,
           "ms_per_step": t * 1e3, "clouds_per_second": B / t}
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = [run(name, **kw) for name, kw in ROWS]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scaling_tpu_1chip.json")
    with open(out, "w") as f:
        json.dump({
            "device": str(jax.devices()[0]),
            "workload": "W_COS train step (PCRNet + adversarial SHWD)",
            "rows": rows,
        }, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
