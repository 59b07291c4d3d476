"""Scaling-efficiency harness: clouds/s at 1 / 2 / ... / N devices.

BASELINE.md's north star asks for clouds/s measured at 1 chip, 1 host and
N>=2 hosts with >=80% scaling efficiency. This harness runs the full W_COS
training step (PCRNet + adversarial SHWD criterion + optimizer update) over
meshes of growing size with the *per-device batch held constant* (weak
scaling — the production regime: more devices, more clouds), and reports

    efficiency(D) = (clouds/s at D devices) / (D * clouds/s at 1 device)

On a virtual CPU mesh (xla_force_host_platform_device_count) the numbers
validate the sharding story (no accidental cross-shard collectives inside
the object-parallel loss); real efficiency requires real chips — run this
same harness on a pod slice via ``python -m shwd_tpu.parallel.scaling``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ScalingPoint:
    devices: int
    clouds_per_second: float
    step_seconds: float
    efficiency: float
    # clouds/s at D devices over clouds/s at 1. On real chips this is the
    # weak-scaling speedup (ideal = D). On a virtual CPU mesh with fewer
    # physical cores than devices the devices serialize, so the ideal is
    # 1.0 — any value well below 1.0 would mean the sharded step added
    # communication/recompute overhead beyond the raw work.
    throughput_ratio: float = 1.0


def _wcos_step_builder(mesh, per_device_batch: int, n_points: int,
                       num_projections: int):
    """Build (step, state, batch) for the flagship W_COS step on ``mesh``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..data.transforms import RegistrationBatch
    from ..losses import SHWDConfig, TransportConfig
    from ..train import TrainConfig, Trainer
    from ..data.dataset import DatasetConfig

    n_dev = int(np.prod([mesh.devices.shape[i]
                         for i in range(mesh.devices.ndim)]))
    batch = per_device_batch * mesh.shape["data"]
    cfg = TrainConfig(
        criterion="w_cos",
        dataset=DatasetConfig(source_point_num=n_points,
                              target_point_num=n_points),
        batch_size=batch, pcr_iteration_num=2,
        shwd=SHWDConfig(
            transport=TransportConfig(cost="geodesic", p=2.0, solver="ssw",
                                      num_projections=num_projections),
            max_iter=1, lam=1e-4, phi_lr=1e-4),
        phi_num_flow_layer=1)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    raw = RegistrationBatch(
        target=jnp.asarray(rng.normal(size=(batch, n_points, 3))
                           .astype(np.float32)),
        source=jnp.asarray(rng.normal(size=(batch, n_points, 3))
                           .astype(np.float32)),
        igt_rotation=jnp.broadcast_to(jnp.eye(3), (batch, 3, 3)),
        igt_translation=jnp.zeros((batch, 3)))

    bsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    batch_sharded = RegistrationBatch(
        *(jax.device_put(getattr(raw, f), bsh) for f in raw._fields))
    state = jax.device_put(state, repl)
    step = jax.jit(trainer._step, static_argnames=("train",))
    return step, state, batch_sharded, batch


def measure_scaling(device_counts: Optional[Sequence[int]] = None,
                    per_device_batch: int = 8, n_points: int = 64,
                    num_projections: int = 32, steps: int = 5,
                    verbose: bool = True) -> list[ScalingPoint]:
    """Weak-scaling sweep over mesh sizes (all devices on the data axis)."""
    from .mesh import make_mesh

    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]

    points: list[ScalingPoint] = []
    base_rate = None
    for d in device_counts:
        mesh = make_mesh(data=d, slices=1, devices=jax.devices()[:d])
        step, state, batch, total_batch = _wcos_step_builder(
            mesh, per_device_batch, n_points, num_projections)
        # warmup / compile
        st, loss = step(state, batch, train=True)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            st, loss = step(st, batch, train=True)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / steps
        rate = total_batch / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d / device_counts[0])
        points.append(ScalingPoint(d, rate, dt, eff, rate / base_rate))
        if verbose:
            print(f"devices={d:3d}  batch={total_batch:4d}  "
                  f"{rate:10.1f} clouds/s  step={dt*1e3:7.2f} ms  "
                  f"efficiency={eff:.2%}  throughput x{rate/base_rate:.2f}")
    return points


if __name__ == "__main__":
    import argparse
    import json
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual-cpu", type=int, default=0,
                    help="force an N-device virtual CPU mesh (this JAX build "
                    "ignores the JAX_PLATFORMS env var; conftest.py note)")
    args = ap.parse_args()
    if args.virtual_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count"
                    f"={args.virtual_cpu}").strip()
        jax.config.update("jax_platforms", "cpu")

    pts = measure_scaling()
    print(json.dumps([dataclasses.asdict(p) for p in pts]))
