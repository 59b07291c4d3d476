"""W_COS train-step throughput (clouds/s) on the real chip, canonical config."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp
from shwd_tpu.data.transforms import RegistrationBatch
from shwd_tpu.losses import SHWDConfig, TransportConfig
from shwd_tpu.train import TrainConfig, Trainer
from shwd_tpu.data import DatasetConfig

B, N = 128, 128
rng = np.random.default_rng(0)

for solver in ("sinkhorn", "hybrid", "ssw"):
    cfg = TrainConfig(
        criterion="w_cos", batch_size=B,
        dataset=DatasetConfig(source_point_num=N, target_point_num=N),
        pcr_iteration_num=3,
        shwd=SHWDConfig(transport=TransportConfig(cost="lp", p=2.0,
                                                  solver=solver),
                        max_iter=1, lam=1.3e-5, phi_lr=9.2e-5),
        phi_num_flow_layer=3)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    def batchgen():
        return RegistrationBatch(
            target=jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32)),
            source=jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32)),
            igt_rotation=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
            igt_translation=jnp.zeros((B, 3)))
    state, loss = trainer._train_step(state, batchgen(), train=True)
    jax.block_until_ready(loss)
    times = []
    for _ in range(5):
        batch = batchgen(); jax.block_until_ready(batch.source)
        t0 = time.perf_counter()
        state, loss = trainer._train_step(state, batch, train=True)
        _ = float(loss)
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"solver={solver}: {t*1e3:.1f} ms/step = {B/t:.0f} clouds/s")
