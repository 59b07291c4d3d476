"""Decompose the hybrid exact-EMD step at the flagship config (VERDICT r4 #1).

The r4 scaling row puts the W_COS hybrid train step at 621 ms (B=128,
N=128). One train step performs TWO hybrid solves (inner adversarial grad +
final undetached forward). This script times each stage of ONE solve on
representative cost matrices from the composite bank — both the early-
training regime (45-degree misalignment) and the late-training regime
(near-aligned clouds, the near-tie case that stresses the auction) — and
then sweeps the knobs: Sinkhorn warm-up schedule, auction scale_factor,
eps_final, and assignment persistence across eps phases.

Usage: python benchmarks/profile_hybrid.py [quick]
Writes benchmarks/profile_hybrid.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shwd_tpu.data import DatasetConfig, RegistrationDataset, TransformConfig
from shwd_tpu.data.transforms import make_registration_batch
from shwd_tpu.ops.costs import lp_cost
from shwd_tpu.ops.sinkhorn import emd2_approx
from shwd_tpu.ops import auction as auc

B, N = 128, 128


def make_costs(angle_deg: float, key=0):
    """(B, N, N) lp p=2 costs between target and posed source, centered —
    the exact matrix SHWDLoss hands the solver at epoch 0 (phi ~ identity)."""
    cfg = DatasetConfig(
        source_point_num=N, target_point_num=N, num_synthetic=256,
        synthetic_kinds=("composite",), cache_dir="modelnet_cache",
        transform=TransformConfig(noise_sigma=0.02, angle_range_deg=angle_deg))
    ds = RegistrationDataset(cfg, "train")
    k = jax.random.PRNGKey(key)
    idx = jax.random.randint(k, (B,), 0, len(ds))
    batch = make_registration_batch(
        jax.random.fold_in(k, 1), jnp.asarray(ds.targets)[idx],
        jnp.asarray(ds.sources)[idx], cfg.transform)
    src = batch.source - jnp.mean(batch.source, axis=1, keepdims=True)
    tgt = batch.target - jnp.mean(batch.target, axis=1, keepdims=True)
    return lp_cost(tgt, src, 2.0)


def bench(fn, *args, reps=5, **kw):
    out = jax.block_until_ready(fn(*args, **kw))
    best = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    quick = "quick" in sys.argv[1:]
    results = {"device": str(jax.devices()[0]), "B": B, "N": N, "stages": {}}

    costs = {"deg45": make_costs(45.0), "deg3": make_costs(3.0)}
    for name, c in costs.items():
        results["stages"][name] = {}
        r = results["stages"][name]
        c_range = float(jnp.max(c) - jnp.min(c))
        r["cost_range"] = c_range

        # 1. Sinkhorn warm-up schedules (XLA path at this size)
        for (it, sc, eps) in [(50, 4, 5e-3), (50, 4, 1e-5), (30, 3, 1e-4),
                              (20, 3, 1e-4), (100, 8, 1e-5)]:
            t, (v, f, g) = bench(
                lambda c: emd2_approx(c, eps=eps, num_iters=it, num_scales=sc,
                                      return_potentials=True), c)
            r[f"warmup_it{it}_sc{sc}_eps{eps:g}"] = {"ms": t * 1e3}

        # 2. auction from the trainer's warm duals (eps=5e-3 schedule, as
        #    transport.py passes cfg.eps) and from sharp duals (1e-5)
        for weps, wit, wsc in [(5e-3, 50, 4), (1e-5, 50, 4)]:
            _, f, g = emd2_approx(c, eps=weps, num_iters=wit, num_scales=wsc,
                                  return_potentials=True)
            prices0 = -g
            eps0 = max(c_range * 1e-4, 1e-6)
            t, (assign, prices, sweeps) = bench(
                lambda c, p0: auc.auction_assignment(
                    c, 1e-7, max_sweeps=4000, prices0=p0, eps0=eps0),
                c, prices0)
            r[f"auction_from_warm{weps:g}"] = {
                "ms": t * 1e3, "sweeps": int(sweeps),
                "eps0": eps0,
                "phases": int(np.ceil(np.log(eps0 / 1e-7) / np.log(6.0))) + 1}

        # 3. full hybrid fwd and fwd+bwd (trainer schedule)
        t, v = bench(lambda c: auc.hybrid_emd2(c, 1e-7, 5e-3, 50, 4), c)
        r["hybrid_fwd"] = {"ms": t * 1e3}
        grad_fn = jax.jit(jax.grad(lambda c: jnp.mean(
            auc.hybrid_emd2(c, 1e-7, 5e-3, 50, 4))))
        t, _ = bench(grad_fn, c)
        r["hybrid_fwd_bwd"] = {"ms": t * 1e3}

        # 4. per-phase decomposition (manual eps ladder, cold assignments
        #    each phase = current behavior)
        if not quick:
            _, f, g = emd2_approx(c, eps=5e-3, num_iters=50, num_scales=4,
                                  return_potentials=True)
            prices = -g
            eps0 = max(c_range * 1e-4, 1e-6)
            ladder, e = [], eps0
            while e > 1e-7:
                ladder.append(max(e, 1e-7))
                e /= 6.0
            ladder.append(1e-7)
            phase_rows = []
            phase_fn = jax.jit(lambda c, p, e: auc._auction_phase(
                c, p, e, 4000))
            for e in ladder:
                t, (assign, prices, sw) = bench(
                    phase_fn, c, prices, jnp.float32(e), reps=3)
                phase_rows.append({"eps": e, "ms": t * 1e3,
                                   "sweeps": int(sw)})
            r["phase_ladder_cold_assign"] = phase_rows

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_hybrid.json")
    with open(out, "w") as fo:
        json.dump(results, fo, indent=1)
    print(json.dumps(results, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
