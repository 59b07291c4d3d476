"""Op-level residual of the headline train-step configs (VERDICT r4 #5).

After the r4 gather-fix rebuild, ssw_light runs 8.3 ms/step at 3.6% MFU —
this script answers "where do the other 96% go": it captures a
``jax.profiler`` device trace of K chained steps for each config, parses
the XPlane protobuf (TensorFlow is in the image; the tensorboard profile
plugin is not, so the aggregation is first-party) and writes the top ops
by total device time. If the axon tunnel produces no device plane, it
falls back to an ablation table (timing nested subcomputations), clearly
labeled as such.

Usage: python benchmarks/trace_residual.py [ssw_light|hybrid_flagship ...]
Writes benchmarks/trace_residual.json.
"""
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

TOP_K = 14
CHAIN = 12


def parse_xplane(path):
    """xplane.pb -> [(op_name, total_us, count)] over device planes.

    Uses the first-party wire-format reader (``xplane_lite``) — the
    image's TF 2.21 dropped the tensorflow xplane proto module.
    """
    from xplane_lite import parse_xplane_ops
    totals = {}
    for name, ops in parse_xplane_ops(path):
        low = name.lower()
        if "/device:tpu" not in low:
            continue
        for op, (ps, c) in ops.items():
            t, n = totals.get(op, (0.0, 0))
            totals[op] = (t + ps / 1e6, n + c)
    return sorted(((k, v[0], v[1]) for k, v in totals.items()),
                  key=lambda r: -r[1])


def build_step(name):
    from shwd_tpu.data import (DatasetConfig, RegistrationDataset,
                               TransformConfig)
    from shwd_tpu.losses import SHWDConfig, TransportConfig
    from shwd_tpu.train import TrainConfig, Trainer

    spec = {
        "ssw_light": dict(B=128, N=128, solver="ssw", layers=1, pcr=2),
        "hybrid_flagship": dict(B=128, N=128, solver="hybrid", layers=3,
                                pcr=3),
    }[name]
    B, N = spec["B"], spec["N"]
    cfg = TrainConfig(
        criterion="w_cos", batch_size=B,
        dataset=DatasetConfig(
            source_point_num=N, target_point_num=N, num_synthetic=256,
            synthetic_kinds=("composite",), cache_dir="modelnet_cache",
            transform=TransformConfig(noise_sigma=0.02)),
        pcr_iteration_num=spec["pcr"],
        shwd=SHWDConfig(
            transport=TransportConfig(
                cost="lp" if spec["solver"] != "ssw" else "geodesic",
                p=2.0, solver=spec["solver"]),
            max_iter=1, lam=1.3e-5, phi_lr=9.2e-5),
        phi_num_flow_layer=spec["layers"])
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ds = RegistrationDataset(cfg.dataset, "train")
    bank_src = jnp.asarray(ds.sources)
    bank_tgt = jnp.asarray(ds.targets)
    rng = np.random.default_rng(0)

    def chain(key, k_steps=CHAIN):
        idx = jnp.asarray(rng.integers(0, len(ds), size=(k_steps, B)))
        keys = jax.random.split(key, k_steps)
        _, loss = trainer._fused_epoch(state, bank_src, bank_tgt, idx, keys)
        return loss

    return chain


def trace_config(name):
    chain = build_step(name)
    key = jax.random.PRNGKey(7)
    jax.block_until_ready(chain(key))          # compile outside the trace
    row = {"config": name, "chained_steps": CHAIN}
    with tempfile.TemporaryDirectory() as td:
        try:
            with jax.profiler.trace(td):
                jax.block_until_ready(chain(jax.random.fold_in(key, 1)))
            planes = glob.glob(os.path.join(td, "**", "*.xplane.pb"),
                               recursive=True)
            ops = []
            for p in planes:
                ops.extend(parse_xplane(p))
            agg = {}
            for op, us, c in ops:
                t, n = agg.get(op, (0.0, 0))
                agg[op] = (t + us, n + c)
            ops = sorted(((k, v[0], v[1]) for k, v in agg.items()),
                         key=lambda r: -r[1])
            if not ops:
                raise RuntimeError("no device events captured")
            total = sum(r[1] for r in ops)
            row["source"] = "jax.profiler xplane device events"
            row["total_device_us"] = total
            row["top_ops"] = [
                {"op": op, "total_us": round(us, 1), "count": c,
                 "pct": round(100 * us / total, 2)}
                for op, us, c in ops[:TOP_K]]
        except Exception as e:
            row["source"] = (f"ablation fallback ({type(e).__name__}: {e}) — "
                            "jax.profiler produced no parseable device plane")
            row["ablation_note"] = ("single-dispatch timings: each value "
                                    "includes the ~20-30 ms tunnel dispatch "
                                    "floor (compare against pcrnet_fwd_ms as "
                                    "the floor estimate)")
            row["ablation"] = ablation(name)
    return row


def ablation(name):
    """Time nested subcomputations of one step (jitted separately)."""
    from shwd_tpu.data import (DatasetConfig, RegistrationDataset,
                               TransformConfig)
    from shwd_tpu.flows import make_flow
    from shwd_tpu.losses import SHWDConfig, SHWDLoss, TransportConfig
    from shwd_tpu.models import PCRNet
    from shwd_tpu.ops.costs import lp_cost, geodesic_cost
    from shwd_tpu.ops.spherical import sliced_cost_sphere, stiefel_frames

    spec = {
        "ssw_light": dict(B=128, N=128, solver="ssw", layers=1, pcr=2),
        "hybrid_flagship": dict(B=128, N=128, solver="hybrid", layers=3,
                                pcr=3),
    }[name]
    B, N = spec["B"], spec["N"]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, 3))
    y = jax.random.normal(jax.random.fold_in(key, 1), (B, N, 3))

    def timed(fn, *args, reps=5):
        jax.block_until_ready(fn(*args))
        best = 1e18
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    rows = {}
    model = PCRNet()
    params = model.init(key)
    fwd = jax.jit(lambda p, t, s: model.apply(p, t, s, spec["pcr"]).est_R)
    rows["pcrnet_fwd_ms"] = timed(fwd, params, y, x)
    g = jax.jit(jax.grad(
        lambda p: jnp.sum(model.apply(p, y, x, spec["pcr"]).est_R)))
    rows["pcrnet_fwd_bwd_ms"] = timed(g, params)

    flow = make_flow("Residual", spec["layers"])
    crit = SHWDLoss(flow, SHWDConfig(
        transport=TransportConfig(
            cost="lp" if spec["solver"] != "ssw" else "geodesic", p=2.0,
            solver=spec["solver"]),
        max_iter=1, lam=1.3e-5, phi_lr=9.2e-5))
    cstate = crit.init(key)
    app = jax.jit(lambda s, a, b: crit.apply(s, a, b, True)[0][0])
    rows["criterion_fwd_ms"] = timed(app, cstate, x, y)
    gc = jax.jit(jax.grad(
        lambda a: crit.apply(cstate, a, y, True)[0][0]))
    rows["criterion_fwd_bwd_ms"] = timed(gc, x)

    if spec["solver"] == "ssw":
        frames = stiefel_frames(key, 100, 3)
        xs = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        ys = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
        f1 = jax.jit(lambda a, b: sliced_cost_sphere(a, b, frames, p=2.0))
        rows["ssw_kernel_fwd_ms"] = timed(f1, xs, ys)
        f2 = jax.jit(jax.grad(
            lambda a: jnp.sum(sliced_cost_sphere(a, ys, frames, p=2.0))))
        rows["ssw_kernel_fwd_bwd_ms"] = timed(f2, xs)
    else:
        from shwd_tpu.ops.auction import hybrid_emd2
        c = lp_cost(x, y, 2.0)
        rows["hybrid_fwd_ms"] = timed(
            jax.jit(lambda c: jnp.sum(hybrid_emd2(c, 1e-7, 5e-3, 50, 4))), c)
    return rows


def main():
    only = sys.argv[1:] or ["ssw_light", "hybrid_flagship"]
    out_rows = [trace_config(n) for n in only]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "trace_residual.json")
    prev = []
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f).get("rows", [])
    merged = {r["config"]: r for r in prev}
    for r in out_rows:
        merged[r["config"]] = r
    with open(path, "w") as f:
        json.dump({"device": str(jax.devices()[0]),
                   "rows": list(merged.values())}, f, indent=1)
    print(json.dumps(out_rows, indent=1)[:4000])
    print("wrote", path)


if __name__ == "__main__":
    main()
