"""Wasserstein gradient flow on the cube — the reference's Flow_cube notebook.

Deforms a uniformly-sampled cube-surface cloud into a biased one by gradient
descent on a chosen distance (reference ``Wasserstein_flow_problem/
Flow_cube.ipynb``; methods list mirrors its cell 7). Prints the exact-W2
convergence curve the notebook plots in cell 11.

    python examples/flow_cube.py --method SHWD --iters 400
    python examples/flow_cube.py --method SWD CD SSWD --iters 400
"""

import argparse
# package import: works installed (`pip install -e . --no-build-isolation`)
# or straight from a repo checkout
try:
    import shwd_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import json

import jax

from shwd_tpu.ops.sphere_sampling import sample_cube_surface
from shwd_tpu.train.flow_driver import FlowConfig, run_flow


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", nargs="+", default=["SHWD"],
                    help="any of: SHWD SWD MSWD SSWD SSWD_W1 ASWD DSWD CD W2 "
                         "GSWD_POLY GSWD_POLY3 MGSWD_POLY GSWD_CIRC "
                         "MGSWD_CIRC GSW_NN MGSW_NN")
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--points", type=int, default=1200)
    ap.add_argument("--eval-interval", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="json output path")
    args = ap.parse_args()

    k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed))
    source = sample_cube_surface(k1, args.points)
    target = sample_cube_surface(k2, args.points, biased=True)

    results = {}
    for method in args.method:
        cfg = FlowConfig(method=method, num_iterations=args.iters,
                         eval_interval=args.eval_interval, seed=args.seed,
                         # notebook cell 6 SHWD hyperparameters
                         shwd_layers=5, shwd_lam=0.1, shwd_max_iter=1,
                         shwd_phi_lr=0.001, shwd_phi_wd=0.1)
        res = run_flow(source, target, cfg, verbose=True)
        results[method] = {
            "final_w2": float(res.eval_values[-1]),
            "best_w2": float(res.eval_values.min()),
            "steps_per_second": res.steps_per_second,
            "curve": res.eval_values.tolist(),
        }
        print(f"{method}: final W2 = {results[method]['final_w2']:.2e}  "
              f"({res.steps_per_second:.0f} steps/s)")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
