"""Probe: auction sweep counts with phase-persistent assignments (r5).

Sweeps eps0 and scale_factor for the warm-started auction at the flagship
config, both misalignment regimes, and checks exactness of each variant
against the C++ network-simplex oracle on a subsample.

Usage: python benchmarks/probe_auction_eps0.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.profile_hybrid import make_costs, bench
from shwd_tpu.ops import auction as auc
from shwd_tpu.ops.sinkhorn import emd2_approx


def main():
    rows = []
    for name, c in [("deg45", make_costs(45.0)), ("deg3", make_costs(3.0))]:
        c_range = float(jnp.max(c) - jnp.min(c))
        _, f, g = emd2_approx(c, eps=5e-3, num_iters=50, num_scales=4,
                              return_potentials=True)
        prices0 = -g
        # oracle on first 8 items
        from shwd_tpu.ops.emd_exact import emd2_exact_batch
        oracle = emd2_exact_batch(np.asarray(c[:8], np.float64))
        for eps0 in [c_range * 1e-4, 5e-3, 2e-2, c_range / 32]:
            for sf in [6.0, 16.0]:
                t, (assign, prices, sweeps) = bench(
                    lambda c, p0: auc.auction_assignment(
                        c, 1e-7, scale_factor=sf, max_sweeps=4000,
                        prices0=p0, eps0=eps0),
                    c, prices0)
                vals = np.asarray(auc._assignment_cost(c, assign))
                err = float(np.max(np.abs(vals[:8] - oracle)))
                rows.append({"case": name, "eps0": float(eps0),
                             "scale_factor": sf, "ms": t * 1e3,
                             "sweeps": int(sweeps),
                             "max_abs_err_vs_simplex": err})
                print(json.dumps(rows[-1]), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe_auction_eps0.json")
    with open(out, "w") as fo:
        json.dump(rows, fo, indent=1)


if __name__ == "__main__":
    main()
