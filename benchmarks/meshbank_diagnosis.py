"""Meshbank accuracy-gap diagnosis (VERDICT r4 #2).

The production OFF-chain run lands ~7x worse than the synthetic-bank
headline. This script decides between the two candidate explanations:

- *pose ambiguity*: some bank families have near-symmetries, so a "wrong"
  rotation is actually a second global minimum of the shape-distance;
- *training deficiency*: the model is simply under-fit on this bank.

Method: evaluate the trained checkpoint over the held-out mesh split with K
independent pose draws per mesh; break errors down per family (labels come
from the npz cache the run trained on); and for every failed sample
(rot err > 10 deg) compute an **ambiguity score**: the residual rotation
E = R_gt . R_est is applied to the target cloud and the chamfer distance
chamfer(target, target @ E) is normalized by the median chamfer under
random rotations. Score << 1 means E is a near-symmetry of that shape —
the error is a second minimum, not a registration failure. (Reference
counterpart: the eval harness itself, test_ERROR.py:54-91, which has no
such breakdown; this tool is diagnosis-only.)

Usage: python benchmarks/meshbank_diagnosis.py [experiment] [K]
Writes benchmarks/meshbank_diagnosis.json.
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shwd_tpu.data.transforms import make_registration_batch
from shwd_tpu.models import PCRNet
from shwd_tpu.ops.chamfer import chamfer_directional
from shwd_tpu.ops.quaternion import rotation_error_deg, translation_error
from shwd_tpu.train import TrainConfig, Trainer
from shwd_tpu.train.trainer import _mean_subtract
from shwd_tpu.utils.checkpoint import load_checkpoint

EXP = sys.argv[1] if len(sys.argv) > 1 else "meshbank_w_cos_128"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
FAIL_DEG = 10.0


def main():
    log_dir = Path("log") / EXP
    cfg = TrainConfig.load(log_dir / "config.json")
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = load_checkpoint(log_dir / "models" / "best_rot_error_snap",
                               state)

    n = cfg.dataset.source_point_num
    npz = np.load(Path(cfg.dataset.cache_dir) / f"modelnet10_{n}_test.npz")
    clouds = jnp.asarray(npz["clouds"])            # (M, N, 3)
    labels = npz["labels"]
    classes = [str(c) for c in npz["classes"]]
    m = clouds.shape[0]
    print(f"{EXP}: {m} test meshes x {K} poses, families={classes}",
          flush=True)

    @jax.jit
    def step(state, batch):
        source, target, translation = _mean_subtract(batch)
        out = trainer.model.apply(state.params, target, source,
                                  cfg.pcr_iteration_num)
        rot = rotation_error_deg(batch.igt_rotation, out.est_R)
        trans = translation_error(batch.igt_rotation, translation,
                                  out.est_t[:, 0, :])
        # residual rotation E = igt . est (identity when perfect)
        E = jnp.einsum("bij,bjk->bik", batch.igt_rotation, out.est_R)
        return rot, trans, E

    @jax.jit
    def ambiguity(target, E, key):
        """chamfer(t, t@E) / median chamfer(t, t@R_random) per sample."""
        def cd(a, b):
            return chamfer_directional(a, b) + chamfer_directional(b, a)

        t_rot = jnp.einsum("bni,bij->bnj", target, E)
        d_res = cd(target, t_rot)
        def rand_cd(k):
            q = jax.random.normal(k, (target.shape[0], 4))
            q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
            from shwd_tpu.ops.quaternion import quat_to_matrix
            R = quat_to_matrix(q)
            return cd(target, jnp.einsum("bni,bij->bnj", target, R))
        d_rand = jax.vmap(rand_cd)(jax.random.split(key, 8))   # (8, B)
        return d_res / jnp.maximum(jnp.median(d_rand, axis=0), 1e-12)

    rots, transs, ambs = [], [], []
    key = jax.random.PRNGKey(20250821)
    for k in range(K):
        kk = jax.random.fold_in(key, k)
        batch = make_registration_batch(kk, clouds, clouds,
                                        cfg.dataset.transform)
        rot, trans, E = step(state, batch)
        amb = ambiguity(batch.target, E, jax.random.fold_in(kk, 77))
        rots.append(np.asarray(rot))
        transs.append(np.asarray(trans))
        ambs.append(np.asarray(amb))
    rot = np.stack(rots)        # (K, M)
    trans = np.stack(transs)
    amb = np.stack(ambs)

    fams = {}
    for ci, cls in enumerate(classes):
        sel = labels == ci
        r = rot[:, sel].ravel()
        failed = r > FAIL_DEG
        a = amb[:, sel].ravel()
        fams[cls] = {
            "n_meshes": int(sel.sum()),
            "rot_mean": float(r.mean()), "rot_median": float(np.median(r)),
            "rot_p90": float(np.percentile(r, 90)),
            "trans_mean": float(trans[:, sel].mean()),
            "fail_rate_gt10deg": float(failed.mean()),
            # of the failures, how many are near-symmetries of the shape
            "failed_ambiguity_score_median": (
                float(np.median(a[failed])) if failed.any() else None),
            "failed_that_are_near_symmetries": (
                float((a[failed] < 0.15).mean()) if failed.any() else None),
        }
        print(cls, json.dumps(fams[cls]), flush=True)

    allr = rot.ravel()
    failed = allr > FAIL_DEG
    out = {
        "experiment": EXP, "poses_per_mesh": K, "test_meshes": int(m),
        "fail_threshold_deg": FAIL_DEG,
        "overall": {
            "rot_mean": float(allr.mean()),
            "rot_median": float(np.median(allr)),
            "trans_mean": float(trans.mean()),
            "fail_rate": float(failed.mean()),
            "failed_near_symmetry_fraction": (
                float((amb.ravel()[failed] < 0.15).mean())
                if failed.any() else None),
            "rot_mean_excl_ambiguous": float(
                allr[~(failed & (amb.ravel() < 0.15))].mean()),
        },
        "per_family": fams,
        "note": ("ambiguity score = chamfer(target, target@E)/median "
                 "chamfer(target, target@R_rand), E the residual rotation; "
                 "<0.15 means the residual is a near-symmetry of the shape "
                 "(second global minimum), i.e. the error is pose ambiguity "
                 "rather than a registration failure"),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "meshbank_diagnosis.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["overall"]))
    print("wrote", path)


if __name__ == "__main__":
    main()
