"""Evaluation harness: pose errors + success-ratio curves on the test split.

TPU-native rebuild of ``test_ERROR.py``: load a trained PCRNet, run the test
split, report mean rotation/translation errors and success-ratio-vs-threshold
curves, dump qualitative cloud snapshots.

Design upgrade (SURVEY.md §7.6): the reference runs **181 full passes** over
the test set — one per rotation threshold (test_ERROR.py:247-252) and 101
more for translation (:260-268). The per-sample errors do not depend on the
threshold, so here ONE pass collects all per-sample errors and the curves
are a broadcast comparison against the threshold grids — identical outputs,
~300x less compute.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import DatasetConfig, RegistrationDataset
from ..models import PCRNet
from ..ops.quaternion import rotation_error_deg, translation_error
from ..utils.checkpoint import load_checkpoint
from ..utils.logging import RunLogger
from .config import TrainConfig
from .trainer import Trainer, _mean_subtract


@dataclasses.dataclass
class EvalResult:
    mean_rot_error: float
    mean_trans_error: float
    rot_thresholds: np.ndarray       # 0..180 deg
    rot_success_ratio: np.ndarray
    trans_thresholds: np.ndarray     # 0..1
    trans_success_ratio: np.ndarray
    per_sample_rot: np.ndarray
    per_sample_trans: np.ndarray


def evaluate(cfg: TrainConfig, state=None, checkpoint: Optional[str] = None,
             split: str = "test", batch_size: Optional[int] = None,
             save_clouds_to: Optional[str] = None) -> EvalResult:
    """Run the full evaluation. Provide either a TrainState or a checkpoint
    path (reference --pretrained)."""
    trainer = Trainer(cfg)
    if state is None:
        template_state = trainer.init_state(jax.random.PRNGKey(0))
        assert checkpoint, "need state or checkpoint"
        state, _ = load_checkpoint(checkpoint, template_state)

    ds = RegistrationDataset(cfg.dataset, split)
    bs = batch_size or cfg.batch_size

    @jax.jit
    def errors_step(state, batch):
        source, target, translation = _mean_subtract(batch)
        out = trainer.model.apply(state.params, target, source,
                                  cfg.pcr_iteration_num)
        rot = rotation_error_deg(batch.igt_rotation, out.est_R)
        trans = translation_error(batch.igt_rotation, translation,
                                  out.est_t[:, 0, :])
        return rot, trans, out.transformed_source

    rots, transs = [], []
    key = jax.random.PRNGKey(cfg.seed + 999)
    last = None
    # drop_remainder=False: a test split smaller than the batch size (e.g.
    # the 20-mesh OFF-bank test split at batch 32) must still evaluate
    for batch in ds.batches(key, np.arange(len(ds)), bs, shuffle=False,
                            drop_remainder=False):
        r, t, transformed = errors_step(state, batch)
        rots.append(np.asarray(r))
        transs.append(np.asarray(t))
        last = (batch, transformed)

    rot = np.concatenate(rots)
    trans = np.concatenate(transs)

    rot_thr = np.arange(0, 181, 1, dtype=np.float64)
    trans_thr = np.arange(0, 1.01, 0.01)
    result = EvalResult(
        mean_rot_error=float(rot.mean()),
        mean_trans_error=float(trans.mean()),
        rot_thresholds=rot_thr,
        rot_success_ratio=(rot[None, :] <= rot_thr[:, None]).mean(1),
        trans_thresholds=trans_thr,
        trans_success_ratio=(trans[None, :] <= trans_thr[:, None]).mean(1),
        per_sample_rot=rot,
        per_sample_trans=trans,
    )

    if save_clouds_to and last is not None:
        logger = RunLogger(save_clouds_to)
        batch, transformed = last
        logger.save_clouds(
            "qualitative",
            initial_source=np.asarray(batch.source[0]),
            target=np.asarray(batch.target[0]),
            transformed_source=np.asarray(transformed[0]))
        np.savez_compressed(
            Path(save_clouds_to) / "success_curves.npz",
            rot_thresholds=result.rot_thresholds,
            rot_success=result.rot_success_ratio,
            trans_thresholds=result.trans_thresholds,
            trans_success=result.trans_success_ratio)
    return result
