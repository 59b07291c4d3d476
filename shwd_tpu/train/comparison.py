"""Metric-behaviour sweeps: WD vs Chamfer vs Sinkhorn vs KL.

Rebuild of the Comparison suites:
- ``main_rotation.py`` / ``main_translation.py``: for a grid of rotation
  angles (or translation magnitudes), compute mean Chamfer / Sinkhorn /
  exact-W distances between template and transformed source over a dataset —
  the evidence that WD stays monotone where CD plateaus.
- ``WD_vs_KL_graph.ipynb``: closed-form KL vs W2 for translated Gaussians.

TPU design: one jitted function evaluates ALL metrics for a batch; the sweep
re-uses a single dataset and transforms it per grid point on device (the
reference rebuilds the whole torch_geometric dataset per angle,
main_rotation.py:195-196).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import TransformConfig, make_registration_batch
from ..ops.chamfer import chamfer
from ..ops.costs import lp_cost
from ..ops.sinkhorn import emd2_approx, sinkhorn_log


@dataclasses.dataclass
class SweepResult:
    grid: np.ndarray
    chamfer: np.ndarray
    sinkhorn: np.ndarray
    wasserstein: np.ndarray


@jax.jit
def _metrics_batch(template: jax.Array, source: jax.Array):
    cd = chamfer(source, template)
    c = lp_cost(source, template, 2)
    sk, _, _ = sinkhorn_log(c, eps=0.01, num_iters=100)
    wd = emd2_approx(c, eps=2e-3, num_iters=60, num_scales=5)
    # main_rotation.py applies the 1/p root inside cost_matrix (:82-92)
    return cd, jnp.mean(jnp.sqrt(jnp.maximum(sk, 1e-30))), \
        jnp.mean(jnp.sqrt(jnp.maximum(wd, 1e-30)))


def rotation_sweep(clouds: np.ndarray, angles_deg: np.ndarray,
                   noise_sigma: float = 0.0, seed: int = 0) -> SweepResult:
    """For each angle limit: rigidly rotate every cloud by exactly that angle
    (x-axis, the reference's controlled test mode) and record metric means."""
    return _sweep(clouds, angles_deg, "rotation", noise_sigma, seed)


def translation_sweep(clouds: np.ndarray, magnitudes: np.ndarray,
                      noise_sigma: float = 0.0, seed: int = 0) -> SweepResult:
    return _sweep(clouds, magnitudes, "translation", noise_sigma, seed)


def _sweep(clouds, grid, mode, noise_sigma, seed):
    target = jnp.asarray(clouds)
    cds, sks, wds = [], [], []
    key = jax.random.PRNGKey(seed)
    for i, g in enumerate(grid):
        if mode == "rotation":
            cfg = TransformConfig(angle_range_deg=float(g),
                                  translation_range=1e-12,
                                  noise_sigma=noise_sigma,
                                  rotation_axes="x", fixed_angle=True)
        else:
            cfg = TransformConfig(angle_range_deg=1e-9,
                                  translation_range=float(g) ** 2 + 1e-12,
                                  noise_sigma=noise_sigma)
        key, k = jax.random.split(key)
        batch = make_registration_batch(k, target, target, cfg)
        cd, sk, wd = _metrics_batch(batch.target, batch.source)
        cds.append(float(cd))
        sks.append(float(sk))
        wds.append(float(wd))
    return SweepResult(np.asarray(grid), np.asarray(cds), np.asarray(sks),
                       np.asarray(wds))


def gaussian_kl_vs_w2(sigma: np.ndarray, translations: np.ndarray):
    """Closed forms from WD_vs_KL_graph.ipynb: for N(0, diag(sigma^2)) vs its
    translate by t: KL = 0.5 t^T Sigma^{-1} t, W2 = ||t||."""
    t = np.asarray(translations, np.float64)          # (G, d)
    inv = 1.0 / np.asarray(sigma, np.float64) ** 2    # (d,)
    kl = 0.5 * np.sum(t * t * inv, axis=-1)
    w2 = np.linalg.norm(t, axis=-1)
    return kl, w2
