"""Iterative PCRNet for point-cloud registration.

TPU-native rebuild of ``models/pcrnet.py``: PointNet features of template
(computed once) and of the running source (per iteration) are concatenated
and pushed through a 2048-1024-1024-512-512-256-7 MLP head to a pose-7d
(quaternion + translation); poses compose across iterations
(``Pose_estimation`` :26-44, ``forward`` :46-62).

Design: the iteration count is static (3 or 8 in all reference configs), so
the loop is unrolled under jit — each iteration is a handful of large
matmuls, ideal MXU work; XLA pipelines them. All pose math reuses
``shwd_tpu.ops.quaternion``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.quaternion import (
    create_pose_7d, pose_translation, quat_to_matrix, quaternion_rotate,
    quaternion_transform, convert2transformation,
)
from .pointnet import PointNet, max_pool, _linear_init


class PCRNetOutput(NamedTuple):
    est_R: jax.Array              # (B, 3, 3) source -> template rotation
    est_t: jax.Array              # (B, 1, 3)
    est_T: jax.Array              # (B, 4, 4)
    r: jax.Array                  # feature residual (B, emb_dims)
    transformed_source: jax.Array


class PCRNet:
    HEAD_WIDTHS = (2048, 1024, 1024, 512, 512, 256, 7)

    def __init__(self, feature_model: PointNet | None = None,
                 dropout: float = 0.0):
        self.feature_model = feature_model or PointNet()
        assert dropout == 0.0, "reference experiments run dropout 0"

    def init(self, key):
        k_feat, k_head = jax.random.split(key)
        widths = self.HEAD_WIDTHS
        keys = jax.random.split(k_head, len(widths) - 1)
        head = tuple(_linear_init(k, widths[i], widths[i + 1])
                     for i, k in enumerate(keys))
        return {"feature": self.feature_model.init(k_feat), "head": head}

    def _head(self, params, y):
        for i, p in enumerate(params["head"]):
            y = y @ p["w"].T + p["b"]
            if i < len(params["head"]) - 1:
                y = jax.nn.relu(y)
        return y

    def _pose_iteration(self, params, template_feat, source, est_R, est_t):
        """One refinement step (reference ``Pose_estimation`` :26-44)."""
        source_feat = max_pool(self.feature_model.apply(params["feature"], source))
        y = jnp.concatenate([template_feat, source_feat], axis=-1)
        pose_7d = create_pose_7d(self._head(params, y))

        # reference :35-36: rotating the identity's rows yields R^T, and the
        # .permute(0,2,1) transposes it back — net effect est_R_temp = R(q)
        est_R_temp = quat_to_matrix(pose_7d[..., :4])
        est_t_temp = pose_translation(pose_7d)[:, None, :]          # (B,1,3)

        est_t = jnp.einsum("bij,bkj->bki", est_R_temp, est_t) + est_t_temp
        est_R = jnp.einsum("bij,bjk->bik", est_R_temp, est_R)
        source = quaternion_transform(source, pose_7d)
        return est_R, est_t, source, source_feat

    def apply(self, params, template: jax.Array, source: jax.Array,
              iteration_num: int = 8) -> PCRNetOutput:
        """template, source: (B, N, 3). iteration_num is static (unrolled)."""
        b = template.shape[0]
        est_R = jnp.broadcast_to(jnp.eye(3, dtype=template.dtype), (b, 3, 3))
        est_t = jnp.zeros((b, 1, 3), template.dtype)
        template_feat = max_pool(
            self.feature_model.apply(params["feature"], template))

        source_feat = template_feat
        for _ in range(iteration_num):
            est_R, est_t, source, source_feat = self._pose_iteration(
                params, template_feat, source, est_R, est_t)

        return PCRNetOutput(
            est_R=est_R,
            est_t=est_t,
            est_T=convert2transformation(est_R, est_t),
            r=template_feat - source_feat,
            transformed_source=source,
        )
