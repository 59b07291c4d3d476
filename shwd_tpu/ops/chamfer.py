"""Chamfer distance — XLA path plus a Pallas tiled kernel for large N.

TPU-native replacement for pytorch3d's CUDA ``chamfer_distance`` as used by
``train_CD.py:326-328``, ``test_ERROR.py:216`` and ``main_rotation.py:203``:
bidirectional mean of squared nearest-neighbour distances,
``CD(x, y) = mean_i min_j ||x_i - y_j||^2 + mean_j min_i ||x_i - y_j||^2``.

For the reference's cloud sizes (128–2048 points) the dense (B, N, M) distance
matrix is a single batched matmul + min-reduce that XLA fuses cleanly — that is
the default. ``chamfer_pallas`` tiles the reduction through VMEM without ever
materializing the full (N, M) matrix in HBM, for large-N clouds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .costs import sqeuclidean_cost


def chamfer(x: jax.Array, y: jax.Array) -> jax.Array:
    """Bidirectional Chamfer distance, mean over batch. x: (B,N,3), y: (B,M,3)."""
    d = sqeuclidean_cost(x, y)
    return jnp.mean(jnp.min(d, axis=-1)) + jnp.mean(jnp.min(d, axis=-2))


def chamfer_directional(x: jax.Array, y: jax.Array) -> jax.Array:
    """mean_i min_j ||x_i - y_j||^2 per batch item, shape (B,)."""
    d = sqeuclidean_cost(x, y)
    return jnp.mean(jnp.min(d, axis=-1), axis=-1)


# ---------------------------------------------------------------------------
# Pallas tiled kernel: never materializes the (N, M) matrix in HBM
# ---------------------------------------------------------------------------

def _chamfer_tile_kernel(x_ref, y_ref, minx_ref, miny_ref):
    """Grid (B, N/TN, M/TM): accumulate row mins of x-tile vs y-tile.

    minx: per-x-point running min over y tiles; miny: per-y-point running min
    over x tiles. Output blocks are revisited across the reduced grid axis, so
    initialize on first visit.
    """
    from jax.experimental import pallas as pl

    x = x_ref[0]                        # (TN, 3)
    y = y_ref[0]                        # (TM, 3)
    x2 = jnp.sum(x * x, axis=-1)[:, None]
    y2 = jnp.sum(y * y, axis=-1)[None, :]
    d = x2 + y2 - 2.0 * jnp.dot(x, y.T, preferred_element_type=jnp.float32)

    tile_i = pl.program_id(1)
    tile_j = pl.program_id(2)

    @pl.when(tile_j == 0)
    def _():
        minx_ref[0] = jnp.full_like(minx_ref[0], jnp.inf)

    @pl.when(tile_i == 0)
    def _():
        miny_ref[0] = jnp.full_like(miny_ref[0], jnp.inf)

    minx_ref[0] = jnp.minimum(minx_ref[0], jnp.min(d, axis=1))
    miny_ref[0] = jnp.minimum(miny_ref[0], jnp.min(d, axis=0))


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def chamfer_pallas(x: jax.Array, y: jax.Array, tile_n: int = 512,
                   tile_m: int = 512, interpret: bool = False) -> jax.Array:
    """Tiled Chamfer via Pallas. x: (B,N,3), y: (B,M,3); N,M padded to tiles.

    The (N, M) distance matrix only ever exists one (tile_n, tile_m) block at a
    time in VMEM. Falls back to padding with +inf-safe sentinel points (far
    coordinates do not change true minima because the pad rows' own minima are
    dropped before the mean).
    """
    from jax.experimental import pallas as pl

    b, n, _ = x.shape
    m = y.shape[1]
    tn = min(tile_n, max(8, n))
    tm = min(tile_m, max(8, m))
    n_pad = (-n) % tn
    m_pad = (-m) % tm
    BIG = jnp.asarray(1e30, x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0))) if n_pad else x
    yp = jnp.pad(y, ((0, 0), (0, m_pad), (0, 0))) if m_pad else y
    if n_pad:
        # pad x rows far away so they never win y-side minima
        pad_mask = jnp.arange(n + n_pad) >= n
        xp = jnp.where(pad_mask[None, :, None], BIG, xp)
    if m_pad:
        pad_mask = jnp.arange(m + m_pad) >= m
        yp = jnp.where(pad_mask[None, :, None], BIG, yp)

    np_, mp_ = n + n_pad, m + m_pad
    minx, miny = pl.pallas_call(
        _chamfer_tile_kernel,
        grid=(b, np_ // tn, mp_ // tm),
        in_specs=[
            pl.BlockSpec((1, tn, 3), lambda bb, ii, jj: (bb, ii, 0)),
            pl.BlockSpec((1, tm, 3), lambda bb, ii, jj: (bb, jj, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tn), lambda bb, ii, jj: (bb, ii)),
            pl.BlockSpec((1, tm), lambda bb, ii, jj: (bb, jj)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, np_), x.dtype),
            jax.ShapeDtypeStruct((b, mp_), x.dtype),
        ],
        interpret=interpret,
    )(xp, yp)
    minx = minx[:, :n]
    miny = miny[:, :m]
    return jnp.mean(minx) + jnp.mean(miny)
