"""Point-axis parallelism: distributed sort + sorted-order OT over a mesh.

SURVEY.md §2.3 P7 / §5 "long-context analog": the reference's scaling
dimensions are point count N and slice count L, and its sort-based OT kernels
(`losses/max_spherical_sliced_w.py:210-247`, notebook
``sliced_wasserstein_distance``) are single-device. When N exceeds per-chip
memory, the sort itself must be distributed. This module shards N over a
named mesh axis (``points``) and runs:

- ``dist_sort``          bitonic merge-split sort of block-distributed arrays
                         (local sort once, then log2(D)*(log2(D)+1)/2
                         ``ppermute`` block exchanges — each stage merges two
                         sorted blocks and keeps the low/high half, the
                         classic hypercube block-sorting network).
- ``dist_cumsum``        distributed prefix sum (local scan + all_gather of
                         block totals).
- ``dist_emd1d``         exact W_p^p on the line, N sharded (rank alignment
                         after two distributed sorts; psum-mean).
- ``dist_emd1d_circle``  exact W_1 on the circle via the level-median closed
                         form (mirrors ``ops.ot1d.emd1d_circle`` including its
                         wrap-segment fix), with the merged support
                         distributed; the level median is found by a
                         fixed-iteration subgradient bisection of psum masses.
- ``make_dist_ssw``      spherical sliced-W_1 with the *point* axis sharded:
                         projections are local, sorts and circle OT are
                         distributed. Complements ``sharded_ops.make_sharded_
                         ssw`` (which shards batch x slices, points local).

p >= 2 circular OT needs global quantile alignment per bisection step; for
that regime use the (data, slices)-sharded path, which keeps N local. All
functions here are SPMD (call under ``shard_map``) with static shapes and
fixed iteration counts, so they jit and differentiate (gradients flow through
ppermute / lax.sort / where; the level median is an argmin, envelope-theorem
constant).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.spherical import project_to_circle


def make_points_mesh(points: Optional[int] = None, data: int = 1) -> Mesh:
    """A (data, points) mesh: batch over ``data``, point axis over ``points``."""
    devs = jax.devices()
    if points is None:
        points = len(devs) // data
    assert data * points == len(devs), (
        f"{data}x{points} != {len(devs)} devices")
    arr = np.asarray(devs).reshape(data, points)
    return Mesh(arr, ("data", "points"))


def _merge_split(x, payload, partner_perm, keep_low):
    """Exchange blocks with the partner, merge-sort, keep one half.

    x: (..., n_loc) locally sorted; keep_low: scalar bool (per device).
    """
    n_loc = x.shape[-1]
    other = lax.ppermute(x, "points", partner_perm)
    both = jnp.concatenate([x, other], axis=-1)
    if payload is None:
        merged = lax.sort(both, dimension=both.ndim - 1)
        lo, hi = merged[..., :n_loc], merged[..., n_loc:]
        return jnp.where(keep_low, lo, hi), None
    other_p = lax.ppermute(payload, "points", partner_perm)
    both_p = jnp.concatenate([payload, other_p], axis=-1)
    merged, merged_p = lax.sort((both, both_p), dimension=both.ndim - 1,
                                num_keys=1, is_stable=True)
    lo, hi = merged[..., :n_loc], merged[..., n_loc:]
    lo_p, hi_p = merged_p[..., :n_loc], merged_p[..., n_loc:]
    return (jnp.where(keep_low, lo, hi),
            jnp.where(keep_low, lo_p, hi_p))


def dist_sort(x: jax.Array, num_devices: int,
              payload: Optional[jax.Array] = None):
    """Sort a block-distributed array along its (sharded) last axis.

    SPMD: call under shard_map with the last axis split over the ``points``
    mesh axis. x: (..., n_loc) local block. After the call, device r holds
    global ranks [r*n_loc, (r+1)*n_loc) in ascending order. ``payload`` (same
    shape) is carried through the permutation. num_devices must be a power of
    two (mesh sizes are).

    Returns ``sorted_x`` (or ``(sorted_x, sorted_payload)``).
    """
    d = num_devices
    assert d & (d - 1) == 0, f"points axis size {d} must be a power of two"
    if payload is None:
        x = lax.sort(x, dimension=x.ndim - 1)
    else:
        x, payload = lax.sort((x, payload), dimension=x.ndim - 1,
                              num_keys=1, is_stable=True)
    if d == 1:
        return x if payload is None else (x, payload)

    idx = lax.axis_index("points")
    k = 2
    while k <= d:
        j = k // 2
        while j >= 1:
            perm = [(s, s ^ j) for s in range(d)]
            ascending = (idx & k) == 0 if k < d else jnp.bool_(True)
            is_low_rank = (idx & j) == 0
            keep_low = jnp.equal(ascending, is_low_rank)
            x, payload = _merge_split(x, payload, perm, keep_low)
            j //= 2
        k *= 2
    return x if payload is None else (x, payload)


def dist_cumsum(w: jax.Array, num_devices: int) -> jax.Array:
    """Inclusive prefix sum along a block-distributed last axis (SPMD)."""
    local = jnp.cumsum(w, axis=-1)
    totals = lax.all_gather(local[..., -1], "points")      # (D, ...)
    idx = lax.axis_index("points")
    mask = (jnp.arange(num_devices) < idx).astype(w.dtype)
    prefix = jnp.tensordot(mask, totals, axes=(0, 0))      # (...,)
    return local + prefix[..., None]


def dist_emd1d(u: jax.Array, v: jax.Array, num_devices: int,
               p: float = 2) -> jax.Array:
    """Exact W_p^p on the line with the sample axis sharded (SPMD).

    u, v: (..., n_loc) local blocks of equal-size uniform measures. Returns
    the replicated (...,) result of ``mean |sort(u) - sort(v)|^p`` over the
    GLOBAL sample axis — the distributed twin of ``ops.ot1d.emd1d``.
    """
    u = dist_sort(u, num_devices)
    v = dist_sort(v, num_devices)
    s = jnp.sum(jnp.abs(u - v) ** p, axis=-1)
    return lax.psum(s, "points") / (u.shape[-1] * num_devices)


def _level_median_bisect(cdf: jax.Array, delta: jax.Array,
                         num_iter: int = 42) -> jax.Array:
    """Weighted median of ``cdf`` under weights ``delta`` (psum masses).

    cdf, delta: (..., K) local blocks, weights psum to 1 over ``points``.
    Fixed-iteration bisection on the distribution function; cdf_diff values
    live in [-1, 1] and are multiples of 1/(n*m), so 42 halvings of a
    width-2 interval are exact for any n*m < 2^40.
    """
    shape = cdf.shape[:-1]
    lo = jnp.full(shape, -1.0, cdf.dtype)
    hi = jnp.full(shape, 1.0, cdf.dtype)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = lax.psum(
            jnp.sum(delta * (cdf <= mid[..., None]), axis=-1), "points")
        hit = below >= 0.5
        return jnp.where(hit, lo, mid), jnp.where(hit, mid, hi)

    lo, hi = lax.fori_loop(0, num_iter, body, (lo, hi))
    return lax.stop_gradient(hi)


def dist_emd1d_circle(u: jax.Array, v: jax.Array,
                      num_devices: int) -> jax.Array:
    """Exact W_1 on the circle [0, 1) with the sample axis sharded (SPMD).

    Distributed twin of ``ops.ot1d.emd1d_circle`` (level-median closed form,
    ref ``max_spherical_sliced_w.py:210-247``), including its wrap-segment
    fix: the merged (2 n_loc per device) support is sorted with signed
    weights as payload, the CDF difference is a distributed cumsum, segment
    widths use a neighbor ``ppermute`` for the block boundary, and the
    global leading wrap segment [0, min) rides on device 0 with cdf 0.
    """
    d = num_devices
    n = u.shape[-1] * d
    m = v.shape[-1] * d
    dtype = u.dtype
    idx = lax.axis_index("points")

    values = jnp.concatenate([u, v], axis=-1)
    weights = jnp.concatenate(
        [jnp.full(u.shape, 1.0 / n, dtype),
         jnp.full(v.shape, -1.0 / m, dtype)], axis=-1)
    values, weights = dist_sort(values, d, payload=weights)
    cdf_diff = dist_cumsum(weights, d)

    # segment of element i is [vs_i, vs_{i+1}); the block-boundary successor
    # comes from the next device's first element, 1.0 past the global end
    first = values[..., 0]
    prev_first = lax.ppermute(first, "points",
                              [(s, s - 1) for s in range(1, d)])
    nxt = jnp.where(idx == d - 1, jnp.ones_like(prev_first), prev_first)
    ends = jnp.concatenate([values[..., 1:], nxt[..., None]], axis=-1)
    delta = ends - values

    # global wrap segment [0, vs_0) with cdf 0 — zero-width on devices > 0
    lead_w = jnp.where(idx == 0, values[..., 0], jnp.zeros_like(first))
    delta_ext = jnp.concatenate([lead_w[..., None], delta], axis=-1)
    cdf_ext = jnp.concatenate(
        [jnp.zeros_like(cdf_diff[..., :1]), cdf_diff], axis=-1)

    med = _level_median_bisect(cdf_ext, delta_ext)
    s = jnp.sum(delta_ext * jnp.abs(cdf_ext - med[..., None]), axis=-1)
    return lax.psum(s, "points")


def make_dist_ssw(mesh: Mesh, num_projections: int = 100) -> Callable:
    """Spherical sliced-W_1 with the POINT axis sharded over ``mesh``.

    Returns ``ssw(x, y, frames) -> scalar``:
      x, y:   (B, N, 3) with N sharded P(None, 'points') and B sharded
              P('data') if the mesh has a data axis > 1;
      frames: (L, 3, 2) replicated.

    Per device: local great-circle projection of its point block, then a
    distributed sort + level-median circle W_1 across the points axis —
    clouds larger than one chip's memory never materialize anywhere.
    """
    d_pts = mesh.shape["points"]
    d_data = mesh.shape.get("data", 1)

    def local(x, y, frames):
        ax = project_to_circle(x, frames[None])     # (B_loc, L, n_loc)
        ay = project_to_circle(y, frames[None])
        w = dist_emd1d_circle(ax, ay, d_pts)        # (B_loc, L) replicated/pts
        s = jnp.mean(w)
        if d_data > 1:
            s = lax.pmean(s, "data")
        return s[None]

    wrapped = shard_map(
        local, mesh=mesh,
        in_specs=(P("data", "points"), P("data", "points"), P()),
        out_specs=P(None),
        check_vma=False,
    )

    def ssw(x, y, frames):
        return wrapped(x, y, frames)[0]

    return ssw
