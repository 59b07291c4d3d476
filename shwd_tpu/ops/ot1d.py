"""One-dimensional optimal transport: on the line and on the circle.

TPU-native, fully batched re-designs of the reference's 1D OT kernels:

- ``emd1d``            exact W_p on the line via sort (the notebooks'
                       ``sliced_wasserstein_distance`` inner kernel).
- ``emd1d_circle``     exact W_1 on the circle via the level-median closed form
                       (ref ``losses/max_spherical_sliced_w.py:210-247``).
- ``circle_ot``        W_p (p >= 2) on the circle via the Delon–Salomon–
                       Sobolevski binary search (ref ``:117-207``), rebuilt as
                       a fixed-iteration ``lax.while_loop`` with masked
                       updates so it is jittable and batched over (B*L,)
                       problems at once — the reference loops Python batches.

All functions take values in [0, 1) (circle) or R (line) with shape
(..., n) and operate along the last axis. Weights are uniform (the only case
the reference exercises); sorted inputs can skip the sort with
``require_sort=False``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.custom_vjp
def sort_lastdim(x: jax.Array) -> jax.Array:
    """jnp.sort(x, -1) with a permutation-sort VJP.

    JAX's default reverse-mode rule for sort applies the inverse permutation
    with a gather, which TPU executes near-serially along the lane dimension
    (measured ~12 ms extra per (12800, 128) sort in the SSW hot path). Both
    directions here are ONE stable lax.sort each: forward sorts (x, iota) to
    get values + permutation, backward sorts (perm, cotangent) — sorting the
    cotangent by the permutation keys IS the inverse-permutation apply.
    """
    return jnp.sort(x, axis=-1)


def _sort_lastdim_fwd(x):
    iota = jnp.broadcast_to(
        jax.lax.iota(jnp.int32, x.shape[-1]), x.shape)
    xs, perm = jax.lax.sort_key_val(x, iota, dimension=-1)
    return xs, perm


def _sort_lastdim_bwd(perm, ct):
    _, ct_orig = jax.lax.sort_key_val(perm, ct, dimension=-1)
    return (ct_orig,)


sort_lastdim.defvjp(_sort_lastdim_fwd, _sort_lastdim_bwd)


def batched_searchsorted(a: jax.Array, q: jax.Array, side: str = "left") -> jax.Array:
    """searchsorted along the last axis, batched over leading dims.

    a: (..., K) sorted, q: (..., Q) queries -> (..., Q) insertion indices.
    Implemented as a comparison-count reduction ((..., Q, K) bool matrix), which
    vectorizes on the VPU instead of the scalar bisection jnp.searchsorted
    would need per batch row.
    """
    if side == "left":
        lt = a[..., None, :] < q[..., :, None]
    else:
        lt = a[..., None, :] <= q[..., :, None]
    return jnp.sum(lt.astype(jnp.int32), axis=-1)


# ---------------------------------------------------------------------------
# W_p on the line
# ---------------------------------------------------------------------------

def emd1d(u: jax.Array, v: jax.Array, p: float = 2,
          require_sort: bool = True) -> jax.Array:
    """Exact W_p^p between empirical measures on the line (equal sizes).

    u, v: (..., n). Returns (...,) — the p-th power of W_p (no root), matching
    the notebook convention ``mean |sort(u) - sort(v)|^p``.
    """
    if u.shape[-1] != v.shape[-1]:
        return emd1d_general(u, v, p=p, require_sort=require_sort)
    if require_sort:
        u = sort_lastdim(u)
        v = sort_lastdim(v)
    return jnp.mean(jnp.abs(u - v) ** p, axis=-1)


def emd1d_general(u: jax.Array, v: jax.Array, p: float = 2,
                  require_sort: bool = True) -> jax.Array:
    """Exact W_p^p on the line for unequal sizes n != m, uniform weights.

    Quantile-function formulation: integrate |F_u^{-1} - F_v^{-1}|^p over the
    merged CDF grid. Static shapes: the merged grid has n + m entries.
    """
    n, m = u.shape[-1], v.shape[-1]
    if require_sort:
        u = sort_lastdim(u)
        v = sort_lastdim(v)
    u_cdf = (jnp.arange(1, n + 1, dtype=u.dtype)) / n
    v_cdf = (jnp.arange(1, m + 1, dtype=v.dtype)) / m
    grid = jnp.sort(jnp.concatenate(
        [jnp.broadcast_to(u_cdf, u.shape), jnp.broadcast_to(v_cdf, v.shape)],
        axis=-1), axis=-1)
    delta = jnp.diff(grid, axis=-1, prepend=0.0)
    # inverse CDF at grid points: index = ceil(grid * n) - 1
    ui = jnp.clip(jnp.ceil(grid * n - 1e-9).astype(jnp.int32) - 1, 0, n - 1)
    vi = jnp.clip(jnp.ceil(grid * m - 1e-9).astype(jnp.int32) - 1, 0, m - 1)
    u_icdf = jnp.take_along_axis(u, ui, axis=-1)
    v_icdf = jnp.take_along_axis(v, vi, axis=-1)
    return jnp.sum(delta * jnp.abs(u_icdf - v_icdf) ** p, axis=-1)


# ---------------------------------------------------------------------------
# W_1 on the circle — level-median closed form
# ---------------------------------------------------------------------------

def emd1d_circle(u: jax.Array, v: jax.Array, require_sort: bool = True) -> jax.Array:
    """Exact W_1 between empirical measures on the circle [0, 1).

    Level-median formulation (ref ``max_spherical_sliced_w.py:210-247``):
    W_1 = integral_0^1 |F_u - F_v - med| with med the weighted median of the
    CDF difference. Batched over all leading dims. Sizes may differ.

    Deviation from the reference (deliberate bug fix): the reference's
    integral runs over [min_sample, 1) only, dropping the wrap segment
    [0, min_sample) where F_u - F_v = 0 — which biases W_1 low by O(1/n)
    (verified against an assignment-LP oracle on the circular cost). Here the
    extra segment participates in both the median and the integral.
    """
    n, m = u.shape[-1], v.shape[-1]
    dtype = u.dtype
    if require_sort:
        u = sort_lastdim(u)
        v = sort_lastdim(v)
    uw = jnp.full((n,), 1.0 / n, dtype)
    vw = jnp.full((m,), 1.0 / m, dtype)

    values = jnp.concatenate([u, v], axis=-1)
    weights = jnp.concatenate(
        [jnp.broadcast_to(uw, u.shape), jnp.broadcast_to(-vw, v.shape)], axis=-1)
    # joint pair-sort instead of argsort + take_along_axis: the gather is
    # near-serial on the TPU lane dim and dominated this whole kernel
    values_sorted, weights_sorted = jax.lax.sort_key_val(
        values, weights, dimension=-1)
    cdf_diff = jnp.cumsum(weights_sorted, axis=-1)

    # segments: [0, vs_0) with cdf 0 (wrap), [vs_k, vs_{k+1}), [vs_last, 1)
    lead = values_sorted[..., :1]                       # length of wrap segment
    zeros = jnp.zeros_like(lead)
    ones = jnp.ones_like(lead)
    seg_ends = jnp.concatenate([values_sorted, ones], axis=-1)
    seg_starts = jnp.concatenate([zeros, values_sorted], axis=-1)
    delta = seg_ends - seg_starts                       # (..., n+m+1)
    cdf_ext = jnp.concatenate([zeros, cdf_diff], axis=-1)

    # weighted median of cdf_ext with weights delta (the level median);
    # again one pair-sort, no gathers
    cdf_sorted, w_sorted = jax.lax.sort_key_val(cdf_ext, delta, dimension=-1)
    csum = jnp.cumsum(w_sorted, axis=-1) - 0.5
    csum = jnp.where(csum < 0, jnp.inf, csum)
    idx = jnp.argmin(csum, axis=-1)
    lev_med = jnp.take_along_axis(cdf_sorted, idx[..., None], axis=-1)

    return jnp.sum(delta * jnp.abs(cdf_ext - lev_med), axis=-1)


# ---------------------------------------------------------------------------
# W_p (p >= 2) on the circle — binary search on the rotation parameter
# ---------------------------------------------------------------------------

def _shifted_target(theta, v_sorted, v_cdf):
    """Shift the target measure by theta turns and re-anchor to [0,1)-ish coords.

    Returns (v_vals, v_cdf_t) with v_cdf_t the target CDF evaluated against the
    source's frame, both sorted so v_cdf_t is increasing, plus v_vals extended
    by one wrap-around entry. Equivalent to the mask/roll dance of the
    reference ``dCost`` (:25-57) but expressed with modular arithmetic and a
    single argsort (static-shape, batch-friendly).
    """
    # fractional and integer part of theta
    tfloor = jnp.floor(theta)
    tfrac = theta - tfloor
    v_cdf_t = v_cdf - tfrac
    neg = v_cdf_t < 0
    # negative entries wrap: cdf += 1, value += floor+1; others value += floor
    v_vals = v_sorted + jnp.where(neg, tfloor + 1.0, tfloor)
    v_cdf_t = jnp.where(neg, v_cdf_t + 1.0, v_cdf_t)
    # sort so cdf increasing (wrapped entries move to the front)
    order = jnp.argsort(v_cdf_t, axis=-1)
    v_cdf_t = jnp.take_along_axis(v_cdf_t, order, axis=-1)
    v_vals = jnp.take_along_axis(v_vals, order, axis=-1)
    v_ext = jnp.concatenate([v_vals, v_vals[..., :1] + 1.0], axis=-1)
    return v_ext, v_cdf_t


def _dcost(theta, u_sorted, v_sorted, u_cdf, v_cdf, p):
    """Left/right derivative of the circle transport cost wrt theta.

    Vectorized counterpart of reference ``dCost`` (max_spherical_sliced_w.py:25-65).
    theta: (..., 1) broadcastable; returns (dCp, dCm) each (..., 1).
    """
    n = u_sorted.shape[-1]
    v_ext, v_cdf_t = _shifted_target(theta, v_sorted, v_cdf)

    u_idx = batched_searchsorted(u_cdf, v_cdf_t, side="left")
    u_icdf = jnp.take_along_axis(u_sorted, jnp.clip(u_idx, 0, n - 1), axis=-1)

    u_cdf_m = jnp.concatenate([u_cdf, u_cdf[..., :1] + 1.0], axis=-1)
    u_vals_m = jnp.concatenate([u_sorted, u_sorted[..., :1] + 1.0], axis=-1)
    u_idx_m = batched_searchsorted(u_cdf_m, v_cdf_t, side="right")
    u_icdf_m = jnp.take_along_axis(u_vals_m, jnp.clip(u_idx_m, 0, n), axis=-1)

    dcp = jnp.sum(jnp.abs(u_icdf - v_ext[..., 1:]) ** p
                  - jnp.abs(u_icdf - v_ext[..., :-1]) ** p, axis=-1, keepdims=True)
    dcm = jnp.sum(jnp.abs(u_icdf_m - v_ext[..., 1:]) ** p
                  - jnp.abs(u_icdf_m - v_ext[..., :-1]) ** p, axis=-1, keepdims=True)
    return dcp, dcm


def _cost_at(theta, u_sorted, v_sorted, u_cdf, v_cdf, p):
    """Circle transport cost at shift theta (reference ``Cost``, :68-113)."""
    n = u_sorted.shape[-1]
    m = v_sorted.shape[-1]
    v_ext, v_cdf_t = _shifted_target(theta, v_sorted, v_cdf)

    cdf_axis = jnp.sort(jnp.concatenate([u_cdf, v_cdf_t], axis=-1), axis=-1)
    delta = jnp.diff(cdf_axis, axis=-1, prepend=0.0)

    u_idx = batched_searchsorted(u_cdf, cdf_axis, side="left")
    u_icdf = jnp.take_along_axis(u_sorted, jnp.clip(u_idx, 0, n - 1), axis=-1)

    v_ext2 = jnp.concatenate([v_ext, v_ext[..., :1] + 1.0], axis=-1)
    v_idx = batched_searchsorted(v_cdf_t, cdf_axis, side="left")
    v_icdf = jnp.take_along_axis(v_ext2, jnp.clip(v_idx, 0, m), axis=-1)

    return jnp.sum(delta * jnp.abs(u_icdf - v_icdf) ** p, axis=-1)


# -- closed-form helpers for uniform weights --------------------------------
#
# With uniform weights both CDFs are arithmetic grids: u_cdf = (1..n)/n and
# the theta-shifted target CDF is c + i/m with c = (w+1)/m - tfrac, where
# w = #{k : k/m < tfrac} wrapped entries. Every searchsorted against such a
# grid is index arithmetic — O(1) per query instead of O(K) comparisons.
# This is the speed-of-light form of the bisection on TPU: the reference's
# generic dCost (roll + two searchsorted over (B, m) tensors,
# max_spherical_sliced_w.py:25-65) becomes a handful of vectorized gathers.

def _grid_searchsorted_left(q, n):
    """#{k in 1..n : k/n < q} == searchsorted((1..n)/n, q, 'left').

    The tolerance is relative: at q*n ~ 1e3 the f32 ulp is ~1e-4, so an
    absolute epsilon would vanish; ties (exact grid hits) must not round up.
    """
    qn = q * n
    tol = jnp.abs(qn) * 1e-6 + 1e-7
    return jnp.clip(jnp.ceil(qn - tol).astype(jnp.int32) - 1, 0, n)


def _shifted_target_uniform(theta, v_sorted):
    """Closed-form _shifted_target: returns (v_ext (..., m+1), c, w).

    v_ext[i] = v[(w+i) % m] + floor(theta) + (i >= m-w), plus one wrap entry;
    shifted-CDF grid is c + i/m, i = 0..m-1.
    """
    m = v_sorted.shape[-1]
    tfloor = jnp.floor(theta)
    tfrac = theta - tfloor                                   # (..., 1)
    w = _grid_searchsorted_left(tfrac, m)                    # (..., 1) wraps
    i = jnp.arange(m, dtype=jnp.int32)
    idx = (w + i) % m                                        # (..., m)
    v_vals = jnp.take_along_axis(v_sorted, idx, axis=-1)
    v_vals = v_vals + tfloor + (i >= (m - w)).astype(v_sorted.dtype)
    v_ext = jnp.concatenate([v_vals, v_vals[..., :1] + 1.0], axis=-1)
    c = (w + 1).astype(v_sorted.dtype) / m - tfrac           # grid offset
    return v_ext, c, w


def _dcost_uniform(theta, u_sorted, v_sorted, p):
    """Closed-form left derivative of the circle cost wrt theta (dCp)."""
    n = u_sorted.shape[-1]
    m = v_sorted.shape[-1]
    v_ext, c, _ = _shifted_target_uniform(theta, v_sorted)
    # queries: the shifted target CDF grid q_i = c + i/m
    q = c + jnp.arange(m, dtype=u_sorted.dtype) / m
    u_idx = _grid_searchsorted_left(q, n)
    u_icdf = jnp.take_along_axis(u_sorted, jnp.clip(u_idx, 0, n - 1), axis=-1)
    return jnp.sum(jnp.abs(u_icdf - v_ext[..., 1:]) ** p
                   - jnp.abs(u_icdf - v_ext[..., :-1]) ** p,
                   axis=-1, keepdims=True)


def _cost_at_uniform(theta, u_sorted, v_sorted, p):
    """Circle transport cost at shift theta, uniform weights (closed-form
    searches; one merge-sort of the two CDF grids)."""
    n = u_sorted.shape[-1]
    m = v_sorted.shape[-1]
    v_ext, c, _ = _shifted_target_uniform(theta, v_sorted)

    u_cdf = jnp.broadcast_to(jnp.arange(1, n + 1, dtype=u_sorted.dtype) / n,
                             u_sorted.shape)
    v_cdf_t = c + jnp.arange(m, dtype=u_sorted.dtype) / m
    cdf_axis = jnp.sort(jnp.concatenate(
        [u_cdf, jnp.broadcast_to(v_cdf_t, v_sorted.shape)], axis=-1), axis=-1)
    delta = jnp.diff(cdf_axis, axis=-1, prepend=0.0)

    u_idx = _grid_searchsorted_left(cdf_axis, n)
    u_icdf = jnp.take_along_axis(u_sorted, jnp.clip(u_idx, 0, n - 1), axis=-1)

    # v grid starts at c, step 1/m: #{i : c + i/m < q} = ceil((q - c) m)
    qm = (cdf_axis - c) * m
    v_idx = jnp.clip(
        jnp.ceil(qm - jnp.abs(qm) * 1e-6 - 1e-7).astype(jnp.int32), 0, m)
    v_ext2 = jnp.concatenate([v_ext, v_ext[..., :1] + 1.0], axis=-1)
    v_icdf = jnp.take_along_axis(v_ext2, v_idx, axis=-1)

    return jnp.sum(delta * jnp.abs(u_icdf - v_icdf) ** p, axis=-1)


# -- equal-size fast path ----------------------------------------------------
#
# When n == m every gather in the bisection step is *structured*: the target
# roll (w+i) % m is a contiguous window of the doubled array, and the source
# quantile indices clip(K+i, 0, n-1) are a contiguous window of an
# edge-padded array. XLA lowers elementwise take_along_axis to a serial
# gather on TPU (the observed cliff at n >= 1024); a batch of per-row
# dynamic slices of whole contiguous rows stays on the fast path. The
# doubled/padded arrays are loop-invariant and hoisted out of the bisection.

_CHUNK = 16


def _batch_slice(a: jax.Array, starts: jax.Array, size: int) -> jax.Array:
    """Per-row contiguous slice: a (B, K), starts (B,) -> (B, size).

    Exact, gather-free: vmap(dynamic_slice) lowers to a per-row gather along
    the lane dimension, which TPU executes near-serially (measured 14 ms for
    a (12800, 384) -> (12800, 128) extraction — the single hottest op of the
    whole SSW criterion). Instead decompose starts = 16 q + r and select
    among static slices twice (~17 + 16 fused masked adds on the VPU): a
    two-level one-hot, pure select/add, ~40x faster and autodiff transposes
    to the matching masked scatter-add.
    """
    b, k = a.shape
    # chunk ~ sqrt(start range) minimizes total masked adds (nq + chunk)
    span = max(k - size, 1)
    chunk = max(_CHUNK, 1 << (span.bit_length() // 2))
    nq = (k - size) // chunk + 1
    wide = size + chunk - 1
    pad = chunk * (nq - 1) + wide - k
    if pad > 0:
        a = jnp.concatenate([a, jnp.zeros((b, pad), a.dtype)], axis=-1)
    starts = jnp.clip(starts, 0, k - size)   # dynamic_slice's clamp semantics
    q = starts // chunk
    r = starts - q * chunk
    acc = jnp.zeros((b, wide), a.dtype)
    for qi in range(nq):
        seg = jax.lax.slice_in_dim(a, chunk * qi, chunk * qi + wide, axis=1)
        acc = acc + jnp.where((q == qi)[:, None], seg, 0)
    out = jnp.zeros((b, size), a.dtype)
    for ri in range(chunk):
        seg = jax.lax.slice_in_dim(acc, ri, ri + size, axis=1)
        out = out + jnp.where((r == ri)[:, None], seg, 0)
    return out


def _dcost_uniform_eq(theta, pu, v3, n, p):
    """_dcost_uniform for n == m via two contiguous slices per row.

    theta: (B, 1); pu: (B, 3n) = [u0 x (n+1), u, u_{n-1} x (n-1)];
    v3: (B, 2n+1) = [v, v+1, v0+2]. Matches _dcost_uniform bit-for-bit up to
    the tolerance being evaluated once at the window origin instead of per
    query (more accurate: c*n is computed before adding the integer i).
    """
    dtype = pu.dtype
    tfloor = jnp.floor(theta)
    tfrac = theta - tfloor
    w = _grid_searchsorted_left(tfrac, n)                    # (B, 1) wraps
    v_ext = _batch_slice(v3, w[..., 0], n + 1) + tfloor      # roll + wrap + 1
    c = (w + 1).astype(dtype) / n - tfrac
    cn = c * n
    tol = jnp.abs(cn) * 1e-6 + 1e-7
    k0 = jnp.ceil(cn - tol).astype(jnp.int32) - 1            # (B, 1)
    u_icdf = _batch_slice(pu, k0[..., 0] + (n + 1), n)       # u[clip(k0+i)]
    return jnp.sum(jnp.abs(u_icdf - v_ext[..., 1:]) ** p
                   - jnp.abs(u_icdf - v_ext[..., :-1]) ** p,
                   axis=-1, keepdims=True)


def _cost_at_uniform_eq(theta, u_sorted, v_sorted, p):
    """Circle cost at theta for n == m without sorts or gathers.

    With equal sizes, c = (w+1)/n - tfrac lies in (0, 1/n], so the merged
    CDF grid is the strict interleave c, 1/n, c+1/n, 2/n, ...: u atom i
    overlaps exactly the target atoms i and i+1, split (c, 1/n - c):

        cost = sum_i  c * |u_i - v_ext_i|^p + (1/n - c) * |u_i - v_ext_{i+1}|^p

    One contiguous roll of v, everything else elementwise — no merge sort,
    no gather. theta (and hence c) arrives detached; gradients flow through
    u and the rolled v exactly as in the generic path.
    """
    n = u_sorted.shape[-1]
    dtype = u_sorted.dtype
    tfloor = jnp.floor(theta)
    tfrac = theta - tfloor
    w = _grid_searchsorted_left(tfrac, n)
    v3 = jnp.concatenate(
        [v_sorted, v_sorted + 1.0, v_sorted[..., :1] + 2.0], axis=-1)
    v_ext = _batch_slice(v3, w[..., 0], n + 1) + tfloor      # (B, n+1)
    c = (w + 1).astype(dtype) / n - tfrac                    # in (0, 1/n]
    return jnp.sum(c * jnp.abs(u_sorted - v_ext[..., :-1]) ** p
                   + (1.0 / n - c) * jnp.abs(u_sorted - v_ext[..., 1:]) ** p,
                   axis=-1)


# -- p == 2, equal sizes: exact vertex minimum via DFT-matmul correlation ---
#
# For uniform equal-size measures the transport cost as a function of the
# cut shift theta is PIECEWISE LINEAR: inside the cell tfrac in (w/n,
# (w+1)/n] the cost is c*A(w) + (1/n - c)*A(w+1) with c = (w+1)/n - tfrac,
# where A(j) = sum_i |u_i - V3[j+i]|^p over the contiguous window j of the
# tripled target V3 = [v-1, v, v+1] (the wrap adjustments of every cut are
# exactly the sliding windows of V3; j in 0..2n covers theta in [-1, 1]).
# Hence min over theta = min_j A(j)/n — no bisection, and EXACT. For p = 2,
# A(j) = sum u^2 + window-sum(V3^2)(j) - 2 corr(j) with corr(j) =
# sum_i u_i V3[j+i].
#
# corr has period-n structure: V3[k] = v[k mod n] + floor(k/n) - 1, so
#   corr(j) = cc(j mod n) + S(clip(n-j)) + S(clip(2n-j)) - sum(u)
# with cc the CIRCULAR cross-correlation of period n and S the suffix sums
# of u (sorted ascending, so the wrapped entries are exactly a suffix). The
# clipped suffix-sum indices are monotone, so both terms are flips/concats —
# no gather. cc itself goes through an explicit length-n DFT as THREE SHARED
# MATMULS (forward u, forward v, inverse of the cross-power): on TPU the
# length-512 XLA rfft/irfft of the whole batch ran at ~40 GFLOP/s effective
# (6 ms at (12800, 128)); the same correlation as (B, n) @ (n, n/2+1)
# matmuls rides the MXU (~1 ms, HIGHEST precision = full f32). The A(j)
# scan is selection-only: the returned cost is evaluated exactly (and
# differentiably) at the chosen alignment.

@functools.lru_cache(maxsize=None)
def _dft_mats(n: int):
    """Real DFT / inverse-DFT matrices for period-n circular correlation.

    Returns (Cr, Ci) (n, nf) forward and (Br, Bi) (nf, n) inverse such that
    for P = conj(DFT(u)) * DFT(v) (computed via the identities below),
    cc = Pr @ Br + Pi @ Bi is the circular correlation sum_i u_i v_{(i+r)%n}.

    Returns NUMPY arrays: they are lru_cached across jit traces, and a cached
    jnp array created inside one trace would leak that trace's tracer.
    """
    import numpy as np
    nf = n // 2 + 1
    k = np.arange(n)[:, None].astype(np.float64)
    f = np.arange(nf)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * f / n
    w = np.full((nf,), 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    Cr = np.cos(ang).astype(np.float32)                     # (n, nf)
    Ci = (-np.sin(ang)).astype(np.float32)
    Br = (w[:, None] * np.cos(ang.T) / n).astype(np.float32)  # (nf, n)
    Bi = (-w[:, None] * np.sin(ang.T) / n).astype(np.float32)
    return Cr, Ci, Br, Bi


def _corr_windows(ud: jax.Array, vd: jax.Array) -> jax.Array:
    """corr(j) = sum_i u_i V3[j+i] for j = 0..2n, V3 = [v-1, v, v+1].

    ud, vd: (B, n) sorted ascending, gradients already stopped. Exact up to
    f32 rounding (HIGHEST-precision MXU matmuls)."""
    n = ud.shape[-1]
    Cr, Ci, Br, Bi = _dft_mats(n)
    dg = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    ur, ui = dg(ud, Cr), dg(ud, Ci)
    vr, vi = dg(vd, Cr), dg(vd, Ci)
    pr = ur * vr + ui * vi            # conj(u_hat) * v_hat
    pi = ur * vi - ui * vr
    cc = dg(pr, Br) + dg(pi, Bi)      # (B, n)

    # shift terms: sum_i u_i (floor((j+i)/n) - 1)
    csum = jnp.cumsum(ud, axis=-1)
    total = csum[..., -1:]
    s = jnp.concatenate([total, total - csum], axis=-1)       # S[k], k=0..n
    s_rev = s[..., ::-1]                                      # S[n-j], j=0..n
    t1 = jnp.concatenate(                                     # S(clip(n-j))
        [s_rev, jnp.broadcast_to(total, (*total.shape[:-1], n))], axis=-1)
    t2 = jnp.concatenate(                                     # S(clip(2n-j))
        [jnp.zeros((*total.shape[:-1], n), ud.dtype), s_rev], axis=-1)
    cc3 = jnp.concatenate([cc, cc, cc[..., :1]], axis=-1)
    return cc3 + t1 + t2 - total


def _circle_ot_p2_eq(u: jax.Array, v: jax.Array) -> jax.Array:
    """Exact W_2^2 on the circle, n == m, uniform weights. u, v: (B, n)
    sorted ascending in [0, 1). Returns (B,)."""
    b, n = u.shape
    v3 = jnp.concatenate([v - 1.0, v, v + 1.0], axis=-1)          # (B, 3n)

    ud = jax.lax.stop_gradient(u)
    vd = jax.lax.stop_gradient(v)
    corr = _corr_windows(ud, vd)                                  # (B, 2n+1)

    v3d = jax.lax.stop_gradient(v3)
    csum = jnp.cumsum(v3d * v3d, axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    s2 = csum[..., n:3 * n + 1] - csum[..., :2 * n + 1]           # (B, 2n+1)
    u2 = jnp.sum(ud * ud, axis=-1, keepdims=True)
    a = u2 + s2 - 2.0 * corr                                      # A(j), (B, 2n+1)

    j_star = jnp.argmin(a, axis=-1).astype(jnp.int32)             # (B,)
    # exact (and differentiable) evaluation at the chosen alignment
    win = _batch_slice(v3, j_star, n)
    return jnp.mean((u - win) ** 2, axis=-1)


@functools.partial(jax.jit, static_argnames=("p", "max_iter", "require_sort"))
def circle_ot(u: jax.Array, v: jax.Array, p: float = 2, eps: float = 1e-6,
              max_iter: int = 32, require_sort: bool = True) -> jax.Array:
    """Exact W_p^p on the circle (p >= 1) by binary search on the cut shift.

    Batched over leading dims; each problem runs the Delon–Salomon–Sobolevski
    search (ref ``binary_search_circle``) but with a bounded loop and
    ``where``-masked interval updates — no data-dependent Python control
    flow — and uniform-weight closed-form CDF searches (see helpers above):
    per bisection step the work is O(L x m) gathers, vs the reference's
    O(L x m x n) searchsorted. 32 halvings of [-1, 1] reach ~5e-10.

    Gradients flow through the final cost evaluation with theta detached
    (the reference likewise detaches tc), exact by the envelope theorem.
    """
    if require_sort:
        u = sort_lastdim(u)
        v = sort_lastdim(v)
    n, m = u.shape[-1], v.shape[-1]

    if n == m and p == 2:
        batch_shape = u.shape[:-1]
        return _circle_ot_p2_eq(u.reshape(-1, n),
                                v.reshape(-1, n)).reshape(batch_shape)

    if n == m:
        # equal sizes: bisection steps use contiguous-slice rolls only
        batch_shape = u.shape[:-1]
        uf = u.reshape((-1, n))
        vf = v.reshape((-1, n))
        ud = jax.lax.stop_gradient(uf)
        vd = jax.lax.stop_gradient(vf)
        pu = jnp.concatenate(
            [jnp.repeat(ud[..., :1], n + 1, axis=-1), ud,
             jnp.repeat(ud[..., -1:], n - 1, axis=-1)], axis=-1)
        v3 = jnp.concatenate(
            [vd, vd + 1.0, vd[..., :1] + 2.0], axis=-1)

        tm = jnp.zeros_like(uf[..., :1]) - 1.0
        tp = jnp.zeros_like(uf[..., :1]) + 1.0

        def body_eq(i, carry):
            tm, tp = carry
            tc = (tm + tp) / 2.0
            dcp = _dcost_uniform_eq(tc, pu, v3, n, p)
            go_right = dcp < 0
            tm = jnp.where(go_right, tc, tm)
            tp = jnp.where(go_right, tp, tc)
            return tm, tp

        tm, tp = jax.lax.fori_loop(0, max_iter, body_eq, (tm, tp))
        tc = jax.lax.stop_gradient((tm + tp) / 2.0)
        return _cost_at_uniform_eq(tc, uf, vf, p).reshape(batch_shape)

    # derive the carry init from u so it inherits u's sharding/vma type
    # (a fresh jnp.full would be 'unvarying' under shard_map and break scan)
    tm = jnp.zeros_like(u[..., :1]) - 1.0
    tp = jnp.zeros_like(u[..., :1]) + 1.0
    ud = jax.lax.stop_gradient(u)
    vd = jax.lax.stop_gradient(v)

    def body(i, carry):
        tm, tp = carry
        tc = (tm + tp) / 2.0
        dcp = _dcost_uniform(tc, ud, vd, p)
        go_right = dcp < 0      # derivative negative -> optimum right of tc
        tm = jnp.where(go_right, tc, tm)
        tp = jnp.where(go_right, tp, tc)
        return tm, tp

    tm, tp = jax.lax.fori_loop(0, max_iter, body, (tm, tp))
    tc = jax.lax.stop_gradient((tm + tp) / 2.0)
    return _cost_at_uniform(tc, u, v, p)
