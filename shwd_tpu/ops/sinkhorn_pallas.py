"""Fused point-cloud Sinkhorn: cost matrix + all iterations resident in VMEM.

The flagship W_COS criterion solves one entropic OT problem per cloud pair
per inner adversarial step (the reference's per-item CPU ``ot.emd2`` loop,
s2_wasserstein.py:40-45). The XLA path (``ops.sinkhorn.emd2_approx``) streams
the (B, N, M) cost matrix from HBM twice per iteration — ~200 HBM sweeps for
the eps-scaled schedule. This Pallas kernel instead:

1. computes the cost block (TB, N, M) for a *tile of batch items* from the
   raw clouds on the MXU directly in VMEM (lp-2 / cosine / geodesic — all one
   batched x @ y^T away),
2. runs the full eps-scaled log-domain schedule with cost, potentials and
   marginals VMEM-resident (zero HBM traffic per iteration). The batch tile
   keeps each VPU op large (TB x N x M elements), so the loop is
   compute-bound, not issue-bound,
3. emits <P, C> plus the dual potentials.

Gradients use the same envelope convention as the XLA path (plan detached,
matching POT's exact-EMD backward): a custom VJP recomputes the cost matrix
differentiably outside the kernel and pulls the plan back through it.

Falls back to the XLA implementation when the problem does not fit VMEM or
the cost power is unsupported (lp requires p == 2).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .costs import cost_matrix
from .sinkhorn import emd2_approx

_NEG_BIG = -1e30
# VMEM working set ~ 5 live (TB, N, M) f32 buffers (c, c/e-log_b, c/e-log_a,
# z, exp temp); keep under ~8 MB
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024
_LIVE_BUFFERS = 5


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _batch_tile(b: int, n_pad: int, m_pad: int) -> int:
    per_item = n_pad * m_pad * 4 * _LIVE_BUFFERS
    # tb >= 2: Mosaic miscompiles the degenerate single-sublane tile
    tb = max(2, _VMEM_BUDGET_BYTES // per_item)
    tb = min(tb, b, 64)
    while b % tb:       # b is even, so this stops at a divisor >= 2
        tb -= 1
    return tb


def fused_supported(n: int, m: int, kind: str, p: float) -> bool:
    if kind in ("lp", "sqeuclidean") and p != 2:
        return False
    if kind not in ("lp", "sqeuclidean", "cosine", "geodesic"):
        return False
    # the minimum tb=2 tile must fit the working set
    return 2 * _round_up(n, 128) * _round_up(m, 128) * 4 * _LIVE_BUFFERS \
        <= _VMEM_BUDGET_BYTES * 2


def _make_kernel(n: int, m: int, n_pad: int, m_pad: int, tb: int,
                 tb_pad: int, kind: str, p: float, eps: float,
                 num_iters: int, num_scales: int):
    """Kernel over a (TB, Np, Mp) batch tile. Refs:
    x (TB, Np, 3), y (TB, Mp, 3) -> val (1, TBp, 128), f (1, TBp, Np),
    g (1, TBp, Mp) — outputs sublane-padded to TBp = roundup(TB, 8) so the
    block shape stays Mosaic-legal for any batch tile."""

    def kernel(x_ref, y_ref, val_ref, f_ref, g_ref):
        x = x_ref[...]                                  # (TB, Np, 3)
        y = y_ref[...]                                  # (TB, Mp, 3)
        # validity masks / padded log-marginals from iota (n, m static),
        # built at their broadcast shapes directly
        rows3 = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad, 1), 1)
        cols3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m_pad), 2)
        la3 = jnp.where(rows3 < n, -math.log(n), _NEG_BIG)    # (1, Np, 1)
        lb3 = jnp.where(cols3 < m, -math.log(m), _NEG_BIG)    # (1, 1, Mp)
        rv = jax.lax.broadcasted_iota(jnp.int32, (n_pad, m_pad), 0) < n
        cv = jax.lax.broadcasted_iota(jnp.int32, (n_pad, m_pad), 1) < m
        vmask = (rv & cv).astype(jnp.float32)                 # (Np, Mp)

        if kind in ("lp", "sqeuclidean"):
            # direct squared differences, unrolled over the 3 coords (all
            # rank-3, Mosaic-friendly): exact where the matmul expansion
            # x2 + y2 - 2xy cancels catastrophically for near-coincident
            # clouds
            c = jnp.zeros((x.shape[0], n_pad, m_pad), jnp.float32)
            for d in range(x.shape[-1]):
                dd = x[:, :, d][:, :, None] - y[:, :, d][:, None, :]
                c = c + dd * dd
        else:
            # batched x @ y^T on the MXU: (TB, Np, Mp)
            xy = jax.lax.dot_general(
                x, y, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            xn = jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1), 1e-16))[:, :, None]
            yn = jnp.sqrt(jnp.maximum(jnp.sum(y * y, -1), 1e-16))[:, None, :]
            cos = xy / (xn * yn)
            if kind == "cosine":
                c = (1.0 - cos) ** p
            else:                                       # geodesic
                cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
                c = jnp.arccos(cos) ** p

        # per-item eps schedule start: max |C| over valid entries
        # (keep every intermediate >= 2D: Mosaic's layout inference rejects
        # rank-1 vectors in elementwise joins)
        c_max = jnp.max(jnp.max(jnp.abs(c) * vmask[None], axis=2),
                        axis=1, keepdims=True)                     # (TB, 1)
        log_e0 = jnp.log(jnp.maximum(c_max, 1e-30))                # (TB, 1)
        log_et = jnp.float32(math.log(eps))

        # scaled-potential iteration: with phi = f/e, gam = g/e and the
        # per-scale precomputed cb = C/e - log_b, ca = C/e - log_a, each
        # update is a single subtract + LSE — no per-iteration division or
        # marginal add over the (TB, N, M) block.
        phi = jnp.zeros((tb, n_pad), jnp.float32)
        gam = jnp.zeros((tb, m_pad), jnp.float32)

        def eps_at(s):
            r = s.astype(jnp.float32) / max(num_scales - 1, 1)
            return jnp.exp(log_e0 * (1.0 - r) + log_et * r)        # (TB, 1)

        def scale_body(s, carry):
            phi, gam = carry
            e = eps_at(s)
            # rescale potentials from the previous temperature
            prev = jnp.maximum(s - 1, 0)
            scale = jnp.where(s > 0, eps_at(prev) / e, 1.0)
            phi = phi * scale
            gam = gam * scale
            e3 = e[:, :, None]
            cb = c / e3 - lb3                                      # (TB,Np,Mp)
            ca = c / e3 - la3

            def body(i, carry):
                phi, gam = carry
                zf = gam[:, None, :] - cb
                mf = jnp.max(zf, axis=2)
                phi = -(mf + jnp.log(jnp.sum(jnp.exp(zf - mf[:, :, None]),
                                             axis=2)))
                zg = phi[:, :, None] - ca
                mg = jnp.max(zg, axis=1)
                gam = -(mg + jnp.log(jnp.sum(jnp.exp(zg - mg[:, None, :]),
                                             axis=1)))
                return phi, gam

            return jax.lax.fori_loop(0, num_iters, body, (phi, gam))

        phi, gam = jax.lax.fori_loop(0, num_scales, scale_body, (phi, gam))
        e_fin = eps_at(jnp.asarray(num_scales - 1))
        f = e_fin * phi
        g = e_fin * gam

        log_p = (f[:, :, None] + g[:, None, :] - c) / eps + la3 + lb3
        plan = jnp.exp(log_p) * vmask[None]
        val = jnp.sum(jnp.sum(plan * c, axis=2), axis=1,
                      keepdims=True)                               # (TB, 1)
        val_ref[0, :tb, :] = jnp.broadcast_to(val, (tb, 128))
        f_ref[0, :tb, :] = f
        g_ref[0, :tb, :] = g

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kind", "p", "eps", "num_iters", "num_scales",
                     "interpret"))
def _fused_forward(x: jax.Array, y: jax.Array, kind: str, p: float,
                   eps: float, num_iters: int, num_scales: int,
                   interpret: bool = False):
    from jax.experimental import pallas as pl

    b0, n, _ = x.shape
    m = y.shape[1]
    # odd batches pad to even: the minimum legal batch tile is 2
    b = b0 + (b0 % 2)
    if b != b0:
        x = jnp.concatenate([x, x[-1:]], axis=0)
        y = jnp.concatenate([y, y[-1:]], axis=0)
    n_pad = _round_up(n, 128)
    m_pad = _round_up(m, 128)
    tb = _batch_tile(b, n_pad, m_pad)
    tb_pad = _round_up(tb, 8)
    grid = b // tb
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 0)))
    yp = jnp.pad(y.astype(jnp.float32), ((0, 0), (0, m_pad - m), (0, 0)))

    kernel = _make_kernel(n, m, n_pad, m_pad, tb, tb_pad, kind, p, eps,
                          num_iters, num_scales)
    val, f, g = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tb, n_pad, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((tb, m_pad, 3), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tb_pad, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, tb_pad, n_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, tb_pad, m_pad), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, tb_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid, tb_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((grid, tb_pad, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xp, yp)
    val = val[:, :tb, 0].reshape(b)[:b0]
    f = f[:, :tb, :n].reshape(b, n)[:b0]
    g = g[:, :tb, :m].reshape(b, m)[:b0]
    return val, f, g


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6, 7))
def sinkhorn_points(x: jax.Array, y: jax.Array, kind: str = "lp",
                    p: float = 2.0, eps: float = 5e-3, num_iters: int = 50,
                    num_scales: int = 4,
                    interpret: bool = False) -> jax.Array:
    """Near-exact EMD <P, C(x, y)> per batch item, fully fused on TPU.

    x: (B, N, 3), y: (B, M, 3) -> (B,). Same eps-scaled schedule and envelope
    gradient as ``emd2_approx(cost_matrix(x, y, kind, p))`` — but the cost
    matrix never exists in HBM on the forward pass.
    """
    val, _, _ = _fused_forward(x, y, kind, p, eps, num_iters, num_scales,
                               interpret)
    return val


def _sp_fwd(x, y, kind, p, eps, num_iters, num_scales, interpret):
    val, f, g = _fused_forward(x, y, kind, p, eps, num_iters, num_scales,
                               interpret)
    return val, (x, y, f, g)


def _sp_bwd(kind, p, eps, num_iters, num_scales, interpret, res, dval):
    x, y, f, g = res
    n, m = x.shape[-2], y.shape[-2]

    def envelope(x, y):
        c = cost_matrix(x, y, kind, p)
        log_p = ((f[..., :, None] + g[..., None, :] - c) / eps
                 - jnp.log(n) - jnp.log(m))
        plan = jax.lax.stop_gradient(jnp.exp(log_p))
        return jnp.sum(plan * c, axis=(-2, -1))

    _, vjp = jax.vjp(envelope, x, y)
    dx, dy = vjp(dval)
    return dx, dy


sinkhorn_points.defvjp(_sp_fwd, _sp_bwd)


def emd2_points(x: jax.Array, y: jax.Array, kind: str = "lp", p: float = 2.0,
                eps: float = 5e-3, num_iters: int = 50, num_scales: int = 4,
                use_pallas: bool | None = None,
                interpret: bool = False) -> jax.Array:
    """Dispatcher: fused Pallas kernel on TPU when the problem fits VMEM,
    XLA ``emd2_approx`` otherwise. x (B,N,3), y (B,M,3) -> (B,)."""
    n, m = x.shape[-2], y.shape[-2]
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and fused_supported(n, m, kind, p))
    if use_pallas:
        return sinkhorn_points(x, y, kind, p, eps, num_iters, num_scales,
                               interpret)
    c = cost_matrix(x, y, kind, p)
    return emd2_approx(c, eps=eps, num_iters=num_iters, num_scales=num_scales)


# ---------------------------------------------------------------------------
# Large-N single-problem warm-up kernel (hybrid exact-EMD path)
#
# The fused kernel above needs ~5 live (TB, N, M) buffers, which caps it at
# small N. The hybrid auction's Sinkhorn warm-up only needs the DUALS of one
# (or few) big problems (B=1, N=1200 for the flow bench; B<=32, N=1024 for
# registration eval) and no gradient (the duals warm-start the auction under
# stop_gradient; exactness comes from the auction itself). This kernel keeps
# ONE (N, M) cost block VMEM-resident and streams the logsumexp updates over
# column blocks, so the working set is c + one (N, MBLK) temporary — the
# whole eps-scaled schedule runs with zero HBM traffic per iteration,
# replacing ~2*iters full-matrix HBM sweeps of the XLA path.
# ---------------------------------------------------------------------------

def warmup_supported(n: int, m: int) -> bool:
    m_pad = _round_up(m, 128)
    n_pad = _round_up(n, 8)
    return (n_pad * m_pad + n_pad * 256) * 4 <= 13 * 1024 * 1024


def _make_warmup_kernel(n: int, m: int, m_pad: int, num_iters: int,
                        num_scales: int, eps_final: float, mblk: int):
    log_a = -math.log(n)
    log_b = -math.log(m)
    nblk = m_pad // mblk
    log_et = math.log(eps_final)

    def kernel(c_ref, val_ref, f_ref, g_ref):
        # refs carry the leading grid-block dim: c (1, n, m_pad),
        # f (1, n, 128), g (1, 8, m_pad), val (1, 1) SMEM

        def cblk(b):
            return c_ref[0, :, pl.ds(b * mblk, mblk)]   # (n, mblk)

        def colmask(b):
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, mblk), 1) + b * mblk
            return idx < m                              # (1, mblk)

        # eps0 = max |c| over valid columns (padded cols carry +BIG)
        def maxblk(b, acc):
            cb = jnp.where(colmask(b), jnp.abs(cblk(b)), -1e30)
            return jnp.maximum(acc, jnp.max(cb))

        c_max = jax.lax.fori_loop(0, nblk, maxblk, jnp.float32(-1e30))
        log_e0 = jnp.log(jnp.maximum(c_max, 1e-30))

        g_ref[...] = jnp.zeros_like(g_ref)
        f_ref[...] = jnp.zeros_like(f_ref)

        def eps_at(s):
            r = s.astype(jnp.float32) / max(num_scales - 1, 1)
            return jnp.exp(log_e0 * (1.0 - r) + jnp.float32(log_et) * r)

        def scale_body(s, _):
            e = eps_at(s)
            e_inv = 1.0 / e

            def body(i, _):
                # f-update: streaming logsumexp over column blocks
                def fblk(b, carry):
                    m_run, s_run = carry
                    gb = g_ref[0, 0:1, pl.ds(b * mblk, mblk)]
                    z = (gb - cblk(b)) * e_inv + log_b  # (n, mblk)
                    z = jnp.where(colmask(b), z, -1e30)
                    bm = jnp.max(z, axis=1, keepdims=True)
                    m_new = jnp.maximum(m_run, bm)
                    s_run = (s_run * jnp.exp(m_run - m_new)
                             + jnp.sum(jnp.exp(z - m_new), axis=1,
                                       keepdims=True))
                    return m_new, s_run

                m_run = jnp.full((n, 1), -1e30, jnp.float32)
                s_run = jnp.zeros((n, 1), jnp.float32)
                m_run, s_run = jax.lax.fori_loop(0, nblk, fblk,
                                                 (m_run, s_run))
                f = -e * (m_run + jnp.log(jnp.maximum(s_run, 1e-38)))
                f_ref[0, :, 0:1] = f

                # g-update: per-column, block-local
                def gblk(b, _):
                    z = (f - cblk(b)) * e_inv + log_a   # (n, mblk)
                    bm = jnp.max(z, axis=0, keepdims=True)
                    sb = jnp.sum(jnp.exp(z - bm), axis=0, keepdims=True)
                    gb = -e * (bm + jnp.log(jnp.maximum(sb, 1e-38)))
                    gb = jnp.where(colmask(b), gb, -1e30)
                    g_ref[0, 0:1, pl.ds(b * mblk, mblk)] = gb
                    return 0

                jax.lax.fori_loop(0, nblk, gblk, 0)
                return 0

            jax.lax.fori_loop(0, num_iters, body, 0)
            return 0

        jax.lax.fori_loop(0, num_scales, scale_body, 0)

        # <P, C> at the final temperature
        e_fin = eps_at(jnp.asarray(num_scales - 1))
        e_inv = 1.0 / e_fin
        f = f_ref[0, :, 0:1]

        def vblk(b, acc):
            cb = cblk(b)
            gb = g_ref[0, 0:1, pl.ds(b * mblk, mblk)]
            lp = (f + gb - cb) * e_inv + (log_a + log_b)
            p = jnp.where(colmask(b), jnp.exp(lp), 0.0)
            return acc + jnp.sum(p * cb)

        val = jax.lax.fori_loop(0, nblk, vblk, jnp.float32(0.0))
        val_ref[0] = jnp.full((8, 128), val, jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("eps", "num_iters", "num_scales",
                                             "interpret"))
def emd2_warmup_pallas(cost: jax.Array, eps: float = 1e-5,
                       num_iters: int = 40, num_scales: int = 8,
                       interpret: bool = False):
    """Annealed log-Sinkhorn duals for big single problems, VMEM-resident.

    cost: (B, N, M) -> (val (B,), f (B, N), g (B, M)). Forward-only (no
    gradient path — callers hold it under stop_gradient; the hybrid solver's
    value/grad comes from the exact auction assignment). Numerically matches
    ops.sinkhorn.emd2_approx to f32 tolerance (same schedule, same updates).
    """
    b, n, m = cost.shape
    m_pad = _round_up(m, 128)
    mblk = 256 if m_pad % 256 == 0 else 128
    if m_pad > m:
        pad = jnp.full((b, n, m_pad - m), 1e30, cost.dtype)
        cost_p = jnp.concatenate([cost.astype(jnp.float32), pad], axis=-1)
    else:
        cost_p = cost.astype(jnp.float32)

    kernel = _make_warmup_kernel(n, m, m_pad, num_iters, num_scales, eps,
                                 mblk)
    val, f, g = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, m_pad), lambda i: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, m_pad), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(cost_p)
    return val[:, 0, 0], f[:, :, 0], g[:, 0, :m]
