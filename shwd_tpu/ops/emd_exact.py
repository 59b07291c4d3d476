"""Exact EMD oracle: native C++ network simplex via ctypes.

Python face of ``shwd_tpu/runtime/emd/network_simplex.cpp`` — the framework's
own replacement for the POT ``ot.emd2`` calls the reference makes
(``s2_wasserstein.py:40-45``, flow-notebook W2 evals). CPU-only by design:
exact EMD is an *evaluation/oracle* tool here; the TPU training path uses
eps-scaled Sinkhorn (``ops.sinkhorn.emd2_approx``) and sliced OT.

The shared library is compiled on first use (g++, a second); for uniform
weights with n == m the scipy assignment solver is used as a fast path and
cross-check.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_RUNTIME_DIR = Path(__file__).resolve().parent.parent / "runtime" / "emd"
_LIB_PATH = _RUNTIME_DIR / "libshwd_emd.so"
_lock = threading.Lock()
_lib = None


def _load_library():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_RUNTIME_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.shwd_emd_exact.restype = ctypes.c_int
        lib.shwd_emd_exact.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        _lib = lib
        return lib


def emd2_exact(cost: np.ndarray, a: np.ndarray | None = None,
               b: np.ndarray | None = None, return_plan: bool = False,
               max_pivots: int = 0):
    """<P*, C> for one dense cost matrix (n, m). Uniform marginals default.

    Equivalent call surface to ``ot.emd2(a, b, C)``.
    """
    cost = np.ascontiguousarray(cost, np.float64)
    n, m = cost.shape
    if a is None:
        a = np.full(n, 1.0 / n)
    if b is None:
        b = np.full(m, 1.0 / m)
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)

    # fast path: uniform marginals with n == m reduce to an assignment
    # problem (Birkhoff) — scipy's JV solver is ~10x our simplex there.
    if n == m and np.allclose(a, 1.0 / n) and np.allclose(b, 1.0 / m):
        try:
            from scipy.optimize import linear_sum_assignment
            r, c = linear_sum_assignment(cost)
            val = float(cost[r, c].mean())
            if not return_plan:
                return val
            plan = np.zeros((n, m), np.float64)
            plan[r, c] = 1.0 / n
            return val, plan
        except Exception:
            pass

    lib = _load_library()
    out = ctypes.c_double(0.0)
    plan = np.zeros((n, m), np.float64) if return_plan else None
    dptr = ctypes.POINTER(ctypes.c_double)
    rc = lib.shwd_emd_exact(
        n, m,
        a.ctypes.data_as(dptr), b.ctypes.data_as(dptr),
        cost.ctypes.data_as(dptr),
        plan.ctypes.data_as(dptr) if return_plan else None,
        ctypes.byref(out), max_pivots)
    if rc != 0:
        raise RuntimeError(f"network simplex failed with code {rc}")
    if return_plan:
        return out.value, plan
    return out.value


def emd2_exact_batch(cost: np.ndarray) -> np.ndarray:
    """(B, n, m) costs -> (B,) exact EMDs (host loop; eval-only tool)."""
    return np.array([emd2_exact(c) for c in cost])


# ---------------------------------------------------------------------------
# differentiable JAX bridge: value on host, gradient = optimal plan
# ---------------------------------------------------------------------------

def _solve_batch_with_plans(cost):
    cost = np.asarray(cost, np.float64)
    vals = np.zeros(cost.shape[0], np.float32)
    plans = np.zeros(cost.shape, np.float32)
    for i, c in enumerate(cost):
        v, p = emd2_exact(c, return_plan=True)
        vals[i] = v
        plans[i] = p
    return vals, plans


def emd2_exact_jax(cost):
    """Exact <P*, C> per batch item, differentiable wrt the cost matrix.

    cost: (B, n, m) JAX array. The solve runs on host (pure_callback into the
    native network simplex / JV assignment); the VJP is the optimal transport
    plan (envelope theorem — exactly how the reference gets gradients out of
    ``ot.emd2``, s2_wasserstein.py:40-45, POT's torch backend). Gradients to
    the *points* flow through the cost-matrix construction on device.

    This is the parity solver ('exact' in TransportConfig): bitwise-faithful
    to the reference's loss semantics, at host-callback speed. The fast TPU
    paths are 'sinkhorn' (Pallas eps-scaled) and 'ssw'.
    """
    import jax
    import jax.numpy as jnp

    @jax.custom_vjp
    def _emd(c):
        vals, _ = _call(c)
        return vals

    def _call(c):
        shape = (jax.ShapeDtypeStruct((c.shape[0],), jnp.float32),
                 jax.ShapeDtypeStruct(c.shape, jnp.float32))
        return jax.pure_callback(_solve_batch_with_plans, shape, c,
                                 vmap_method="sequential")

    def fwd(c):
        vals, plans = _call(c)
        return vals, plans

    def bwd(plans, g):
        return (g[:, None, None] * plans,)

    _emd.defvjp(fwd, bwd)
    return _emd(cost)


def w2_exact(x: np.ndarray, y: np.ndarray) -> float:
    """Exact W2 between two clouds (the notebooks' eval metric:
    ``ot.emd2`` on the squared-distance matrix, then sqrt)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    c = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return float(np.sqrt(max(emd2_exact(c), 0.0)))
