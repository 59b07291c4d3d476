"""Profiling & throughput counters.

The reference's only tracing is wall-clock ``time.time()`` deltas per epoch
(train_W_COS.py:192-196) and per notebook interval (SURVEY.md §5). Here:

- ``trace``: context manager around ``jax.profiler`` — dumps a TensorBoard-
  loadable trace (XLA ops, fusion, HBM transfers) for any code region.
- ``annotate``: named sub-regions inside a trace (TraceAnnotation).
- ``ThroughputMeter``: first-class clouds/s and loss-evals/s counters — the
  BASELINE.md headline units — with warmup skipping and jsonl emission.

Timing rule for the tunneled-TPU dev environment (see
.claude/skills/verify/SKILL.md): measure with fresh inputs and force a value
readback; ``ThroughputMeter.lap`` takes the array to block on.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path = "profile") -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region.

    View with TensorBoard (``tensorboard --logdir <log_dir>``) or xprof.
    """
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region: ``with annotate("inner_adversarial"): ...``."""
    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Counts items (clouds, loss evals, steps) per second.

    Usage:
        meter = ThroughputMeter(warmup=2)
        for batch in ...:
            out = step(...)
            meter.lap(batch_size, block_on=out)
        print(meter.summary())
    """

    def __init__(self, warmup: int = 1, name: str = "items"):
        self.warmup = warmup
        self.name = name
        self._laps: list[tuple[int, float]] = []
        self._t_last: Optional[float] = None

    def start(self) -> None:
        self._t_last = time.perf_counter()

    def lap(self, count: int, block_on: Any = None) -> float:
        """Record ``count`` items completed; blocks on ``block_on`` first so
        async dispatch does not fake the rate. Returns this lap's seconds."""
        if block_on is not None:
            jax.block_until_ready(block_on)
        now = time.perf_counter()
        if self._t_last is None:
            self._t_last = now
            return 0.0
        dt = now - self._t_last
        self._t_last = now
        self._laps.append((count, dt))
        return dt

    @property
    def measured(self) -> list[tuple[int, float]]:
        return self._laps[self.warmup:]

    def rate(self) -> float:
        """items/s over post-warmup laps."""
        laps = self.measured
        total_items = sum(c for c, _ in laps)
        total_time = sum(t for _, t in laps)
        return total_items / total_time if total_time > 0 else 0.0

    def summary(self) -> dict:
        laps = self.measured
        return {
            "metric": f"{self.name}_per_second",
            "value": self.rate(),
            "laps": len(laps),
            "total_items": sum(c for c, _ in laps),
            "total_seconds": sum(t for _, t in laps),
        }

    def emit(self, path: str | Path) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "a") as f:
            f.write(json.dumps({"time": time.time(), **self.summary()}) + "\n")


# ---------------------------------------------------------------------------
# FLOP accounting / MFU (VERDICT r3 #2)
#
# The reference has no FLOP accounting at all (its only counter is wall-clock
# per epoch, train_W_COS.py:192-196); every speed claim would otherwise be
# relative to its CPU loop — a bar a TPU clears while idle. These helpers
# attach an analytic FLOP count (XLA's compiled cost analysis) and an MFU
# figure (achieved FLOP/s vs chip peak) to any jitted step so bench rows can
# report utilization, not just steps/s.
# ---------------------------------------------------------------------------

# Peak dense-matmul FLOP/s per chip by device kind, bf16 (the MFU convention
# denominator). f32 work runs at ~1/4 of this on the MXU; VPU elementwise is
# far lower — MFU here is utilization of the chip's headline peak.
_PEAK_FLOPS_BY_KIND = (
    ("v5 lite", 197e12),     # TPU v5e: 197 TFLOP/s bf16
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v4", 275e12),
    ("v6", 918e12),          # trillium
)
_DEFAULT_PEAK = 197e12


def device_peak_flops(device=None) -> float:
    """Peak bf16 FLOP/s of ``device`` (default: first visible device)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _PEAK_FLOPS_BY_KIND:
        if sub in kind:
            return peak
    return _DEFAULT_PEAK


def compiled_flops(fn, *args, **kwargs) -> float:
    """Analytic FLOPs of ONE call of ``fn`` at these (abstract) args.

    ``fn`` may be a plain function or an existing jitted function; XLA's
    compiled-HLO cost analysis provides the count (convolution/dot FLOPs plus
    elementwise, post-fusion). Returns NaN when the backend does not expose
    cost analysis.
    """
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    try:
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
    except Exception:
        return float("nan")
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    if not cost:
        return float("nan")
    return float(cost.get("flops", float("nan")))


def mfu(flops_per_step: float, seconds_per_step: float, device=None) -> dict:
    """Achieved FLOP/s + model-FLOP utilization vs chip peak.

    Returns {"gflops_per_step", "achieved_gflops_per_s", "mfu", "peak_tflops"}
    — the fields every bench row carries (BENCH_r04 onward).
    """
    peak = device_peak_flops(device)
    achieved = flops_per_step / seconds_per_step if seconds_per_step > 0 else 0.0
    return {
        "gflops_per_step": flops_per_step / 1e9,
        "achieved_gflops_per_s": achieved / 1e9,
        "mfu": achieved / peak,
        "peak_tflops": peak / 1e12,
    }
