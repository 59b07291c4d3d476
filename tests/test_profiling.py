"""Throughput meter and trace utilities."""

import json
import time

import jax.numpy as jnp

from shwd_tpu.utils.profiling import ThroughputMeter, annotate, trace


def test_throughput_meter_rate(tmp_path):
    meter = ThroughputMeter(warmup=1, name="clouds")
    meter.start()
    for _ in range(4):
        time.sleep(0.01)
        meter.lap(32, block_on=jnp.ones(4))
    assert len(meter.measured) == 3
    r = meter.rate()
    assert 0 < r < 32 / 0.01  # bounded by the sleep
    s = meter.summary()
    assert s["metric"] == "clouds_per_second"
    assert s["total_items"] == 96

    meter.emit(tmp_path / "m.jsonl")
    row = json.loads((tmp_path / "m.jsonl").read_text().splitlines()[0])
    assert row["value"] == r


def test_annotate_and_trace_smoke(tmp_path):
    with annotate("region"):
        x = jnp.ones((8, 8)) * 2
    assert float(x.sum()) == 128.0
    with trace(tmp_path / "prof"):
        y = (x @ x).sum()
    assert float(y) > 0
