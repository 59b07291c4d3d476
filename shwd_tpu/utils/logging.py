"""Run logging: jsonl metrics + tee'd text log + cloud snapshots.

Replaces the reference's four channels (SURVEY.md §5 metrics row):
tensorboardX scalars + IOStream run.log + pickled curves + cloud pickles.
Here a single machine-readable ``metrics.jsonl`` is the source of truth
(no more regex-scraping run.log — test_RUNNER.py:244-292); ``run.log`` keeps
a human-readable line per epoch; snapshots are .npz.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Mapping

import numpy as np


class RunLogger:
    def __init__(self, log_dir: str | Path):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "metrics.jsonl", "a")
        self._text = open(self.dir / "run.log", "a")

    def log(self, row: Mapping[str, Any]) -> None:
        payload = {"time": time.time(), **row}
        self._jsonl.write(json.dumps(payload) + "\n")
        self._jsonl.flush()
        self._text.write(", ".join(f"{k}={v}" for k, v in row.items()) + "\n")
        self._text.flush()

    def cprint(self, text: str) -> None:
        """IOStream.cprint parity (log_utils/log_setting.py:7-17)."""
        print(text)
        self._text.write(text + "\n")
        self._text.flush()

    def save_clouds(self, name: str, **clouds) -> None:
        """Qualitative snapshot (Pointcloud_save_setting.py:7-30): stores the
        given clouds (e.g. initial/target/transformed) in one npz."""
        np.savez_compressed(self.dir / f"{name}.npz",
                            **{k: np.asarray(v) for k, v in clouds.items()})

    def close(self) -> None:
        self._jsonl.close()
        self._text.close()
