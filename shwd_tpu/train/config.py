"""Typed experiment configuration.

Replaces the reference's argparse flags (train_W_COS.py:285-313), the
runner's dict-of-lists matrix (train_RUNNER.py:82-481) and — crucially — the
run.log prose that test_RUNNER.py regex-scrapes back into flags
(test_RUNNER.py:244-292, the §1 'quirk'). One dataclass, serialized as JSON
next to every checkpoint, read back by eval. SURVEY.md §5 config row.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

from ..data.dataset import DatasetConfig
from ..data.transforms import TransformConfig
from ..losses.shwd import SHWDConfig
from ..losses.ssw_loss import MaxSSWConfig
from ..losses.transport import TransportConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # experiment identity (ex_date/ex_ver in the reference)
    experiment: str = "experiment"
    log_dir: str = "log"

    # criterion: 'w_cos' (flagship SHWD) | 'cd' (chamfer) | 'pseudo_w_cos'
    #            | 'w1_cos' (p=1) | 'sinkhorn' | 'max_ssw'
    criterion: str = "w_cos"

    # data (mirrors --noise_*, --*_p_n, --angle_r, --translation_r)
    dataset: DatasetConfig = DatasetConfig()

    # optimization (--num_epoch, --batch_size, --lr, --weight_decay)
    num_epochs: int = 200
    batch_size: int = 32
    lr: float = 1e-3
    weight_decay: float = 1.4096013153858628e-08

    # model (--pcr_iteration_num)
    pcr_iteration_num: int = 3

    # Best-checkpoint snapshots are tracked as on-device references and
    # written to disk every this-many epochs, on any exit from the epoch
    # loop (incl. exceptions/KeyboardInterrupt via try/finally), and always
    # at the end of fit. 0 = end-of-fit only. Writing on every improving
    # epoch — the reference's behavior (train_W_COS.py:198-235) — costs
    # seconds per save over a remote-device link (per-leaf host fetches),
    # which dominated short trainings; 50 bounds the durability loss of a
    # SIGKILLed run to 50 epochs of improvements.
    checkpoint_flush_every: int = 50

    # Optional 4th best-checkpoint family: min over epochs of
    # (rot_error + w * trans_error) on the val pass. The reference tracks
    # loss / rot / trans separately (train_W_COS.py:198-235), which cannot
    # select a jointly-good epoch when the two errors anti-correlate (the
    # max_ssw criterion's failure mode). 0 disables (default = reference
    # parity); 100 weighs 0.01 translation error as 1 degree.
    checkpoint_combined_weight: float = 0.0

    # phi / SHWD (--phi_*, --flow_name)
    shwd: SHWDConfig = SHWDConfig(
        transport=TransportConfig(cost="lp", p=2.0, solver="sinkhorn"),
        max_iter=1,
        lam=1.3111961119405346e-05,
        phi_lr=9.213233310357477e-05,
        phi_weight_decay=1.4096013153858628e-08,
    )
    flow_name: str = "Residual"
    phi_num_flow_layer: int = 3
    pseudo_phi_num: int = 2
    pseudo_combine: str = "max"

    # max_ssw criterion: its own inner-ascent knobs (the chart phi needs a
    # far larger lr / more steps than the SHWD residual flow —
    # max_spherical_sliced_w.py:498-536 defaults) and chart choice:
    # 'mlp' = transform_to_sphere MLP (:334-350), 'encoder_flow' = the
    # mini-batch residual MSSW encoder+2-D-flow chart
    # (mini_batch_Residual_MSSW.py:392-409).
    # Default = the probe-tuned registration winner (benchmarks/probe_max_ssw.py
    # batch-2 sweep: max_iter=1, phi_lr=9.2e-5 — the loss-class default of
    # max_iter=10/phi_lr=0.01 destabilizes registration training; keep
    # reference-default parity in MaxSSWConfig itself only).
    max_ssw: MaxSSWConfig = MaxSSWConfig(
        num_projections=100, max_iter=1, phi_lr=9.213233310357477e-05)
    max_ssw_chart: str = "mlp"

    # sinkhorn baseline knobs (--sinkhorn_eps / --sinkhorn_iter)
    sinkhorn_eps: float = 0.01
    sinkhorn_iter: int = 100

    seed: int = 1234
    load_model: Optional[str] = None

    # NaN forensics: on a non-finite train loss, dump the offending batch +
    # full train state to <log_dir>/<experiment>/nan_dump/ and raise
    # (reference nan_check semantics,
    # max_spherical_w_cos_with_regulation.py:133-142, 529-553).
    # Forces the per-step (unfused) epoch path so the offending batch is
    # identifiable.
    nan_guard: bool = False

    # Fuse the whole training epoch into ONE jitted lax.scan over batches
    # (cloud banks stay on device; per-batch transform keys fed to the scan).
    # Numerically identical to the per-step path — same keys, same update
    # order — but one host->device dispatch per epoch instead of one per
    # batch, which dominates wall time for small models over a TPU tunnel.
    fused_epoch: bool = True

    # parallel: when either axis is configured (mesh_data set, or
    # mesh_slices > 1), Trainer builds a (data, slices) jax.sharding.Mesh,
    # shards every training/eval batch over 'data', replicates train state,
    # and lets GSPMD insert the gradient reductions. Defaults = single-device.
    mesh_data: Optional[int] = None      # None + mesh_slices=1 -> no mesh
    mesh_slices: int = 1

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    def save(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(self.to_json())

    @staticmethod
    def load(path: str | Path) -> "TrainConfig":
        raw = json.loads(Path(path).read_text())
        return config_from_dict(raw)


def _build(cls, raw: dict) -> Any:
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in raw.items():
        if k not in fields:
            continue
        ftype = fields[k].type
        if isinstance(v, dict):
            sub = {
                "dataset": DatasetConfig, "transform": TransformConfig,
                "shwd": SHWDConfig, "transport": TransportConfig,
                "max_ssw": MaxSSWConfig,
            }.get(k)
            kwargs[k] = _build(sub, v) if sub else v
        elif isinstance(v, list) and isinstance(fields[k].default, tuple):
            kwargs[k] = tuple(v)   # json round-trips tuples as lists
        else:
            kwargs[k] = v
    return cls(**kwargs)


def config_from_dict(raw: dict) -> TrainConfig:
    return _build(TrainConfig, raw)
