"""Registration dataset: iteration, split, host-side batching.

The TPU-native equivalent of the reference's ``Dataset_pytorch`` + DataLoader
workers (train_W_COS.py:363-364). All per-sample math is on-device
(``transforms.make_registration_batch``); the host only slices cached cloud
arrays. Independent source/target samplings (possibly different point
counts) reproduce ``Data_set_maker_add_noise`` loading two datasets
(Data_set_maker.py:272-273).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .modelnet import load_dataset
from .transforms import RegistrationBatch, TransformConfig, make_registration_batch


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    source_point_num: int = 128
    target_point_num: int = 128
    transform: TransformConfig = TransformConfig()
    modelnet_root: Optional[str] = None
    cache_dir: str = "modelnet_cache"
    num_synthetic: int = 512
    # shape classes for the synthetic ModelNet stand-in. 'composite' =
    # chiral three-lobe objects; registration benchmarks need these, since
    # the symmetric primitives make ground-truth pose unrecoverable (a box
    # flipped 180 deg is the same cloud — the loss has two equal minima)
    synthetic_kinds: tuple = ("box", "ellipsoid", "cylinder", "cone")
    val_split: float = 0.2
    seed: int = 0


class RegistrationDataset:
    """Holds (M, N, 3) source and (M, M_pts, 3) target cloud banks; yields
    jitted-transform batches."""

    def __init__(self, cfg: DatasetConfig, split: str = "train"):
        self.cfg = cfg
        self.split = split
        self.sources = load_dataset(cfg.source_point_num, split,
                                    cfg.modelnet_root, cfg.cache_dir,
                                    cfg.num_synthetic, cfg.seed,
                                    cfg.synthetic_kinds)
        if cfg.target_point_num == cfg.source_point_num:
            self.targets = self.sources
        else:
            self.targets = load_dataset(cfg.target_point_num, split,
                                        cfg.modelnet_root, cfg.cache_dir,
                                        cfg.num_synthetic, cfg.seed,
                                        cfg.synthetic_kinds)
        assert len(self.sources) == len(self.targets)

    def __len__(self):
        return len(self.sources)

    def train_val_indices(self, rng: np.random.Generator):
        """80/20 random split (Data_set_maker.py:109-113)."""
        m = len(self)
        perm = rng.permutation(m)
        n_val = int(m * self.cfg.val_split)
        return perm[n_val:], perm[:n_val]

    def batches(self, key: jax.Array, indices: np.ndarray, batch_size: int,
                shuffle: bool = True,
                rng: Optional[np.random.Generator] = None,
                drop_remainder: bool = True) -> Iterator[RegistrationBatch]:
        """Yield RegistrationBatch per step; per-batch transform keys split
        from ``key`` so every epoch re-randomizes poses/noise on-device."""
        idx = np.array(indices)
        if shuffle:
            (rng or np.random.default_rng()).shuffle(idx)
        n_batches = len(idx) // batch_size if drop_remainder else \
            -(-len(idx) // batch_size)
        keys = jax.random.split(key, max(n_batches, 1))
        for b in range(n_batches):
            sel = idx[b * batch_size:(b + 1) * batch_size]
            src = jnp.asarray(self.sources[sel])
            tgt = jnp.asarray(self.targets[sel])
            yield make_registration_batch(keys[b], tgt, src, self.cfg.transform)
