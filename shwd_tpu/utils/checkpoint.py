"""Checkpointing: pytree save/restore with epoch metadata.

Replaces the reference's ``torch.save`` snapshot dicts {epoch, model,
optimizer, phi, phi_op} (train_W_COS.py:198-235) and ``load_checkpoint``
(:252-276). The full TrainState (model params, model opt state, criterion
state incl. phi + phi optimizer + spectral-norm buffers) serializes as one
flattened npz — every leaf restored exactly, so resume is bitwise-faithful.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Tuple

import jax
import numpy as np


def save_checkpoint(path: str | Path, state: Any, epoch: int) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree.flatten(state)
    # one batched device->host transfer instead of a per-leaf np.asarray
    # round trip (each leaf fetch is a full RTT over a remote-device link)
    leaves = jax.device_get(leaves)
    np.savez_compressed(
        str(path) + ".npz",
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    meta = {"epoch": epoch, "num_leaves": len(leaves),
            "treedef": str(treedef)}
    Path(str(path) + ".json").write_text(json.dumps(meta))


def load_checkpoint(path: str | Path, template: Any) -> Tuple[Any, int]:
    """Restore into the structure of ``template`` (same treedef)."""
    path = str(path)
    if path.endswith(".npz"):
        path = path[:-4]
    data = np.load(path + ".npz")
    meta = json.loads(Path(path + ".json").read_text())
    leaves, treedef = jax.tree.flatten(template)
    assert len(leaves) == meta["num_leaves"], \
        f"checkpoint has {meta['num_leaves']} leaves, template {len(leaves)}"
    new_leaves = [
        np.asarray(data[f"leaf_{i}"], dtype=np.asarray(l).dtype)
        if np.asarray(l).dtype != np.dtype(object) else data[f"leaf_{i}"]
        for i, l in enumerate(leaves)
    ]
    return jax.tree.unflatten(treedef, new_leaves), meta["epoch"]
