"""Registration trainers: W_COS (flagship), CD, Pseudo_W_COS, W1_COS, Sinkhorn.

TPU-native rebuild of the reference training harness (``train_W_COS.py``,
``train_CD.py``, ``train_Pseudo_W_COS.py``,
``Optimize_hyperparameters/train_W1_COS.py``): per epoch a train pass and a
validation pass, three best-checkpoint families (val loss / rotation error /
translation error, train_W_COS.py:198-235), metrics logged per epoch, full
resume.

TPU design vs the reference (SURVEY.md §3.1):
- one jitted ``train_step`` = PCRNet fwd + criterion (incl. the SHWD inner
  adversarial scan) + model Adam update — no Python in the hot loop, no CPU
  OT calls, no per-item loops;
- mean-subtraction of both clouds (and of the translation target in eval)
  inside the step, matching train_W_COS.py:127-129, 167-168;
- criterion state (phi params/opt) threads functionally through the epoch.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import RegistrationDataset
from ..data.transforms import RegistrationBatch
from ..flows import make_flow
from ..losses import (
    MaxSSWLoss, PseudoSHWDConfig, PseudoSHWDLoss, SHWDLoss,
    chamfer_criterion, make_sinkhorn_criterion,
)
from ..models import PCRNet
from ..ops.quaternion import rotation_error_deg, translation_error
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.logging import RunLogger
from .config import TrainConfig


class TrainState(NamedTuple):
    params: Any                 # PCRNet params
    opt_state: Any
    crit_state: Any             # SHWD/pseudo/ssw state or () for stateless
    epoch: jax.Array


def _mean_subtract(batch: RegistrationBatch):
    """train_W_COS.py:127-129/167-168: both clouds centered; the translation
    ground truth is shifted by the source mean in eval."""
    src_mean = jnp.mean(batch.source, axis=1, keepdims=True)
    tgt_mean = jnp.mean(batch.target, axis=1, keepdims=True)
    source = batch.source - src_mean
    target = batch.target - tgt_mean
    translation = batch.igt_translation - src_mean[:, 0, :]
    return source, target, translation


def build_criterion(cfg: TrainConfig):
    """Returns (init_state(key), criterion(crit_state, x, y, train) ->
    ((loss, sx, sy), new_state))."""
    name = cfg.criterion
    if name in ("w_cos", "w1_cos"):
        shwd_cfg = cfg.shwd
        if name == "w1_cos":
            shwd_cfg = dataclasses.replace(
                shwd_cfg, transport=dataclasses.replace(shwd_cfg.transport, p=1.0))
        flow = make_flow(cfg.flow_name, cfg.phi_num_flow_layer)
        crit = SHWDLoss(flow, shwd_cfg)
        return crit.init, crit.apply
    if name == "pseudo_w_cos":
        flow = make_flow(cfg.flow_name, cfg.phi_num_flow_layer)
        crit = PseudoSHWDLoss(flow, PseudoSHWDConfig(
            transport=cfg.shwd.transport, phi_num=cfg.pseudo_phi_num,
            combine=cfg.pseudo_combine))
        return crit.init, lambda s, x, y, train=True: crit.apply(s, x, y, train)
    if name == "max_ssw":
        from ..flows import SphereChartMLP
        from ..flows.chart import EncoderFlowChart
        chart = (EncoderFlowChart() if cfg.max_ssw_chart == "encoder_flow"
                 else SphereChartMLP())
        crit = MaxSSWLoss(chart, cfg.max_ssw)
        return crit.init, crit.apply
    if name == "cd":
        def apply(state, x, y, train=True):
            return chamfer_criterion(x, y), state
        return (lambda key: ()), apply
    if name == "sinkhorn":
        base = make_sinkhorn_criterion(cfg.sinkhorn_eps, cfg.sinkhorn_iter)

        def apply(state, x, y, train=True):
            return base(x, y), state
        return (lambda key: ()), apply
    raise ValueError(f"unknown criterion {name!r}")


class Trainer:
    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.model = PCRNet()
        # coupled-L2 Adam = torch.optim.Adam(lr, weight_decay)
        # (train_W_COS.py:374) — NOT decoupled adamw
        from ..utils.optim import torch_adam
        self.opt = torch_adam(cfg.lr, cfg.weight_decay)
        self.crit_init, self.crit_apply = build_criterion(cfg)
        self._early_stop_enabled = (cfg.criterion in ("w_cos", "w1_cos")
                                    and cfg.shwd.early_stop_strikes > 0)
        # multi-device training (SURVEY.md §2.3 P2): when mesh axes are
        # configured, the cloud batch is sharded over 'data', model/criterion
        # state is replicated, and GSPMD inserts the gradient psum — the
        # TPU-native replacement for the reference's one-GPU-per-process
        # isolation (train_RUNNER.py:488-498).
        self.mesh = None
        self._batch_sharding = None
        self._repl_sharding = None
        if cfg.mesh_data is not None or cfg.mesh_slices > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import make_mesh
            self.mesh = make_mesh(cfg.mesh_data, cfg.mesh_slices)
            self._batch_sharding = NamedSharding(self.mesh, P("data"))
            self._repl_sharding = NamedSharding(self.mesh, P())
            if cfg.batch_size % self.mesh.shape["data"] != 0:
                raise ValueError(
                    f"batch_size={cfg.batch_size} must divide evenly over the "
                    f"mesh 'data' axis ({self.mesh.shape['data']}); a training "
                    "batch that falls back to replication would silently lose "
                    "all data parallelism (the fallback exists only for "
                    "eval's drop_remainder=False tail)")
        self._train_step = jax.jit(self._step, static_argnames=("train",))
        self._eval_step = jax.jit(self._eval)
        self._fused_epoch = jax.jit(self._epoch_scan)
        self._fused_eval = jax.jit(self._eval_epoch_scan)

    def _shard_batch(self, batch: RegistrationBatch) -> RegistrationBatch:
        """Place a host batch on the mesh: batch axis over 'data' when it
        divides evenly (training batches always do), replicated otherwise
        (eval's drop_remainder=False tail)."""
        if self.mesh is None:
            return batch
        if batch.source.shape[0] % self.mesh.shape["data"] == 0:
            return jax.device_put(batch, self._batch_sharding)
        return jax.device_put(batch, self._repl_sharding)

    # -- jitted bodies -----------------------------------------------------

    def _step(self, state: TrainState, batch: RegistrationBatch,
              train: bool = True):
        source, target, _ = _mean_subtract(batch)

        def loss_fn(params, crit_state):
            out = self.model.apply(params, target, source,
                                   self.cfg.pcr_iteration_num)
            (loss, _, _), new_crit = self.crit_apply(
                crit_state, target, out.transformed_source, train)
            return loss, new_crit

        (loss, new_crit), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.crit_state)
        updates, new_opt = self.opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_opt, new_crit, state.epoch), loss

    def _eval(self, state: TrainState, batch: RegistrationBatch):
        """Validation pass: loss in test mode + pose errors
        (test_one_epoch, train_W_COS.py:111-149)."""
        source, target, translation = _mean_subtract(batch)
        out = self.model.apply(state.params, target, source,
                               self.cfg.pcr_iteration_num)
        (loss, _, _), _ = self.crit_apply(
            state.crit_state, target, out.transformed_source, False)
        rot_err = rotation_error_deg(batch.igt_rotation, out.est_R)
        trans_err = translation_error(batch.igt_rotation, translation,
                                      out.est_t[:, 0, :])
        return loss, jnp.mean(rot_err), jnp.mean(trans_err)

    def _epoch_scan(self, state: TrainState, bank_src, bank_tgt,
                    idx_mat, keys):
        """One jitted training epoch: lax.scan over (n_batches, B) index
        rows; clouds gathered from the on-device banks, transforms drawn
        per batch from ``keys`` — the exact computation of the per-step
        path in one dispatch."""
        from ..data.transforms import make_registration_batch

        def body(carry, xs):
            idx, key = xs
            batch = make_registration_batch(
                key, bank_tgt[idx], bank_src[idx], self.cfg.dataset.transform)
            if self._batch_sharding is not None:
                # banks/indices stay replicated (cheap, gather-free); the
                # generated batch is constrained to P('data') so the heavy
                # model+criterion compute shards across the mesh
                batch = jax.lax.with_sharding_constraint(
                    batch, self._batch_sharding)
            new_carry, loss = self._step(carry, batch, train=True)
            return new_carry, loss

        state, losses = jax.lax.scan(body, state, (idx_mat, keys))
        return state, jnp.mean(losses)

    def _eval_epoch_scan(self, state, bank_src, bank_tgt, idx_full, keys_full,
                         idx_tail, key_tail):
        """Whole validation pass in ONE dispatch: lax.scan over the full
        batches plus an in-graph remainder batch (drop_remainder=False
        semantics). Per-batch eval dispatches cost ~0.2 s tunnel RTT each —
        at 4 val batches that was the bulk of every training epoch's wall
        time."""
        from ..data.transforms import make_registration_batch
        tr = self.cfg.dataset.transform

        def make(idx, k):
            return make_registration_batch(k, bank_tgt[idx], bank_src[idx], tr)

        def body(c, xs):
            idx, k = xs
            batch = make(idx, k)
            if self._batch_sharding is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, self._batch_sharding)
            l, r, t = self._eval(state, batch)
            return c, jnp.stack([l, r, t])

        tot = jnp.zeros((3,), jnp.float32)
        count = 0.0
        if idx_full.shape[0] > 0:
            _, vals = jax.lax.scan(body, 0.0, (idx_full, keys_full))
            tot = tot + jnp.sum(vals, axis=0) * idx_full.shape[1]
            count += idx_full.shape[0] * idx_full.shape[1]
        if idx_tail.shape[0] > 0:
            batch = make(idx_tail, key_tail)
            if self._repl_sharding is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, self._repl_sharding)
            l, r, t = self._eval(state, batch)
            tot = tot + jnp.stack([l, r, t]) * idx_tail.shape[0]
            count += idx_tail.shape[0]
        return tot / count

    # -- epoch drivers -----------------------------------------------------

    def init_state(self, key: jax.Array) -> TrainState:
        k_model, k_crit = jax.random.split(key)
        params = self.model.init(k_model)
        state = TrainState(params, self.opt.init(params),
                           self.crit_init(k_crit), jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = jax.device_put(state, self._repl_sharding)
        return state

    def train_one_epoch(self, state, dataset, indices, key, rng):
        if self.cfg.fused_epoch and not self.cfg.nan_guard:
            return self._train_one_epoch_fused(state, dataset, indices,
                                               key, rng)
        total, count = 0.0, 0
        for batch in dataset.batches(key, indices, self.cfg.batch_size,
                                     shuffle=True, rng=rng):
            batch = self._shard_batch(batch)
            new_state, loss = self._train_step(state, batch, train=True)
            loss = float(loss)
            if self.cfg.nan_guard and not np.isfinite(loss):
                self._dump_nan_forensics(state, batch, loss)
            state = new_state
            total += loss
            count += 1
        return state, total / max(count, 1)

    def _train_one_epoch_fused(self, state, dataset, indices, key, rng):
        """Same shuffle/key discipline as ``dataset.batches`` (shuffled rows,
        dropped remainder, one split key per batch) — one dispatch total."""
        bs = self.cfg.batch_size
        idx = np.array(indices)
        (rng or np.random.default_rng()).shuffle(idx)
        n_batches = len(idx) // bs
        if n_batches == 0:
            return state, 0.0
        idx_mat = jnp.asarray(idx[:n_batches * bs].reshape(n_batches, bs))
        keys = jax.random.split(key, n_batches)
        bank_src, bank_tgt = self._banks(dataset)
        state, mean_loss = self._fused_epoch(state, bank_src, bank_tgt,
                                             idx_mat, keys)
        return state, float(mean_loss)

    def _banks(self, dataset):
        """On-device cloud banks. The cache lives on the Trainer (not the
        dataset object): device placement depends on this trainer's mesh,
        and mutating a shared dataset would leak one trainer's placement
        into another's run. The key includes a cheap content fingerprint so
        a caller mutating dataset.sources/targets between fit() calls cannot
        silently train on stale banks (ADVICE r3)."""
        fp = (id(dataset), len(dataset),
              dataset.sources.ctypes.data if hasattr(dataset.sources, "ctypes")
              else id(dataset.sources),
              dataset.targets.ctypes.data if hasattr(dataset.targets, "ctypes")
              else id(dataset.targets))
        cache = getattr(self, "_bank_cache", None)
        if cache is None or cache[0] != fp:
            src = jnp.asarray(dataset.sources)
            tgt = jnp.asarray(dataset.targets)
            if self.mesh is not None:
                src = jax.device_put(src, self._repl_sharding)
                tgt = jax.device_put(tgt, self._repl_sharding)
            self._bank_cache = (fp, (src, tgt))
        return self._bank_cache[1]

    def _dump_nan_forensics(self, state, batch, loss):
        """Reference nan_check semantics
        (max_spherical_w_cos_with_regulation.py:133-142, 529-553): persist the
        offending inputs and the pre-step train state (incl. phi params/opt),
        then raise."""
        dump_dir = Path(self.cfg.log_dir) / self.cfg.experiment / "nan_dump"
        dump_dir.mkdir(parents=True, exist_ok=True)
        np.savez(dump_dir / "batch.npz",
                 source=np.asarray(batch.source),
                 target=np.asarray(batch.target),
                 igt_rotation=np.asarray(batch.igt_rotation),
                 igt_translation=np.asarray(batch.igt_translation))
        save_checkpoint(dump_dir / "state_pre_step", state,
                        int(state.epoch) if np.ndim(state.epoch) == 0 else 0)
        raise FloatingPointError(
            f"non-finite train loss ({loss}); batch and pre-step state "
            f"dumped to {dump_dir}")

    def eval_one_epoch(self, state, dataset, indices, key):
        """Sample-weighted validation means over ALL val items.

        Uses drop_remainder=False so a val split smaller than batch_size
        still evaluates (the round-1 empty-val bug); raises rather than
        silently returning 0.0 when there is nothing to evaluate.
        """
        if self.cfg.fused_epoch:
            idx = np.array(indices)
            if len(idx) == 0:
                raise ValueError(
                    "validation set produced no batches — check val_split / "
                    "batch_size (the val index set itself is empty)")
            bs = self.cfg.batch_size
            n_full = len(idx) // bs
            keys = jax.random.split(key, n_full + 1)
            bank_src, bank_tgt = self._banks(dataset)
            out = self._fused_eval(
                state, bank_src, bank_tgt,
                jnp.asarray(idx[:n_full * bs].reshape(n_full, bs)),
                keys[:n_full], jnp.asarray(idx[n_full * bs:]), keys[n_full])
            l, r, t = np.asarray(out)
            return float(l), float(r), float(t)
        loss_sum = rot_sum = trans_sum = 0.0
        n_items = 0
        for batch in dataset.batches(key, indices, self.cfg.batch_size,
                                     shuffle=False, drop_remainder=False):
            batch = self._shard_batch(batch)
            loss, r, t = self._eval_step(state, batch)
            b = batch.source.shape[0]
            loss_sum += float(loss) * b
            rot_sum += float(r) * b
            trans_sum += float(t) * b
            n_items += b
        if n_items == 0:
            raise ValueError(
                "validation set produced no batches — check val_split / "
                "batch_size (eval never drops remainders, so this means the "
                "val index set itself is empty)")
        return (loss_sum / n_items, rot_sum / n_items, trans_sum / n_items)

    # -- full run ----------------------------------------------------------

    def fit(self, train_ds: RegistrationDataset,
            val_ds: Optional[RegistrationDataset] = None,
            verbose: bool = True) -> dict:
        cfg = self.cfg
        log_dir = Path(cfg.log_dir) / cfg.experiment
        models_dir = log_dir / "models"
        models_dir.mkdir(parents=True, exist_ok=True)
        cfg.save(log_dir / "config.json")
        logger = RunLogger(log_dir)

        rng = np.random.default_rng(cfg.seed)
        key = jax.random.PRNGKey(cfg.seed)
        k_init, key = jax.random.split(key)
        state = self.init_state(k_init)

        if cfg.load_model and cfg.load_model != "None":
            state, start_epoch = load_checkpoint(cfg.load_model, state)
            if self.mesh is not None:
                state = jax.device_put(state, self._repl_sharding)
        else:
            start_epoch = 0

        if val_ds is None:
            train_idx, val_idx = train_ds.train_val_indices(rng)
            val_src = train_ds
        else:
            train_idx = np.arange(len(train_ds))
            val_idx = np.arange(len(val_ds))
            val_src = val_ds

        best = {"loss": np.inf, "rot": np.inf, "trans": np.inf}
        # Best-state snapshots stay ON DEVICE: with functional updates a
        # snapshot is just a reference to that epoch's immutable buffers,
        # so tracking a new best is free. The host fetch + npz write costs
        # seconds per save over a remote-device link (it dominated short
        # trainings: 0.06s epochs, 7s saves), so disk flushes happen every
        # cfg.checkpoint_flush_every epochs and at the end of fit — same
        # three best-checkpoint families as train_W_COS.py:198-235.
        snap_files = {"loss": "best_model_snap", "rot": "best_rot_error_snap",
                      "trans": "best_trans_error_snap",
                      "combined": "best_combined_snap"}
        best["combined"] = np.inf
        pending_snaps: dict = {}

        def flush_snaps():
            for fam, (s, ep) in pending_snaps.items():
                save_checkpoint(models_dir / snap_files[fam], s, ep)
            pending_snaps.clear()

        history = []
        # exception/^C-safe flush (ADVICE r4): a timeout-killed
        # (SIGTERM/KeyboardInterrupt) or crashed run still writes every best
        # state tracked so far; only SIGKILL can lose improvements since the
        # last periodic flush. SIGTERM does not unwind Python frames by
        # default, so convert it to KeyboardInterrupt for the duration of
        # the fit (the project queue kills long stages with `timeout`).
        import signal

        def _term(signum, frame):
            raise KeyboardInterrupt("SIGTERM")

        try:
            old_term = signal.signal(signal.SIGTERM, _term)
            term_installed = True
        except ValueError:          # not the main thread
            old_term, term_installed = None, False
        try:
            for epoch in range(start_epoch, cfg.num_epochs):
                t0 = time.perf_counter()
                key, k_train, k_val = jax.random.split(key, 3)
                state, train_loss = self.train_one_epoch(
                    state, train_ds, train_idx, k_train, rng)
                val_loss, rot_err, trans_err = self.eval_one_epoch(
                    state, val_src, val_idx, k_val)
                dt = time.perf_counter() - t0

                improved = val_loss < best["loss"]
                if not improved and self._early_stop_enabled:
                    # early-stop variant (regulation.py:795-855): a
                    # non-improving epoch counts a strike; past the limit the
                    # SHWD inner adversarial loop is skipped (lax.cond in
                    # SHWDLoss.apply)
                    state = state._replace(
                        crit_state=state.crit_state._replace(
                            strikes=state.crit_state.strikes + 1))
                if improved:
                    best["loss"] = val_loss
                    pending_snaps["loss"] = (state, epoch + 1)
                if rot_err < best["rot"]:
                    best["rot"] = rot_err
                    pending_snaps["rot"] = (state, epoch + 1)
                if trans_err < best["trans"]:
                    best["trans"] = trans_err
                    pending_snaps["trans"] = (state, epoch + 1)
                if cfg.checkpoint_combined_weight > 0:
                    comb = rot_err + cfg.checkpoint_combined_weight * trans_err
                    if comb < best["combined"]:
                        best["combined"] = comb
                        pending_snaps["combined"] = (state, epoch + 1)
                if (cfg.checkpoint_flush_every
                        and (epoch + 1) % cfg.checkpoint_flush_every == 0):
                    flush_snaps()

                row = dict(epoch=epoch + 1, train_loss=train_loss,
                           val_loss=val_loss, best_loss=best["loss"],
                           rot_error=rot_err, best_rot_error=best["rot"],
                           trans_error=trans_err,
                           best_trans_error=best["trans"], seconds=dt)
                history.append(row)
                logger.log(row)
                if verbose:
                    # reference prints losses x100 (train_W_COS.py:248)
                    print(f"EPOCH:: {epoch+1}, Training Loss: "
                          f"{train_loss*100:.4f}, Val Loss: {val_loss*100:.4f},"
                          f" Rot error: {rot_err:.3f},"
                          f" Trans error: {trans_err:.4f}, Time: {dt:.2f}s")
        finally:
            flush_snaps()
            if term_installed:
                # restore keyed on "we installed", not "old was non-None"
                # (signal.signal returns None when the previous disposition
                # was set outside Python)
                signal.signal(signal.SIGTERM,
                              old_term if old_term is not None
                              else signal.SIG_DFL)
        return {"best": best, "history": history, "state": state}
