"""The single training engine: jitted train/eval steps + epoch driver.

Replaces the reference's seven copy-pasted driver loops (SURVEY §1) with one
engine parameterized by a Task. TPU-first properties:
  * the whole step — device front end, forward, loss, backward, clip, update,
    BatchNorm stat update — is ONE jitted XLA graph with donated state;
  * the epoch index enters as a traced scalar so curriculum schedules
    (adaptive loss weights, detach phases) never retrace;
  * with a data mesh, batches are sharded on dim 0 and parameters are
    replicated; XLA inserts the grad all-reduce over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..configs import Config
from ..parallel.mesh import (
    model_axes_cross_processes,
    pad_batch_to,
    replicate,
    shard_batch,
    shard_global_batch,
)
from .optim import make_optimizer
from .tasks import Task


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class Engine:
    def __init__(
        self,
        cfg: Config,
        task: Task,
        mesh=None,
        steps_per_epoch: int = 1,
    ):
        self.cfg = cfg
        self.task = task
        self.mesh = mesh
        if (mesh is not None and "model" in mesh.axis_names
                and mesh.shape["model"] > 1 and hasattr(task, "attach_mesh")):
            # sequence-parallel layouts: frame-sharded STFT front end
            task.attach_mesh(mesh)
        self.tx = make_optimizer(cfg.mode, steps_per_epoch)
        from .optim import make_schedule

        self._lr_schedule = make_schedule(cfg.mode, steps_per_epoch)
        self._steps_per_epoch = steps_per_epoch
        # compact-transport decode scale: the dataset's STORED depth range
        # (normalized [0,1] or meters — data/codec.py::depth_storage_units)
        from ..data.codec import depth_storage_units

        self._depth_units = depth_storage_units(cfg)
        # float64 mode is the parity/debug path: ship exact f32 batches
        # instead of the compact int16/uint16 transport — the uint16 depth
        # quantum (0.46 mm at 30 m) perturbs gradients at ~1e-5, which the
        # f64 driver A/B (tests/test_driver_parity.py) resolves
        self._encode_units = (None if cfg.mode.compute_dtype == "float64"
                              else self._depth_units)
        if cfg.mode.debug_nans:
            # numeric sanitizer (the reference's closest analogue is its
            # scattered NaN scrubbing — SURVEY §5); fails fast on NaN/Inf
            jax.config.update("jax_debug_nans", True)

        from ..data.codec import decode_batch

        def train_step(state: TrainState, batch, epoch):
            if "_valid" in batch:
                raise ValueError(
                    "padded batches (_valid mask) are eval-only; train "
                    "loaders must produce shardable batches (drop_last)"
                )
            batch = decode_batch(batch, self._depth_units)
            rng = jax.random.fold_in(jax.random.PRNGKey(cfg.mode.seed), state.step)
            grad_fn = jax.value_and_grad(task.loss_fn, has_aux=True)
            (loss, (new_stats, aux)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng, epoch
            )
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            # frozen subtrees (e.g. the AdaBins RGB teacher): zero their
            # updates so neither momentum nor weight decay moves them
            # (the reference builds its optimizer over requires_grad params
            # only, train_adabins_distillation.py:369-387)
            for frozen in getattr(task, "frozen_param_paths", ()):
                if frozen in updates:
                    updates = dict(updates)
                    updates[frozen] = jax.tree_util.tree_map(
                        jnp.zeros_like, updates[frozen]
                    )
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates
            )
            metrics = dict(aux)
            metrics["grad_norm"] = jnp.sqrt(
                sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(grads))
            )
            return (
                TrainState(
                    step=state.step + 1,
                    params=new_params,
                    batch_stats=new_stats if new_stats is not None else state.batch_stats,
                    opt_state=new_opt,
                ),
                metrics,
            )

        def eval_core(state: TrainState, batch, epoch):
            # ragged tails arrive padded to a shardable size with a _valid
            # row mask (put_batch / multihost.local_shard); metrics from
            # pad rows are zeroed and the mask is returned so evaluate()
            # divides by the true sample count
            batch = dict(batch)
            valid = batch.pop("_valid", None)
            batch = decode_batch(batch, self._depth_units)
            out = task.eval_metrics(state.params, state.batch_stats, batch)
            # the reference driver's val LOSS is a per-BATCH scalar — the
            # training criterion on the pooled valid pixels of the whole
            # batch (train.py:744-771) — aggregated as an equal-weight mean
            # over batches (np.mean(batch_loss_val), train.py:842). That is
            # a different quantity from the per-sample 'loss' above
            # (test.py:240 semantics); both are reported. Pad rows carry
            # depth == 0, so the criterion's gt-mask excludes them.
            # epoch rides along (0-based, same scalar the train step sees)
            # so curriculum criteria — adaptive base_residual weights,
            # binaural phase — evaluate with the CURRENT epoch's weights
            # like the reference drivers do (train_base_residual.py:436-452)
            crit = getattr(task, "eval_criterion_loss", None)
            batch_loss = (crit(state.params, state.batch_stats, batch,
                               epoch, valid=valid)
                          if crit is not None else None)
            if valid is not None:
                valid = valid.astype(jnp.float32)
                out = {k: v * valid for k, v in out.items()}
                out["_valid"] = valid
            if batch_loss is not None:
                out["_batch_criterion_loss"] = batch_loss
            return out, batch

        def eval_step(state: TrainState, batch, epoch):
            return eval_core(state, batch, epoch)[0]

        def eval_step_pred(state: TrainState, batch, epoch):
            # metrics + prediction/gt in meters from ONE graph: XLA CSEs
            # the shared eval-mode forward, so --visualize/--save_tensors
            # costs no second forward pass over the split
            out, dec = eval_core(state, batch, epoch)
            pred_m = task.predict_meters(state.params, state.batch_stats, dec)
            return out, pred_m, task.to_meters(dec["depth"])

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)
        self._eval_step_pred = jax.jit(eval_step_pred)
        # diagnostics/visualization forward (first val batch each
        # validation): jitted once so it compiles on first use instead of
        # dispatching op-by-op every validation epoch
        self._predict_meters = jax.jit(
            lambda params, stats, batch: task.predict_meters(params, stats, batch)
        )

        def init_fn(rng, batch):
            variables = task.init(rng, batch)
            params = variables["params"]
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=variables.get("batch_stats"),
                opt_state=self.tx.init(params),
            )

        # ONE compiled graph for model + optimizer init: eager init is
        # hundreds of op-by-op dispatches, which on a remote-tunnel platform
        # costs minutes of round trips before training even starts
        self._init_fn = jax.jit(init_fn)

    # ------------------------------------------------------------------
    def _snapshot_state(self, state: "TrainState") -> "TrainState":
        """Copy the epoch-boundary state out of the donation path.

        train_step donates its input buffers (donate_argnums=0), so a live
        reference retained across the next epoch's first step is invalidated
        ("Array has been deleted") exactly when the preemption save would
        read it. Prefer the device's host memory space — zero HBM cost, and
        on remote platforms the copy stays on the device host — and fall
        back to an on-device copy where memory kinds are unsupported.
        """
        mode = getattr(self, "_snapshot_mode", None)
        if mode in (None, "pinned_host"):
            try:
                snap = jax.tree.map(
                    lambda x: jax.device_put(
                        x, x.sharding.with_memory_kind("pinned_host")),
                    state,
                )
                if mode is None:
                    # validate the mode EAGERLY: device_put can defer
                    # failure to execution on backends where the memory-kind
                    # API exists but transfers don't work — caching
                    # 'pinned_host' on a latent error would surface it
                    # inside the SIGTERM grace window, losing the save
                    np.asarray(jax.tree_util.tree_leaves(snap)[0])
                self._snapshot_mode = "pinned_host"
                return snap
            except Exception:
                self._snapshot_mode = "copy"
        return jax.tree.map(jnp.copy, state)

    def init_state(self, rng: jax.Array, sample_batch) -> TrainState:
        with self._mesh_ctx():
            return self._init_state(rng, sample_batch)

    def _init_state(self, rng: jax.Array, sample_batch) -> TrainState:
        state = self._init_fn(rng, sample_batch)
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    def put_batch(self, batch):
        # already device-resident (e.g. from data.prefetch): pass through
        if all(isinstance(v, jax.Array) for v in batch.values()):
            return batch
        if self.mesh is not None:
            axis_size = self.mesh.shape[self.cfg.mode.data_axis]
            local_b = next(iter(batch.values())).shape[0]
            if model_axes_cross_processes(self.mesh, self.cfg.mode.data_axis):
                # GLOBAL-batch convention: when a >1 model/sp axis spans
                # process boundaries (e.g. a (2,2) 'data'×'model' mesh over
                # 4 single-chip hosts), per-process contiguous row slices
                # no longer tile the data axis — every host must pass the
                # IDENTICAL global batch; each device reads its own slice.
                if local_b % axis_size != 0:
                    batch = pad_batch_to(
                        batch, -(-local_b // axis_size) * axis_size)
                return shard_global_batch(
                    batch, self.mesh, self.cfg.mode.data_axis)
            # Otherwise the ONE batch convention: the incoming dict always
            # holds this host's LOCAL rows of the global batch
            # (single-process: the whole batch). Ragged eval tails are
            # padded to a shardable size with a _valid row mask instead of
            # replicated — the round-2 dual convention (shard-or-replicate
            # by divisibility) was ambiguous and host-divergent for
            # multi-process tails.
            if (local_b * jax.process_count()) % axis_size != 0:
                if jax.process_count() > 1:
                    raise ValueError(
                        f"local batch of {local_b} rows x "
                        f"{jax.process_count()} processes does not divide "
                        f"the '{self.cfg.mode.data_axis}' axis "
                        f"({axis_size}); slice ragged eval batches with "
                        f"parallel.multihost.local_shard so every host "
                        f"pads identically"
                    )
                batch = pad_batch_to(batch, -(-local_b // axis_size) * axis_size)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            return shard_batch(batch, self.mesh, self.cfg.mode.data_axis)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _mesh_ctx(self):
        # sharding constraints inside models (e.g. sequence-parallel
        # attention) need a mesh context to resolve PartitionSpecs
        import contextlib

        if self.mesh is not None:
            return jax.set_mesh(self.mesh)
        return contextlib.nullcontext()

    def train_step(self, state, batch, epoch: float = 0.0):
        with self._mesh_ctx():
            return self._train_step(state, self.put_batch(batch), jnp.float32(epoch))

    def eval_step(self, state, batch, epoch: float = 0.0):
        with self._mesh_ctx():
            return self._eval_step(state, self.put_batch(batch),
                                   jnp.float32(epoch))

    def eval_step_pred(self, state, batch, epoch: float = 0.0):
        """(per-sample metrics, pred meters, gt meters) in one forward."""
        with self._mesh_ctx():
            return self._eval_step_pred(state, self.put_batch(batch),
                                        jnp.float32(epoch))

    def predict_meters(self, state, batch):
        """Jitted depth forward in meters on a DECODED device batch."""
        with self._mesh_ctx():
            return self._predict_meters(state.params, state.batch_stats, batch)

    # ------------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        train_batches: Callable[[], Iterable],
        val_batches: Optional[Callable[[], Iterable]] = None,
        epochs: Optional[int] = None,
        start_epoch: int = 1,
        ckpt_manager=None,
        best_tracker=None,
        logger=None,
        holdout_batches: Optional[Dict[str, Callable[[], Iterable]]] = None,
        vis_callback=None,
        profiler=None,
    ) -> TrainState:
        """Full training driver (the engine replacing the reference's seven
        copy-pasted loops — SURVEY §1): epoch loop with per-epoch timing,
        validation every validation_iter epochs (train.py:726), best-model
        tracking (train.py:873-913), periodic checkpoints every
        saving_checkpoints epochs (train.py:1005-1021), per-sequence holdout
        evaluation (train.py:915-999), and a host visualization callback on
        the first validation batch (train.py:861-871).

        train_batches/val_batches are zero-arg callables returning a fresh
        iterator (epoch reshuffles live in the callable).
        """
        import signal as _signal
        import time as _time

        cfg = self.cfg.mode
        epochs = epochs or cfg.epochs
        # preemption-safe checkpointing (beyond the reference, which loses
        # everything since the last periodic save): TPU preemption and
        # maintenance events deliver SIGTERM with a grace window. On
        # SIGTERM, stop at the next step boundary, DISCARD the partial
        # epoch, and checkpoint the last completed epoch so --resume
        # continues exactly where training left off.
        self.preempted = False
        preempt = {"sig": None}
        old_handler = None
        installed = False
        if ckpt_manager is not None and getattr(cfg, "save_on_preempt", True):
            def _on_term(signum, frame):
                preempt["sig"] = signum
                print(f"[engine] caught signal {signum}: stopping at the next "
                      f"step boundary to checkpoint the last completed epoch")

            try:
                old_handler = _signal.signal(_signal.SIGTERM, _on_term)
                installed = True
            except ValueError:  # not the main thread (e.g. test workers)
                installed = False
        completed_epoch = start_epoch - 1
        # snapshot even the INITIAL state when the handler is live: the first
        # train_step donates the caller's buffers, so a SIGTERM inside the
        # first in-progress epoch must not return deleted arrays
        completed_state = self._snapshot_state(state) if installed else state
        # profile the first post-compile epoch (obs.logging.ProfilerHook):
        # epoch start_epoch pays the XLA compile, so trace the next one
        profile_epoch = min(start_epoch + 1, epochs) if profiler else None
        try:
            for epoch in range(start_epoch, epochs + 1):
                if preempt["sig"] is not None:
                    break
                if profiler is not None and epoch == profile_epoch:
                    profiler.start()
                t0 = _time.perf_counter()
                n_samples = 0
                n_steps = 0
                loss_sum = None
                last_metrics: Dict[str, Any] = {}
                from ..data.prefetch import device_prefetch

                for batch in device_prefetch(train_batches(), self.mesh,
                                             self.cfg.mode.data_axis,
                                             encode_units=self._encode_units):
                    if preempt["sig"] is not None:
                        break
                    n_samples += int(next(iter(batch.values())).shape[0])
                    state, metrics = self.train_step(state, batch, epoch=float(epoch - 1))
                    last_metrics = metrics
                    if metrics.get("loss") is not None:
                        # epoch metrics = MEAN over steps (np.mean(batch_loss)
                        # and the per-component means the family drivers log,
                        # train.py:712-713, train_base_residual.py:395-411) —
                        # every scalar aux accumulates lazily on device;
                        # grad_norm keeps its last-step semantics. The single
                        # host readback below also serves as the epoch-time
                        # sync point.
                        comp = {k: v for k, v in metrics.items()
                                if k != "grad_norm"
                                and getattr(v, "ndim", None) == 0}
                        loss_sum = (comp if loss_sum is None else
                                    {k: loss_sum[k] + v
                                     for k, v in comp.items()})
                        n_steps += 1
                if preempt["sig"] is not None:
                    break  # partial epoch: fall through to the preemption save
                if loss_sum is not None:
                    # host readback, not block_until_ready: the latter does
                    # not wait for compute on remote-tunnel platforms, which
                    # would make epoch_time measure dispatch only
                    for k, v in loss_sum.items():
                        last_metrics[k] = float(v) / n_steps
                dt = _time.perf_counter() - t0
                if profiler is not None and epoch == profile_epoch:
                    profiler.stop()
                    print(f"profiler trace for epoch {epoch}: {profiler.log_dir}")
                if logger:
                    chips = max(jax.device_count(), 1)
                    logger.log(
                        {
                            "train/loss": last_metrics.get("loss"),
                            # per-component epoch means (loss_recon/... in
                            # the family drivers' wandb logs)
                            **{f"train/{k}": v
                               for k, v in last_metrics.items()
                               if k not in ("loss", "grad_norm")
                               and isinstance(v, float)},
                            "train/grad_norm": last_metrics.get("grad_norm"),
                            # the lr this epoch STARTED at — epoch N's steps run
                        # the schedule from (N-1)*steps_per_epoch
                        "train/lr": float(self._lr_schedule((epoch - 1) * self._steps_per_epoch)),
                            "train/epoch_time": dt,
                            "train/pairs_per_sec_per_chip": n_samples / max(dt, 1e-9) / chips,
                        },
                        step=epoch,
                    )

                if val_batches is not None and cfg.validation and epoch % cfg.validation_iter == 0:
                    val = self.evaluate(state, val_batches(),
                                        epoch=float(epoch - 1))
                    if logger and val:
                        logger.log({f"val/{k}": v for k, v in val.items()}, step=epoch)
                    # in-loop runtime diagnostics (train.py:676-708 analogues):
                    # negative/stuck-at-zero prediction detectors on the first
                    # validation batch
                    first = next(iter(val_batches()), None)
                    if first is not None and (vis_callback is not None or logger is not None):
                        from ..data.codec import decode_batch as _decode

                        first_dev = _decode(self.put_batch(first), self._depth_units)
                        first_dev.pop("_valid", None)  # pad mask, not a field
                        pred = np.asarray(self.predict_meters(state, first_dev))
                        # put_batch may have padded a ragged batch to a
                        # shardable size; drop the synthetic rows so pred
                        # stays row-aligned with `first` for the callback
                        # and the detectors never scan fabricated data
                        pred = pred[:next(iter(first.values())).shape[0]]
                        if (pred < 0).any():
                            print(f"WARNING epoch {epoch}: negative depth predictions "
                                  f"(min={pred.min():.4f})")
                        if np.abs(pred).max() < 1e-6:
                            print(f"WARNING epoch {epoch}: predictions stuck at zero")
                        if vis_callback is not None:
                            vis_callback(epoch, first, pred)
                    if best_tracker is not None and val and best_tracker.update(epoch, val):
                        if ckpt_manager is not None:
                            aux = getattr(self.task, "checkpoint_aux", lambda: None)()
                            ckpt_manager.save(epoch, state, aux=aux, metrics=val)
                            ckpt_manager.mark_best(
                                epoch, best_tracker.metric, best_tracker.best_value)
                    for name, hb in (holdout_batches or {}).items():
                        h = self.evaluate(state, hb(), epoch=float(epoch - 1))
                        if logger and h:
                            logger.log({f"holdout/{name}/{k}": v for k, v in h.items()}, step=epoch)

                if ckpt_manager is not None and epoch % cfg.saving_checkpoints == 0:
                    aux = getattr(self.task, "checkpoint_aux", lambda: None)()
                    ckpt_manager.save(epoch, state, aux=aux)
                completed_epoch = epoch
                # snapshot out of the donation path: the next epoch's first
                # train_step invalidates `state`'s buffers (see _snapshot_state)
                completed_state = (
                    self._snapshot_state(state) if installed else state)
        finally:
            if profiler is not None:
                profiler.stop()  # idempotent; finalizes the trace if a
                # preemption broke out of the profiled epoch mid-window
            if installed:
                _signal.signal(_signal.SIGTERM, old_handler or _signal.SIG_DFL)
        if preempt["sig"] is not None:
            self.preempted = True
            if ckpt_manager is not None and completed_epoch >= start_epoch:
                aux = getattr(self.task, "checkpoint_aux", lambda: None)()
                ckpt_manager.save(completed_epoch, completed_state, aux=aux)
                ckpt_manager.wait()
                print(f"[engine] preemption checkpoint saved at epoch "
                      f"{completed_epoch}; resume with --resume")
            else:
                print("[engine] preempted before the first epoch completed; "
                      "nothing new to checkpoint")
            return completed_state
        if (ckpt_manager is not None and epochs >= start_epoch
                and epochs % cfg.saving_checkpoints != 0):
            # the reference only saves on the cadence (train.py:1005-1021),
            # so a completed run's tail epochs were never serialized; always
            # checkpoint the final epoch so --resume/evaluate see the run's
            # actual end state
            aux = getattr(self.task, "checkpoint_aux", lambda: None)()
            ckpt_manager.save(epochs, state, aux=aux)
        return state

    # ------------------------------------------------------------------
    def evaluate(self, state, batches: Iterable,
                 epoch: float = 0.0) -> Dict[str, float]:
        """Mean per-sample metrics over an eval split (pad rows excluded).

        `epoch` (0-based, same scalar the train step sees) feeds epoch-
        dependent eval criteria; it does not affect the metric arrays."""
        sums: Dict[str, float] = {}
        count = 0.0
        crit_sum, n_batches = 0.0, 0
        for batch in batches:
            out = dict(self.eval_step(state, batch, epoch))
            valid = out.pop("_valid", None)
            # per-BATCH criterion loss: equal-weight mean over batches,
            # replicating np.mean(batch_loss_val) (train.py:842) exactly —
            # including its equal weighting of a ragged tail batch
            bl = out.pop("_batch_criterion_loss", None)
            if bl is not None:
                crit_sum += float(bl)
                n_batches += 1
            if valid is not None:
                count += float(jnp.sum(valid))
            else:
                count += int(next(iter(out.values())).shape[0])
            for k, v in out.items():
                sums[k] = sums.get(k, 0.0) + float(jnp.sum(v))
        if count == 0:
            return {}
        result = {k: v / count for k, v in sums.items()}
        if n_batches:
            result["criterion_loss"] = crit_sum / n_batches
        return result
