"""Checkpointing: orbax-backed train-state save/restore.

Replaces the reference's per-driver torch.save dicts
({epoch, state_dict, optimizer} every `saving_checkpoints` epochs plus
best_model variants — train.py:1005-1021, train_coarse_depth.py:620-640)
with one manager:

  * layout: {root}/{experiment_name}/  with numbered step dirs + a
    'best' alias, mirroring ./checkpoints/<exp>/checkpoint_<epoch>.pth;
  * payload: full TrainState (params, batch_stats, opt_state, step) plus an
    aux dict (e.g. bin_centers/bin_edges for the coarse family);
  * auto-resume-from-latest (the reference makes you pass --checkpoints N;
    here latest() finds it), fixing the reference inconsistency where
    train.py forgot to restore optimizer state (train.py:604-605).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..train.engine import TrainState


_EMPTY_AUX = {"__empty__": np.zeros((1,), np.float32)}


class CheckpointManager:
    def __init__(self, root: str, experiment_name: str, max_to_keep: int = 20):
        self.directory = os.path.abspath(os.path.join(root, experiment_name))
        os.makedirs(self.directory, exist_ok=True)
        # item_handlers makes item_metadata() work on a FRESH manager (a
        # different process restoring this directory) without absl warning
        # spam ("Item 'default' ... could not be restored") — the handler
        # registry is what lets orbax map the on-disk item to a type.
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    def save(self, epoch: int, state: TrainState, aux: Optional[Dict[str, Any]] = None,
             metrics: Optional[Dict[str, float]] = None) -> None:
        if epoch in (self._mgr.all_steps() or []):
            return  # idempotent: best-save and periodic-save can coincide
        # constant payload structure so restore templates always match
        payload = {"state": state, "aux": aux if aux else _EMPTY_AUX}
        self._mgr.save(
            epoch, args=ocp.args.StandardSave(payload),
            metrics={k: float(v) for k, v in (metrics or {}).items()} or None,
        )

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    # -- 'best' alias ---------------------------------------------------
    # The reference keys best_model.pth next to the numbered checkpoints
    # (train.py:897-909); here the best epoch is recorded in best.json so
    # any tool can resolve it without knowing the metric history.
    def mark_best(self, epoch: int, metric: Optional[str] = None,
                  value: Optional[float] = None) -> None:
        import json

        with open(os.path.join(self.directory, "best.json"), "w") as f:
            json.dump({"epoch": int(epoch), "metric": metric,
                       "value": None if value is None else float(value)}, f)

    def best_epoch(self) -> Optional[int]:
        import json

        path = os.path.join(self.directory, "best.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return int(json.load(f)["epoch"])

    def restore(self, state_template: TrainState, epoch=None,
                aux_template: Optional[Dict[str, Any]] = None):
        """Restore (state, aux, epoch) at `epoch` (default latest; 'best'
        resolves via best.json)."""
        if epoch == "best":
            epoch = self.best_epoch()
            if epoch is None:
                raise FileNotFoundError(
                    f"no best.json under {self.directory} (no validation ran?)"
                )
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        # discover aux structure from on-disk metadata when not provided
        # (works in a fresh process too — see item_handlers in __init__)
        if aux_template is None:
            meta = self._mgr.item_metadata(epoch)
            aux_meta = meta.tree.get("aux") if hasattr(meta, "tree") else None
            if aux_meta is not None:
                aux_template = jax.tree_util.tree_map(
                    lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), aux_meta
                )
        template = {"state": state_template, "aux": aux_template or _EMPTY_AUX}
        restored = self._mgr.restore(epoch, args=ocp.args.StandardRestore(template))
        aux = restored.get("aux")
        if aux is not None and set(aux) == set(_EMPTY_AUX):
            aux = None
        return restored["state"], aux, epoch

    def restore_eval(self, epoch=None):
        """Restore (params, batch_stats, aux, epoch) without an optimizer.

        Export/eval tools have no optimizer, so they cannot build the
        opt_state template restore() needs. Here the FULL restore template
        (including opt_state) is derived from the on-disk metadata, the
        checkpoint is restored against it, and the opt_state is discarded.
        Works on any real training checkpoint regardless of optimizer.
        """
        if epoch == "best":
            epoch = self.best_epoch()
            if epoch is None:
                raise FileNotFoundError(f"no best.json under {self.directory}")
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        # build the FULL template from on-disk metadata (ShapeDtypeStructs):
        # a template-free StandardRestore would work but warns UNSAFE; the
        # handler registry makes item_metadata available in any process
        meta = self._mgr.item_metadata(epoch)
        # eval/export tools are single-device consumers — pin the restore
        # sharding explicitly (a bare ShapeDtypeStruct warns and re-reads
        # the sharding file per leaf)
        dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        template = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=dev),
            meta.tree,
        )
        restored = self._mgr.restore(epoch, args=ocp.args.StandardRestore(template))
        state = restored["state"]
        aux = restored.get("aux")
        if aux is not None and set(aux) == set(_EMPTY_AUX):
            aux = None
        return state["params"], state.get("batch_stats"), aux, epoch

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


class BestTracker:
    """Best-model tracking by a chosen metric (train.py:613-620,873-913).

    delta1 is maximized; every other metric (rmse/abs_rel/mae/loss) is
    minimized.
    """

    MAXIMIZE = {"delta1", "delta2", "delta3"}

    def __init__(self, metric: str = "rmse"):
        self.metric = metric
        self.best_value: Optional[float] = None
        self.best_epoch: Optional[int] = None

    def update(self, epoch: int, metrics: Dict[str, float]) -> bool:
        value = float(metrics[self.metric])
        better = (
            self.best_value is None
            or (value > self.best_value if self.metric in self.MAXIMIZE
                else value < self.best_value)
        )
        if better:
            self.best_value = value
            self.best_epoch = epoch
        return better
