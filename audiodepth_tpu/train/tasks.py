"""Task definitions: the per-model-family glue between data, model, and loss.

The reference re-implements its whole train loop once per model family
(train.py, train_cvae.py, train_base_residual.py, ... — SURVEY §1). Here ONE
engine (train/engine.py) drives any Task; a Task owns the model, the
criterion, the input preparation (device front end), and the
training/eval-time output semantics for its family.

Batch convention: dict of arrays with leading batch dim —
  * 'waveform' [B, C, L] raw audio (front end runs inside the jitted step), or
  * 'input'    [B, H, W, C] pre-computed model input (NHWC), and
  * 'depth'    [B, H, W, 1] ground truth in dataset units (normalized to
               [0,1] when cfg.dataset.depth_norm, meters otherwise).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import Config
from ..data.frontend import make_frontend
from ..losses import make_criterion
from ..metrics import EVAL_PRED_MIN, compute_errors_batch
from ..models.unet import build_unet


class Task:
    """Base task: subclasses set self.model and override loss/predict."""

    name = "base"

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.max_depth = float(cfg.dataset.max_depth)
        self.depth_norm = bool(cfg.dataset.depth_norm)
        self.criterion = make_criterion(
            cfg.mode.criterion,
            l1_weight=cfg.mode.l1_weight,
            silog_weight=cfg.mode.silog_weight,
            silog_lambda=cfg.mode.silog_lambda,
        )
        self._frontend = make_frontend(cfg)
        self.model = None  # set by subclass

    def restore_aux(self, aux) -> None:
        """Consume a checkpoint's aux payload before evaluation (e.g. the
        coarse family's bin_edges/bin_centers, which parameterize the
        forward but are not flax params). Base: nothing to restore."""

    def attach_mesh(self, mesh) -> None:
        """Rebuild the front end mesh-aware (Engine calls this when its
        mesh has a 'model' axis): plain-STFT waveforms then run through the
        halo-exchange sharded STFT (parallel/sharded_stft.py)."""
        self._frontend = make_frontend(self.cfg, mesh=mesh)

    # -- input ---------------------------------------------------------
    def prepare(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        if "input" in batch:
            return batch["input"]
        if self.cfg.model.input_nc == 3 and "image" in batch:
            # --eval_img baseline: camera image instead of audio
            return batch["image"]
        return self._frontend(batch["waveform"])

    # -- depth-unit helpers ---------------------------------------------
    # Model-output units: the UNet/cVAE families emit normalized depth when
    # depth_norm (sigmoid / identity heads); the residual/attention/adabins
    # families always emit meters (their heads bake in ×max_depth).
    pred_is_normalized = False

    def to_meters(self, depth_like: jnp.ndarray) -> jnp.ndarray:
        return depth_like * self.max_depth if self.depth_norm else depth_like

    def pred_to_meters(self, pred: jnp.ndarray) -> jnp.ndarray:
        if self.pred_is_normalized and self.depth_norm:
            return pred * self.max_depth
        return pred

    # -- model plumbing --------------------------------------------------
    def _init_call(self, rng: jax.Array, batch):
        """(rngs, args, kwargs) of one model call at the init signature.

        The single place a family's init-time call shape lives: init() and
        tabulate() both consume it, so subclasses override only this hook.
        """
        return ({"params": rng, "dropout": rng}, (self.prepare(batch),),
                {"train": False})

    def init(self, rng: jax.Array, batch: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
        rngs, args, kwargs = self._init_call(rng, batch)
        return self.model.init(rngs, *args, **kwargs)

    def tabulate(self, batch: Dict[str, jnp.ndarray]) -> str:
        """Full module tree table (architecture.txt parity, train.py:576-597)."""
        rngs, args, kwargs = self._init_call(jax.random.PRNGKey(0), batch)
        return self.model.tabulate(rngs, *args, **kwargs,
                                   console_kwargs={"width": 160})

    def apply_train(self, params, batch_stats, x, rng):
        variables = {"params": params}
        mutable = []
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out, mutated = self.model.apply(
            variables, x, train=True, mutable=mutable, rngs={"dropout": rng}
        )
        return out, mutated.get("batch_stats") if mutable else None

    def apply_eval(self, params, batch_stats, x):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return self.model.apply(variables, x, train=False)

    # -- training loss ----------------------------------------------------
    def loss_fn(
        self, params, batch_stats, batch, rng, epoch: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Tuple[Any, Dict[str, jnp.ndarray]]]:
        raise NotImplementedError

    # -- evaluation -------------------------------------------------------
    def predict_raw(self, params, batch_stats, batch) -> jnp.ndarray:
        """Final depth prediction in model units (one forward pass)."""
        x = self.prepare(batch)
        return self.apply_eval(params, batch_stats, x)

    def predict_meters(self, params, batch_stats, batch) -> jnp.ndarray:
        return self.pred_to_meters(self.predict_raw(params, batch_stats, batch))

    def eval_metrics(self, params, batch_stats, batch) -> Dict[str, jnp.ndarray]:
        """Per-sample metric arrays (train.py:782-844 validation semantics)."""
        pred = self.predict_raw(params, batch_stats, batch)
        gt = batch["depth"]
        # EVAL_PRED_MIN (one f32 ulp above the 1e-3 eps) keeps every clipped
        # pixel on the common branch of BOTH metric twins — the regime where
        # compute_errors_batch exactly equals the parity-defining np twin
        # (see metrics/errors.py; machine-checked in test_metrics.py)
        pred_m = jnp.clip(self.pred_to_meters(pred), EVAL_PRED_MIN,
                          self.max_depth)
        out = compute_errors_batch(self.to_meters(gt), pred_m, metric_scale=True)
        # eval loss: masked L1 in model units (test.py:240), computed PER
        # SAMPLE so the split mean is batch-size-independent with ragged
        # (drop_last=False) tail batches. gt is brought to the pred's units
        # (meter-emitting families on a depth_norm dataset would otherwise
        # compare meters against normalized gt).
        gt_model_units = (
            gt if (self.pred_is_normalized or not self.depth_norm)
            else gt * self.max_depth
        )
        w = (gt != 0).astype(jnp.float32)
        axes = tuple(range(1, gt.ndim))
        out["loss"] = (
            jnp.sum(jnp.abs(pred - gt_model_units) * w, axis=axes)
            / jnp.maximum(jnp.sum(w, axis=axes), 1.0)
        )
        return out


class UNetBaselineTask(Task):
    """unet_baseline: UNet-256 + masked Combined/L1/SIlog loss in meters.

    Loss semantics (train.py:646-669): valid mask is gt != 0; when
    depth_norm, the loss is computed on *denormalized* (meter-scale) pred
    and gt, with no clamping of predictions.
    """

    name = "unet_baseline"
    pred_is_normalized = True

    def __init__(self, cfg: Config, input_nc: Optional[int] = None):
        super().__init__(cfg)
        self.model = build_unet(cfg, input_nc=input_nc)

    def loss_fn(self, params, batch_stats, batch, rng, epoch):
        x = self.prepare(batch)
        pred, new_stats = self.apply_train(params, batch_stats, x, rng)
        gt = batch["depth"]
        mask = gt != 0
        loss = self.criterion(self.pred_to_meters(pred), self.to_meters(gt), mask)
        aux = {"loss": loss}
        return loss, (new_stats, aux)

    def eval_criterion_loss(self, params, batch_stats, batch, epoch,
                            valid=None):
        """The reference driver's per-batch validation LOSS: the training
        criterion on the eval-mode forward, pooled valid pixels of the
        whole batch, denormalized meters, mask gt > 0 (train.py:744-771).
        Aggregated by Engine.evaluate as an equal-weight mean over batches
        (np.mean(batch_loss_val), train.py:842) and logged as
        val/criterion_loss. Pinned by tests/test_driver_parity.py.

        `valid` is the ragged-tail row mask: pad rows REPEAT row 0 (so the
        forward sees well-formed data, parallel/mesh.py::pad_batch_to) and
        would otherwise leak fabricated pixels into the pooled criterion."""
        pred = self.predict_raw(params, batch_stats, batch)
        gt = batch["depth"]
        mask = gt > 0
        if valid is not None:
            rows = valid.reshape((-1,) + (1,) * (gt.ndim - 1))
            mask = mask & (rows > 0)
        return self.criterion(self.pred_to_meters(pred), self.to_meters(gt), mask)
