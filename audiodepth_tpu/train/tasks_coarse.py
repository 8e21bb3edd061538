"""Coarse-depth family task (train_coarse_depth.py driver semantics).

model_type dispatch: unet | lite | hybrid (CoarseWithOffset) | dual_reg
(train_coarse_depth.py:279-313). Bin centers are injected into the forward
(normalized by max_depth when depth_norm — :316-321); batches carry 'bins'
(int targets from BinnedDepthDataset) in addition to 'depth'.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..configs import Config
from ..data.bins import compute_bin_edges
from ..losses.coarse import (
    coarse_depth_loss,
    coarse_offset_loss,
    dual_regression_loss,
)
from ..models.coarse_depth import (
    CoarseDepthLite,
    CoarseDepthUNet,
    CoarseWithOffsetModel,
    DualRegressionModel,
)
from .tasks import Task


class CoarseDepthTask(Task):
    name = "coarse_depth"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        extra = cfg.model.extra
        self.model_type = cfg.model.model_type
        self.n_bins = int(cfg.model.n_bins)
        self.bin_mode = str(cfg.model.bin_strategy)
        # --use_focal flips soft-CE → focal, exactly the driver's
        # use_focal/use_soft_ce pairing (train_coarse_depth.py:348-352)
        if bool(extra.get("use_focal", False)):
            self.ce_mode = "focal"
        else:
            self.ce_mode = str(extra.get("ce_mode", "soft_ce"))
        # loss weights default to the DRIVER's argparse values
        # (train_coarse_depth.py:148-186), which its default run passes into
        # the criteria at :330-352 — including the hybrid path's
        # regression_weight=0.5 / offset_reg_weight=0.01 / label_smoothing=0.1
        # (NOT the CoarseOffsetLoss class defaults 1.0/0.1/0.0, which
        # losses/coarse.py keeps for class-level parity).
        self.ce_weight = float(extra.get("ce_weight", 1.0))
        self.regression_weight = float(extra.get("regression_weight", 0.5))
        self.offset_reg_weight = float(extra.get("offset_reg_weight", 0.01))
        self.coarse_weight = float(extra.get("coarse_weight", 1.0))
        self.final_weight = float(extra.get("final_weight", 1.0))
        self.soft_ce_sigma = float(extra.get("soft_ce_sigma", 2.0))
        from ..configs import resolve_compute_dtype

        dtype = resolve_compute_dtype(cfg)

        edges, centers = compute_bin_edges(
            self.n_bins,
            depth_min=float(extra.get("depth_min", 0.1)),
            depth_max=self.max_depth,
            mode=self.bin_mode,
            sid_alpha=float(extra.get("sid_alpha", 0.6)),
        )
        if self.depth_norm:
            # bin centers live in the model's (normalized) output space
            centers = centers / self.max_depth
        self.bin_edges = edges
        self.bin_centers = jnp.asarray(centers)

        common = dict(
            input_channels=cfg.model.input_nc,
            base_channels=cfg.model.base_channels,
            output_size=cfg.dataset.images_size,
            dtype=dtype,
        )
        if self.model_type == "unet":
            self.model = CoarseDepthUNet(n_bins=self.n_bins, **common)
        elif self.model_type == "lite":
            self.model = CoarseDepthLite(n_bins=self.n_bins, **common)
        elif self.model_type == "hybrid":
            self.model = CoarseWithOffsetModel(n_bins=self.n_bins, **common)
        elif self.model_type == "dual_reg":
            self.model = DualRegressionModel(**common)
        else:
            raise ValueError(f"unknown coarse model_type {self.model_type!r}")

    # aux payload for checkpoints (train_coarse_depth.py:620-640 embeds bins)
    def checkpoint_aux(self) -> Dict[str, Any]:
        return {"bin_edges": np.asarray(self.bin_edges),
                "bin_centers": np.asarray(self.bin_centers)}

    def restore_aux(self, aux) -> None:
        """Adopt the TRAINED bin parameterization from a checkpoint: a
        checkpoint trained with a different bin_strategy/depth_min/sid_alpha
        has the same param shapes, so without this the eval forward would
        silently soft-bin over the config-default centers."""
        if not aux:
            return
        if aux.get("bin_edges") is not None:
            self.bin_edges = np.asarray(aux["bin_edges"])
        if aux.get("bin_centers") is not None:
            centers = np.asarray(aux["bin_centers"])
            if centers.shape != (self.n_bins,):
                raise ValueError(
                    f"checkpoint bin_centers have {centers.shape[0]} bins, "
                    f"model is configured for {self.n_bins} — pass --n_bins")
            self.bin_centers = jnp.asarray(centers)

    def _apply(self, params, batch_stats, x, train, rng=None):
        variables = {"params": params}
        mutable = []
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"] if train else []
        args = (x,) if self.model_type == "dual_reg" else (x, self.bin_centers)
        if train:
            out, mutated = self.model.apply(
                variables, *args, train=True, mutable=mutable,
                rngs={"dropout": rng} if rng is not None else None,
            )
            return out, (mutated.get("batch_stats") if mutable else None)
        return self.model.apply(variables, *args, train=False), None

    def _init_call(self, rng, batch):
        x = self.prepare(batch)
        args = (x,) if self.model_type == "dual_reg" else (x, self.bin_centers)
        return ({"params": rng, "dropout": rng}, args, {"train": False})

    def loss_fn(self, params, batch_stats, batch, rng, epoch):
        x = self.prepare(batch)
        out, new_stats = self._apply(params, batch_stats, x, train=True, rng=rng)
        gt = batch["depth"]           # sparse target in model units
        bins = batch["bins"]          # [B,H,W] int targets
        mask = gt > 0

        if self.model_type in ("unet", "lite"):
            logits, depth = out
            loss, parts = coarse_depth_loss(
                logits, depth, bins, gt, mask, mode=self.ce_mode,
                ce_weight=self.ce_weight,
                regression_weight=self.regression_weight,
                soft_ce_sigma=self.soft_ce_sigma,
            )
            aux = {"loss": loss, "ce": parts["ce"], "regression": parts["regression"]}
        elif self.model_type == "hybrid":
            logits, coarse, offset, final = out
            loss, parts = coarse_offset_loss(
                logits, coarse, offset, final, gt, bins,
                ce_weight=self.ce_weight,
                regression_weight=self.regression_weight,
                offset_reg_weight=self.offset_reg_weight,
                label_smoothing=0.1,  # train_coarse_depth.py:342
            )
            aux = {"loss": loss, "ce": parts["ce"], "regression": parts["regression"],
                   "offset_reg": parts["offset_reg"], "coarse_l1": parts["coarse_l1"]}
        else:  # dual_reg
            coarse, offset, final = out
            loss, parts = dual_regression_loss(
                coarse, offset, final, gt,
                coarse_weight=self.coarse_weight,
                final_weight=self.final_weight,
                offset_reg_weight=self.offset_reg_weight,
            )
            aux = {"loss": loss, "coarse": parts["coarse"], "final": parts["final"],
                   "offset_reg": parts["offset_reg"]}
        return loss, (new_stats, aux)

    @property
    def pred_is_normalized(self):
        return self.depth_norm  # centers normalized when depth_norm

    def predict_raw(self, params, batch_stats, batch):
        x = self.prepare(batch)
        out, _ = self._apply(params, batch_stats, x, train=False)
        if self.model_type in ("unet", "lite"):
            return out[1]
        return out[-1]
