"""Tasks for the non-baseline model families.

Each task encodes its reference driver's semantics (masking, unit
conversions, curriculum phases) as pure traced computation — the epoch
enters as a scalar, detach phases are stop_gradient switches, and adaptive
loss weights are functions of epoch/progress (SURVEY §2.5, §3.3-3.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import Config
from ..losses.base_residual import (
    adaptive_weights,
    base_residual_loss,
    frequency_aware_base_residual_loss,
)
from ..losses.binaural import (
    adaptive_binaural_weights,
    binaural_attention_loss,
    rgb_depth_loss,
)
from ..losses.distillation import adaptive_distillation_weights, distillation_loss
from ..models.adabins import AdaBinsDistillationModel
from ..models.base_residual import BaseResidualNet
from ..models.binaural_attention import BinauralAttentionNet
from ..models.rgb_depth import RGBDepthNet
from ..models.unet_cvae import build_unet_cvae
from .tasks import Task


def _compute_dtype(cfg: Config):
    from ..configs import resolve_compute_dtype

    return resolve_compute_dtype(cfg)


class BaseResidualTask(Task):
    """base_residual: two-headed forward + 3-term loss + detach curriculum.

    Driver semantics (train_base_residual.py:344-516): mask is gt > 0; after
    warmup_epochs with the adaptive loss, final = stop_grad(base) + residual
    in train AND eval; final clipped to [0, max_depth]; SIlog recon default.
    """

    name = "base_residual"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        extra = cfg.model.extra
        self.use_adaptive = bool(extra.get("use_adaptive_loss", True))
        self.warmup_epochs = int(extra.get("warmup_epochs", 50))
        self.recon = str(extra.get("recon", "silog"))
        # driver-tunable loss weights (train_base_residual.py:136-142
        # argparse defaults); the adaptive schedule's init points derive
        # from them exactly as the driver does at :261-269
        # (recon_init = λ_recon·0.5, base_init = λ_base·2.0).
        self.lambda_recon = float(extra.get("lambda_recon", 1.0))
        self.lambda_base = float(extra.get("lambda_base", 1.2))
        self.lambda_sparse = float(extra.get("lambda_sparse", 0.05))
        self.lowpass_kernel = int(extra.get("lowpass_kernel", 16))
        self.silog_lambda = float(extra.get("silog_lambda", 0.5))
        self.model = BaseResidualNet(
            input_channels=cfg.model.input_nc,
            base_channels=cfg.model.base_channels,
            max_depth=self.max_depth,
            dtype=_compute_dtype(cfg),
        )

    def _final(self, base, residual, epoch):
        if self.use_adaptive:
            # engine passes a 0-based epoch scalar; the reference flips on
            # its 1-based loop variable (`epoch > args.warmup_epochs`,
            # train_base_residual.py:370-374), i.e. 0-based epoch >= warmup.
            # Pinned across the boundary by test_trajectory_parity.py.
            detach = epoch >= self.warmup_epochs
            base_used = jnp.where(detach, jax.lax.stop_gradient(base), base)
        else:
            base_used = base
        return jnp.clip(base_used + residual, 0.0, self.max_depth)

    def loss_fn(self, params, batch_stats, batch, rng, epoch):
        x = self.prepare(batch)
        (base, residual), new_stats = self.apply_train(params, batch_stats, x, rng)
        gt = self.to_meters(batch["depth"])
        mask = gt > 0
        final = self._final(base, residual, epoch)
        if self.recon == "frequency_aware":
            loss, parts = frequency_aware_base_residual_loss(
                base, residual, final, gt
            )
            aux = {"loss": loss, "recon": parts["recon"],
                   "base_low": parts["base_low"], "res_high": parts["res_high"],
                   "sparse": parts["sparse"]}
            return loss, (new_stats, aux)
        if self.use_adaptive:
            lam_recon, lam_base = adaptive_weights(
                epoch, self.warmup_epochs,
                recon_init=self.lambda_recon * 0.5,
                base_init=self.lambda_base * 2.0,
            )
        else:
            lam_recon, lam_base = self.lambda_recon, self.lambda_base
        loss, parts = base_residual_loss(
            base, residual, final, gt, mask,
            lambda_recon=lam_recon, lambda_base=lam_base,
            lambda_sparse=self.lambda_sparse,
            lowpass_kernel=self.lowpass_kernel,
            recon=self.recon, silog_lambda=self.silog_lambda,
        )
        aux = {"loss": loss, "recon": parts["recon"], "base": parts["base"],
               "sparse": parts["sparse"]}
        return loss, (new_stats, aux)

    def predict_raw(self, params, batch_stats, batch):
        x = self.prepare(batch)
        base, residual = self.apply_eval(params, batch_stats, x)
        return jnp.clip(base + residual, 0.0, self.max_depth)

    def eval_criterion_loss(self, params, batch_stats, batch, epoch,
                            valid=None):
        """The driver's per-batch val loss: the training criterion on the
        eval-mode forward with the CURRENT epoch's adaptive weights
        (train_base_residual.py:436-452; the detach flip is value-neutral
        under no_grad). Aggregated by Engine.evaluate as the equal-weight
        mean over batches (np.mean(val_losses), :482). Pad rows carry
        gt == 0 and drop out of the gt>0 mask."""
        x = self.prepare(batch)
        base, residual = self.apply_eval(params, batch_stats, x)
        final = jnp.clip(base + residual, 0.0, self.max_depth)
        gt = self.to_meters(batch["depth"])
        mask = gt > 0
        if valid is not None:
            rows = valid.reshape((-1,) + (1,) * (gt.ndim - 1))
            mask = mask & (rows > 0)
        if self.recon == "frequency_aware":
            loss, _ = frequency_aware_base_residual_loss(
                base, residual, final, gt)
            return loss
        if self.use_adaptive:
            lam_recon, lam_base = adaptive_weights(
                epoch, self.warmup_epochs,
                recon_init=self.lambda_recon * 0.5,
                base_init=self.lambda_base * 2.0,
            )
        else:
            lam_recon, lam_base = self.lambda_recon, self.lambda_base
        loss, _ = base_residual_loss(
            base, residual, final, gt, mask,
            lambda_recon=lam_recon, lambda_base=lam_base,
            lambda_sparse=self.lambda_sparse,
            lowpass_kernel=self.lowpass_kernel,
            recon=self.recon, silog_lambda=self.silog_lambda,
        )
        return loss

    def predict_parts(self, params, batch_stats, batch):
        """(base, residual, final) for decomposition visualization."""
        x = self.prepare(batch)
        base, residual = self.apply_eval(params, batch_stats, x)
        return base, residual, jnp.clip(base + residual, 0.0, self.max_depth)


class BinauralAttentionTask(Task):
    """binaural_attention: standard criterion path; edge-aware optional.

    The reference driver switched to plain L1/SIlog/Combined
    (train_binaural_attention.py:292-311); loss_type in
    {standard, edge_aware, adaptive} mirrors create_binaural_loss.
    """

    name = "binaural_attention"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        extra = cfg.model.extra
        self.loss_type = str(extra.get("loss_type", "standard"))
        # edge-aware loss weights (utils_binaural_attention_loss.py:15
        # class defaults; the driver's flags are commented out at
        # train_binaural_attention.py:110-114, so these ARE its defaults)
        self.lambda_recon = float(extra.get("lambda_recon", 1.0))
        self.lambda_edge = float(extra.get("lambda_edge", 0.2))
        self.lambda_smooth = float(extra.get("lambda_smooth", 0.1))
        self.model = BinauralAttentionNet(
            base_channels=cfg.model.base_channels,
            max_depth=self.max_depth,
            attention_levels=tuple(cfg.model.attention_levels),
            output_size=cfg.dataset.images_size,
            remat=bool(extra.get("remat", True)),
            dtype=_compute_dtype(cfg),
        )

    def loss_fn(self, params, batch_stats, batch, rng, epoch):
        x = self.prepare(batch)
        pred, new_stats = self.apply_train(params, batch_stats, x, rng)
        gt = self.to_meters(batch["depth"])
        if self.loss_type == "standard":
            mask = gt != 0
            loss = self.criterion(pred, gt, mask)
            aux = {"loss": loss}
        else:
            if self.loss_type == "adaptive":
                lr_, le_, ls_ = adaptive_binaural_weights(epoch)
            else:
                lr_, le_, ls_ = self.lambda_recon, self.lambda_edge, self.lambda_smooth
            loss, parts = binaural_attention_loss(pred, gt, lr_, le_, ls_)
            aux = {"loss": loss, "recon": parts["recon"], "edge": parts["edge"],
                   "smooth": parts["smooth"]}
        return loss, (new_stats, aux)


class RGBDepthTask(Task):
    """rgb_depth teacher: unmasked L1 + smoothness (train_rgb_depth.py:43-87)."""

    name = "rgb_depth"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        extra = cfg.model.extra
        # driver-tunable weights (train_rgb_depth.py:126-128 defaults)
        self.lambda_l1 = float(extra.get("lambda_l1", 1.0))
        self.lambda_smooth = float(extra.get("lambda_smooth", 0.1))
        self.model = RGBDepthNet(
            base_channels=cfg.model.base_channels,
            max_depth=self.max_depth,
            output_size=cfg.dataset.images_size,
            dtype=_compute_dtype(cfg),
        )

    def prepare(self, batch):
        return batch["image"]

    def loss_fn(self, params, batch_stats, batch, rng, epoch):
        x = self.prepare(batch)
        pred, new_stats = self.apply_train(params, batch_stats, x, rng)
        gt = self.to_meters(batch["depth"])
        loss, parts = rgb_depth_loss(pred, gt, lambda_l1=self.lambda_l1,
                                     lambda_smooth=self.lambda_smooth)
        aux = {"loss": loss, "l1": parts["l1"], "smooth": parts["smooth"]}
        return loss, (new_stats, aux)


class UNetCVAETask(Task):
    """unet_cvae: depth loss + kl_weight·KL (train_cvae.py:444-473)."""

    name = "unet_cvae"
    pred_is_normalized = True

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.kl_weight = float(cfg.model.kl_weight)
        self.model = build_unet_cvae(cfg)

    def _init_call(self, rng, batch):
        return ({"params": rng, "dropout": rng, "latent": rng},
                (self.prepare(batch),), {"train": False})

    def apply_train(self, params, batch_stats, x, rng):
        variables = {"params": params}
        mutable = []
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        r1, r2 = jax.random.split(rng)
        out, mutated = self.model.apply(
            variables, x, train=True, mutable=mutable,
            rngs={"dropout": r1, "latent": r2},
        )
        return out, mutated.get("batch_stats") if mutable else None

    def apply_eval(self, params, batch_stats, x):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return self.model.apply(
            variables, x, train=False,
            rngs={"latent": jax.random.PRNGKey(0)},
        )

    def loss_fn(self, params, batch_stats, batch, rng, epoch):
        x = self.prepare(batch)
        (pred, kl), new_stats = self.apply_train(params, batch_stats, x, rng)
        gt = batch["depth"]
        mask = gt > 0
        depth_loss = self.criterion(self.pred_to_meters(pred), self.to_meters(gt), mask)
        loss = depth_loss + self.kl_weight * kl
        aux = {"loss": loss, "depth_loss": depth_loss, "kl": kl}
        return loss, (new_stats, aux)

    def predict_raw(self, params, batch_stats, batch):
        pred, _ = self.apply_eval(params, batch_stats, self.prepare(batch))
        return pred


class AdaBinsDistillationTask(Task):
    """adabins_distillation: paired audio+RGB batches, 5-term loss.

    Train mode runs the frozen RGB teacher (stop_gradient); validation runs
    the student alone (train_adabins_distillation.py:481-522 'inference').
    """

    name = "adabins_distillation"
    frozen_param_paths = ("rgb",)  # teacher: no grads, no decay, no momentum

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        extra = cfg.model.extra
        self.adaptive = bool(extra.get("use_adaptive_loss", False))
        self.total_epochs = int(cfg.mode.epochs)
        self.temperature = float(extra.get("temperature", 4.0))
        # default loss weights follow the DRIVER's argparse defaults
        # (train_adabins_distillation.py:179-187: 1.0/0.5/0.3/0.2/0.1),
        # which its default run passes into DistillationLoss at :358-365 —
        # NOT the DistillationLoss class defaults (2.0/0.3/0.2/0.05/0.1,
        # which losses/distillation.py keeps for class-level parity).
        self.lambda_task = float(extra.get("lambda_task", 1.0))
        self.lambda_response = float(extra.get("lambda_response", 0.5))
        self.lambda_feature = float(extra.get("lambda_feature", 0.3))
        self.lambda_bin = float(extra.get("lambda_bin", 0.2))
        self.lambda_sparse = float(extra.get("lambda_sparse", 0.1))
        self.model = AdaBinsDistillationModel(
            n_bins=cfg.model.n_bins,
            base_channels=cfg.model.base_channels,
            output_size=cfg.dataset.images_size,
            max_depth=self.max_depth,
            dtype=_compute_dtype(cfg),
            # default OFF: twin nets fit 16 GB without remat at every
            # practical batch (bs<=64 measured), and remat costs 28-33%
            # (RESULTS.md adabins remat ablation)
            remat=bool(extra.get("remat", False)),
        )

    def _init_call(self, rng, batch):
        audio = super().prepare(batch)
        rgb = batch.get("image")
        return ({"params": rng, "dropout": rng}, (audio, rgb),
                {"train": False,
                 "mode": "train" if rgb is not None else "inference"})

    def loss_fn(self, params, batch_stats, batch, rng, epoch):
        audio = super().prepare(batch)
        rgb = batch.get("image")
        variables = {"params": params}
        mutable = []
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        output, mutated = self.model.apply(
            variables, audio, rgb, train=True,
            mode="train" if rgb is not None else "inference",
            mutable=mutable, rngs={"dropout": rng},
        )
        new_stats = mutated.get("batch_stats") if mutable else None
        gt = self.to_meters(batch["depth"])
        mask = gt > 0
        if self.adaptive:
            w = adaptive_distillation_weights(epoch / max(self.total_epochs, 1))
            loss, parts = distillation_loss(
                output, gt, mask,
                lambda_task=w["task"], lambda_response=w["response"],
                lambda_feature=w["feature"], lambda_bin=w["bin"],
                lambda_sparse=self.lambda_sparse, temperature=self.temperature,
            )
        else:
            loss, parts = distillation_loss(
                output, gt, mask,
                lambda_task=self.lambda_task,
                lambda_response=self.lambda_response,
                lambda_feature=self.lambda_feature,
                lambda_bin=self.lambda_bin,
                lambda_sparse=self.lambda_sparse,
                temperature=self.temperature,
            )
        aux = {"loss": loss, "task": parts["task"], "response": parts["response"],
               "feature": parts["feature"], "bin": parts["bin"], "sparse": parts["sparse"]}
        return loss, (new_stats, aux)

    def predict_raw(self, params, batch_stats, batch):
        audio = super().prepare(batch)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        output = self.model.apply(variables, audio, None, train=False, mode="inference")
        return output["audio"]["final_depth"]


from .tasks_coarse import CoarseDepthTask  # noqa: E402

REGISTRY = {
    "base_residual": BaseResidualTask,
    "binaural_attention": BinauralAttentionTask,
    "rgb_depth": RGBDepthTask,
    "unet_cvae": UNetCVAETask,
    "adabins_distillation": AdaBinsDistillationTask,
    "coarse_depth": CoarseDepthTask,
}
