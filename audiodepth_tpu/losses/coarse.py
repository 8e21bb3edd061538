"""Classification losses for the coarse-depth family.

Twins of the losses co-located in models/coarse_depth_model.py in the
reference:
  * ordinal_regression_loss (:294-321) — cumulative BCE: for each pixel,
    bins <= target are positive; mean BCE-with-logits over everything.
  * soft_cross_entropy_loss (:324-355) — Gaussian-smoothed (σ) soft labels
    around the target bin, CE against log_softmax.
  * focal_loss (:358-384) — (1-p_t)^γ · CE, mean over pixels.
  * coarse_depth_loss (:391-468) — CE (soft/focal/hard) + masked L1 on the
    soft-binned depth.
  * coarse_offset_loss (:773-850) — hard CE + UNMASKED L1(final, gt)
    + offset-L1 regularization (+ monitoring coarse L1).
  * dual_regression_loss (:997-1056) — masked L1 on coarse and final +
    offset regularization.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .basic import l1_loss, l2_loss


def _log_softmax_bins(logits):
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def ordinal_regression_loss(logits: jnp.ndarray, target_bins: jnp.ndarray) -> jnp.ndarray:
    """logits [B,H,W,N], target_bins [B,H,W] int."""
    n = logits.shape[-1]
    bin_idx = jnp.arange(n)[None, None, None, :]
    labels = (bin_idx <= target_bins[..., None]).astype(jnp.float32)
    x = logits.astype(jnp.float32)
    # BCE with logits: max(x,0) - x*z + log(1+exp(-|x|))
    bce = jnp.maximum(x, 0) - x * labels + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(bce)


def soft_cross_entropy_loss(
    logits: jnp.ndarray, target_bins: jnp.ndarray, sigma: float = 2.0
) -> jnp.ndarray:
    n = logits.shape[-1]
    bin_idx = jnp.arange(n, dtype=jnp.float32)[None, None, None, :]
    t = target_bins[..., None].astype(jnp.float32)
    soft = jnp.exp(-0.5 * ((bin_idx - t) / sigma) ** 2)
    soft = soft / (jnp.sum(soft, axis=-1, keepdims=True) + 1e-8)
    logp = _log_softmax_bins(logits)
    return jnp.mean(-jnp.sum(soft * logp, axis=-1))


def hard_cross_entropy_loss(
    logits: jnp.ndarray, target_bins: jnp.ndarray, label_smoothing: float = 0.0
) -> jnp.ndarray:
    n = logits.shape[-1]
    logp = _log_softmax_bins(logits)
    onehot = jax.nn.one_hot(target_bins, n)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / n
    return jnp.mean(-jnp.sum(onehot * logp, axis=-1))


def focal_loss(logits: jnp.ndarray, target_bins: jnp.ndarray, gamma: float = 2.0) -> jnp.ndarray:
    logp = _log_softmax_bins(logits)
    ce = -jnp.take_along_axis(logp, target_bins[..., None], axis=-1)[..., 0]
    pt = jnp.exp(-ce)
    return jnp.mean(((1.0 - pt) ** gamma) * ce)


def coarse_depth_loss(
    logits, pred_depth, target_bins, target_depth, mask=None,
    ce_weight: float = 1.0, regression_weight: float = 0.5,
    mode: str = "soft_ce", focal_gamma: float = 2.0, soft_ce_sigma: float = 2.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    if mode == "focal":
        ce = focal_loss(logits, target_bins, focal_gamma)
    elif mode == "soft_ce":
        ce = soft_cross_entropy_loss(logits, target_bins, soft_ce_sigma)
    else:
        ce = hard_cross_entropy_loss(logits, target_bins)
    reg = l1_loss(pred_depth, target_depth, mask)
    total = ce_weight * ce + regression_weight * reg
    return total, {"ce": ce, "regression": reg, "total": total}


def coarse_offset_loss(
    logits, coarse_depth, offset, final_depth, target_depth, target_bins,
    ce_weight: float = 1.0, regression_weight: float = 1.0,
    offset_reg_weight: float = 0.1, regression: str = "l1",
    label_smoothing: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    ce = hard_cross_entropy_loss(logits, target_bins, label_smoothing)
    reg_fn = l1_loss if regression == "l1" else l2_loss
    reg = reg_fn(final_depth, target_depth)          # unmasked (reference)
    offset_reg = jnp.mean(jnp.abs(offset))
    total = ce_weight * ce + regression_weight * reg + offset_reg_weight * offset_reg
    return total, {
        "ce": ce, "regression": reg, "offset_reg": offset_reg,
        "coarse_l1": l1_loss(coarse_depth, target_depth), "total": total,
    }


def dual_regression_loss(
    coarse_depth, offset, final_depth, target_depth,
    coarse_weight: float = 1.0, final_weight: float = 1.0,
    offset_reg_weight: float = 0.01,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    mask = target_depth > 0
    coarse = l1_loss(coarse_depth, target_depth, mask)
    final = l1_loss(final_depth, target_depth, mask)
    offset_reg = jnp.mean(jnp.abs(offset))
    total = coarse_weight * coarse + final_weight * final + offset_reg_weight * offset_reg
    return total, {
        "coarse": coarse, "final": final, "offset_reg": offset_reg, "total": total,
    }
