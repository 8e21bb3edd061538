"""5-term RGB→audio distillation loss (+ adaptive curriculum schedule).

Twin of utils_distillation_loss.py in the reference:
  total = λ_task · L1(audio_final, gt | mask)
        + λ_response · MSE(audio_final, rgb_final | mask)
        + λ_feature · mean_levels(1 − cos(audio_xk, rgb_xk))
             (features flattened over space, normalized along the spatial
              axis per channel — utils_distillation_loss.py:73-98)
        + λ_bin · (KL(softmax(rgb/T) ‖ softmax(audio/T)) of the
              SPATIAL-MEAN logits, batchmean, NO T² scaling
              — utils_distillation_loss.py:100-125
              + MSE(audio_centers, rgb_centers))
        + λ_sparse · mean|audio_residual| (masked)

Teacher tensors are already stop_gradient'ed by the model. The adaptive
schedule (utils_distillation_loss.py:241-337) is a pure function of a traced
progress scalar.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.layers import at_least_f32
from .basic import l1_loss, l2_loss


def feature_cosine_distance(audio_feats: Dict, rgb_feats: Dict) -> jnp.ndarray:
    total = 0.0
    count = 0
    for level in ("x1", "x2", "x3", "x4", "x5"):
        if level in audio_feats and level in rgb_feats:
            a = at_least_f32(audio_feats[level])
            r = at_least_f32(rgb_feats[level])
            b = a.shape[0]
            # NHWC → [B, C, HW]: normalize each channel's spatial vector
            a2 = a.reshape(b, -1, a.shape[-1]).transpose(0, 2, 1)
            r2 = r.reshape(b, -1, r.shape[-1]).transpose(0, 2, 1)
            an = a2 / jnp.maximum(jnp.linalg.norm(a2, axis=2, keepdims=True), 1e-12)
            rn = r2 / jnp.maximum(jnp.linalg.norm(r2, axis=2, keepdims=True), 1e-12)
            cos = jnp.mean(jnp.sum(an * rn, axis=2))
            total = total + (1.0 - cos)
            count += 1
    return total / max(count, 1)


def bin_distribution_kl(audio_logits, rgb_logits, temperature: float = 4.0):
    """KL over spatial-mean logits with temperature, batchmean reduction."""
    a = jnp.mean(at_least_f32(audio_logits), axis=(1, 2)) / temperature
    r = jnp.mean(at_least_f32(rgb_logits), axis=(1, 2)) / temperature
    log_p_audio = jax.nn.log_softmax(a, axis=1)
    p_rgb = jax.nn.softmax(r, axis=1)
    # F.kl_div(input=log q, target=p, batchmean) = mean_B Σ p (log p − log q)
    log_p_rgb = jax.nn.log_softmax(r, axis=1)
    return jnp.mean(jnp.sum(p_rgb * (log_p_rgb - log_p_audio), axis=1))


def distillation_loss(
    output: Dict,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    lambda_task: float | jnp.ndarray = 2.0,
    lambda_response: float | jnp.ndarray = 0.3,
    lambda_feature: float | jnp.ndarray = 0.2,
    lambda_bin: float | jnp.ndarray = 0.05,
    lambda_sparse: float | jnp.ndarray = 0.1,
    temperature: float = 4.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    audio = output["audio"]
    rgb = output.get("rgb")

    loss_task = l1_loss(audio["final_depth"], gt, mask)
    w = at_least_f32(mask)
    loss_sparse = jnp.sum(jnp.abs(audio["residual"]) * w) / jnp.maximum(jnp.sum(w), 1.0)

    if rgb is not None:
        loss_response = l2_loss(audio["final_depth"], rgb["final_depth"], mask)
        loss_feature = feature_cosine_distance(audio["features"], rgb["features"])
        loss_bin = bin_distribution_kl(audio["bin_logits"], rgb["bin_logits"], temperature)
        loss_centers = jnp.mean((audio["bin_centers"] - rgb["bin_centers"]) ** 2)
    else:
        loss_response = jnp.float32(0.0)
        loss_feature = jnp.float32(0.0)
        loss_bin = jnp.float32(0.0)
        loss_centers = jnp.float32(0.0)

    total = (
        lambda_task * loss_task
        + lambda_response * loss_response
        + lambda_feature * loss_feature
        + lambda_bin * (loss_bin + loss_centers)
        + lambda_sparse * loss_sparse
    )
    return total, {
        "task": loss_task,
        "response": loss_response,
        "feature": loss_feature,
        "bin": loss_bin,
        "bin_centers": loss_centers,
        "sparse": loss_sparse,
        "total": total,
    }


def adaptive_distillation_weights(progress: jnp.ndarray):
    """3-phase curriculum weights as a pure function of progress ∈ [0,1]."""
    progress = jnp.clip(progress, 0.0, 1.0)
    lam_task = 2.0 + progress
    lam_response = jnp.where(
        progress < 0.1, 0.1, 0.1 + 0.4 * (progress - 0.1) / 0.9
    )
    lam_feature = jnp.where(
        progress < 0.2,
        0.05,
        jnp.where(
            progress < 0.5,
            0.05 + 0.25 * (progress - 0.2) / 0.3,
            0.3 - 0.1 * (progress - 0.5) / 0.5,
        ),
    )
    lam_bin = 0.05 - 0.03 * progress
    return {
        "task": lam_task,
        "response": lam_response,
        "feature": lam_feature,
        "bin": lam_bin,
    }
