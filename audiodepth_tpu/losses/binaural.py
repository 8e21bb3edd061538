"""Edge-aware loss family for the binaural attention model.

Twin of utils_binaural_attention_loss.py in the reference. NOTE: the
reference's binaural trainer deprecated this family in favor of the
standard L1/SIlog/Combined path (train_binaural_attention.py:32-34,292-311);
it is kept for capability parity and remains selectable.

Components (all with the gt>0 validity mask):
  recon  = Σ|pred·m − gt·m| / (Σm + 1e-6)
  edge   = L1 between Sobel gradient magnitudes, weighted by the DILATED
           mask (max_pool k3 s1 — the reference calls it "eroded" but
           max-pooling a {0,1} mask dilates it)
  smooth = Σ (|∇x pred| + |∇y pred|) · exp(−|∇gt|) · m / (Σm + 1e-6)

Also: the plain RGB-teacher DepthLoss (train_rgb_depth.py:43-87): unmasked
L1 + mean first-difference smoothness, λ_smooth = 0.1.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)


def _sobel(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel gradients of NHWC single-channel maps (zero 'same' padding)."""
    k = jnp.stack(
        [jnp.asarray(_SOBEL_X), jnp.asarray(_SOBEL_Y)], axis=-1
    )[..., None, :]  # HWIO: [3,3,1,2]
    g = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return g[..., 0:1], g[..., 1:2]


def _grad_mag(x):
    gx, gy = _sobel(x)
    return jnp.sqrt(gx * gx + gy * gy + 1e-6)


def binaural_attention_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    lambda_recon: float | jnp.ndarray = 1.0,
    lambda_edge: float | jnp.ndarray = 0.2,
    lambda_smooth: float | jnp.ndarray = 0.1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    m = (gt > 0).astype(jnp.float32)
    msum = jnp.sum(m) + 1e-6

    loss_recon = jnp.sum(jnp.abs(pred * m - gt * m)) / msum

    pred_grad = _grad_mag(pred)
    gt_grad = _grad_mag(gt)
    m_dil = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    loss_edge = jnp.sum(jnp.abs(pred_grad * m_dil - gt_grad * m_dil)) / (
        jnp.sum(m_dil) + 1e-6
    )

    pgx, pgy = _sobel(pred)
    edge_weight = jnp.exp(-gt_grad)
    smooth = jnp.abs(pgx) + jnp.abs(pgy)
    loss_smooth = jnp.sum(smooth * edge_weight * m) / msum

    total = lambda_recon * loss_recon + lambda_edge * loss_edge + lambda_smooth * loss_smooth
    return total, {
        "recon": loss_recon, "edge": loss_edge, "smooth": loss_smooth, "total": total,
    }


def adaptive_binaural_weights(epoch: jnp.ndarray, warmup_epochs: int = 20):
    """3-phase curriculum (utils_binaural_attention_loss.py:199-218)."""
    w = float(warmup_epochs)
    lam_edge = jnp.where(
        epoch < w, 0.0,
        jnp.where(epoch < 3 * w, 0.2 * (epoch - w) / (2 * w), 0.2),
    )
    lam_smooth = jnp.where(
        epoch < 3 * w, 0.0, 0.1 * jnp.minimum((epoch - 3 * w) / w, 1.0)
    )
    return 1.0, lam_edge, lam_smooth


def rgb_depth_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                   lambda_l1: float = 1.0, lambda_smooth: float = 0.1):
    """RGB teacher loss: UNMASKED L1 + first-difference smoothness."""
    l1 = jnp.mean(jnp.abs(pred - gt))
    dx = jnp.mean(jnp.abs(pred[:, :, :-1, :] - pred[:, :, 1:, :]))
    dy = jnp.mean(jnp.abs(pred[:, :-1, :, :] - pred[:, 1:, :, :]))
    smooth = dx + dy
    total = lambda_l1 * l1 + lambda_smooth * smooth
    return total, {"l1": l1, "smooth": smooth, "total": total}
