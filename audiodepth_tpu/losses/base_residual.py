"""Three-component Base+Residual loss with curriculum weight schedule.

Twin of utils_base_residual_loss.py in the reference:
  L = λ_recon · recon(final, gt)              (L1 | L2 | SIlog, masked)
    + λ_base  · L1(base, AvgPool_k16(gt))     (structural guidance; the
                low-pass target is computed on the UNMASKED gt, under
                stop_gradient — utils_base_residual_loss.py:91-116)
    + λ_sparse· mean|residual|                (masked sparsity)

The adaptive schedule (utils_base_residual_loss.py:164-238) linearly anneals
λ_recon 0.3→1.0 and λ_base 2.0→0.3 over warmup_epochs, then holds. Here it
is a pure function of a traced epoch scalar, so curricula never retrace.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .basic import l1_loss, l2_loss, silog_loss


def lowpass_avgpool(gt: jnp.ndarray, kernel: int = 16) -> jnp.ndarray:
    """AvgPool(k, stride=1, pad=k//2, count_include_pad) + resize back.

    gt is NHWC. torch's avg_pool2d with these settings yields H+1 × W+1,
    then bilinear (align_corners=False, no antialias) resize restores H × W.
    """
    pad = kernel // 2
    x = jnp.pad(gt, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    pooled = summed / float(kernel * kernel)
    if pooled.shape[1:3] != gt.shape[1:3]:
        pooled = jax.image.resize(
            pooled, gt.shape[:1] + gt.shape[1:3] + gt.shape[3:],
            method="linear", antialias=False,
        )
    return jax.lax.stop_gradient(pooled)


def adaptive_weights(epoch: jnp.ndarray, warmup_epochs: int = 50,
                     recon_init: float = 0.3, recon_final: float = 1.0,
                     base_init: float = 2.0, base_final: float = 0.3):
    """Linear anneal of (λ_recon, λ_base) over warmup; traced-scalar safe."""
    alpha = jnp.clip(epoch / max(warmup_epochs, 1), 0.0, 1.0)
    lam_recon = recon_init + alpha * (recon_final - recon_init)
    lam_base = base_init + alpha * (base_final - base_init)
    return lam_recon, lam_base


def separate_frequencies(depth: jnp.ndarray, freq_cutoff: float = 0.1):
    """FFT low/high-pass split of NHWC depth maps.

    Twin of FrequencyAwareBaseResidualLoss.separate_frequencies
    (utils_base_residual_loss.py:266-301): centered 2-D FFT, a square
    low-pass mask of half-width cutoff·dim, inverse transforms' real parts.
    """
    h, w = depth.shape[1], depth.shape[2]
    x = jnp.fft.fftshift(jnp.fft.fft2(depth.astype(jnp.float32), axes=(1, 2)),
                         axes=(1, 2))
    ch, cw = h // 2, w // 2
    cut_h, cut_w = int(h * freq_cutoff), int(w * freq_cutoff)
    ys = jnp.arange(h)[None, :, None, None]
    xs = jnp.arange(w)[None, None, :, None]
    # slice semantics [c-cut, c+cut) as in the reference's mask assignment
    mask = ((ys >= ch - cut_h) & (ys < ch + cut_h)
            & (xs >= cw - cut_w) & (xs < cw + cut_w))
    low = jnp.fft.ifft2(jnp.fft.ifftshift(x * mask, axes=(1, 2)), axes=(1, 2)).real
    high = jnp.fft.ifft2(jnp.fft.ifftshift(x * (~mask), axes=(1, 2)), axes=(1, 2)).real
    return low, high


def frequency_aware_base_residual_loss(
    base, residual, final, gt,
    lambda_recon: float = 1.0,
    lambda_base_low: float = 0.5,
    lambda_res_high: float = 0.3,
    lambda_sparse: float = 0.1,
    freq_cutoff: float = 0.1,
):
    """Experimental frequency-domain variant
    (utils_base_residual_loss.py:241-345, unmasked path): base matches the
    GT's low frequencies, residual its high frequencies."""
    loss_recon = l1_loss(final, gt)
    gt_low, gt_high = separate_frequencies(gt, freq_cutoff)
    loss_base_low = l1_loss(base, jax.lax.stop_gradient(gt_low))
    loss_res_high = l1_loss(residual, jax.lax.stop_gradient(gt_high))
    loss_sparse = jnp.mean(jnp.abs(residual))
    total = (lambda_recon * loss_recon + lambda_base_low * loss_base_low
             + lambda_res_high * loss_res_high + lambda_sparse * loss_sparse)
    return total, {
        "recon": loss_recon, "base_low": loss_base_low,
        "res_high": loss_res_high, "sparse": loss_sparse, "total": total,
    }


def base_residual_loss(
    base: jnp.ndarray,
    residual: jnp.ndarray,
    final: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    lambda_recon=1.0,
    lambda_base=1.2,
    lambda_sparse=0.05,
    lowpass_kernel: int = 16,
    recon: str = "l1",              # l1 | l2 | silog
    silog_lambda: float = 0.5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    gt_struct = lowpass_avgpool(gt, lowpass_kernel)
    if recon == "silog":
        loss_recon = silog_loss(final, gt, mask, lambda_scale=silog_lambda)
    elif recon == "l2":
        loss_recon = l2_loss(final, gt, mask)
    else:
        loss_recon = l1_loss(final, gt, mask)
    loss_base = l1_loss(base, gt_struct, mask)
    w = mask.astype(jnp.float32)
    loss_sparse = jnp.sum(jnp.abs(residual) * w) / jnp.maximum(jnp.sum(w), 1.0)

    total = lambda_recon * loss_recon + lambda_base * loss_base + lambda_sparse * loss_sparse
    return total, {
        "recon": loss_recon,
        "base": loss_base,
        "sparse": loss_sparse,
        "total": total,
    }
