"""Depth evaluation metrics.

Two implementations of the same metric definition:

  * ``compute_errors_np`` — the host-side numpy reference twin. Its semantics
    (valid-pixel masking, adaptive epsilon, multi-stage fallbacks for
    degenerate predictions) replicate the reference's evaluation function
    (``utils_criterion.py:6-90`` in Kang-ChangWoo/audio-depth-estimation),
    which *defines* metric parity for this framework.
  * ``compute_errors_batch`` — a jit-friendly, batched jnp version used on
    the validation hot path. It implements the common (non-degenerate) branch
    with weighted means so shapes stay static; it matches the numpy twin
    whenever the prediction is strictly positive on valid ground-truth pixels
    (which training drivers guarantee by clipping predictions to
    ``[eps, max_depth]`` first).

Metric tuple order everywhere: (abs_rel, rmse, a1, a2, a3, log10, mae).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

METRIC_NAMES = ("abs_rel", "rmse", "delta1", "delta2", "delta3", "log10", "mae")

# Lower clip bound for predictions entering the jit eval path
# (Task.eval_metrics). One f32 ulp ABOVE the 1e-3 meter epsilon: both twins
# test `pred > eps` strictly, but the jnp twin compares in f32 while the np
# twin promotes to f64 (where f32(1e-3) > 1e-3 holds) — clipping to exactly
# 1e-3 would silently drop those pixels from the jnp twin only. One ulp up
# puts every clipped pixel on the common branch of BOTH twins, which is the
# regime where compute_errors_batch == compute_errors_np is exact
# (machine-checked in tests/test_metrics.py's degenerate-input sweep).
EVAL_PRED_MIN = float(np.nextafter(np.float32(1e-3), np.float32(np.inf)))


def _nan_to_zero(x: float) -> float:
    if x != x or x == np.inf:
        return 0.0
    return float(x)


def compute_errors_np(gt, pred, min_depth_threshold: float = 0.0):
    """Numpy reference metrics between gt and predicted depth.

    Semantics follow the reference evaluation exactly
    (utils_criterion.py:6-90): pixels with gt == 0 are invalid; an adaptive
    epsilon (1e-3 in metric scale, 1e-6 in normalized scale) filters
    near-zero values; degenerate predictions fall through a chain of
    fallbacks ending in the all-negative failure sentinel
    ``(1.0, gt.max(), 0, 0, 0, 1.0, gt.max())``.
    """
    gt = np.asarray(gt, dtype=np.float64).reshape(-1)
    pred = np.asarray(pred, dtype=np.float64).reshape(-1)

    mask = gt != 0.0
    if mask.sum() == 0:
        return 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    pred = pred[mask]
    gt = gt[mask]

    eps = 1e-3 if gt.max() > 1.0 else 1e-6
    valid = (pred > eps) & (gt > eps)
    if valid.sum() == 0:
        valid = gt > eps
        if valid.sum() == 0:
            return 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
        valid = valid & (pred > 0)
        if valid.sum() == 0:
            # every prediction non-positive: report the failure sentinel so
            # bad runs are visible rather than silently averaged away
            return 1.0, float(gt.max()), 0.0, 0.0, 0.0, 1.0, float(gt.max())
    pred = pred[valid]
    gt = gt[valid]

    eps = 1e-3 if gt.max() > 1.0 else 1e-6
    thresh = np.maximum(gt / np.maximum(pred, eps), np.maximum(pred, eps) / gt)
    a1 = _nan_to_zero((thresh < 1.25).mean())
    a2 = _nan_to_zero((thresh < 1.25 ** 2).mean())
    a3 = _nan_to_zero((thresh < 1.25 ** 3).mean())
    rmse = _nan_to_zero(np.sqrt(((gt - pred) ** 2).mean()))
    abs_rel = _nan_to_zero(np.mean(np.abs(gt - pred) / gt))
    log10 = _nan_to_zero(
        np.abs(np.log10(np.maximum(gt, eps)) - np.log10(np.maximum(pred, eps))).mean()
    )
    mae = _nan_to_zero(np.abs(gt - pred).mean())
    return abs_rel, rmse, a1, a2, a3, log10, mae


def compute_errors_batch(gt: jnp.ndarray, pred: jnp.ndarray, metric_scale: bool = True):
    """Batched, jittable depth metrics (common branch of the numpy twin).

    Args:
      gt:   [B, ...] ground-truth depth. Pixels == 0 are invalid.
      pred: [B, ...] predicted depth, expected pre-clipped to (eps, max_depth].
      metric_scale: True when depth is in meters (adaptive eps = 1e-3),
        False for normalized depth (eps = 1e-6). Static so jit never branches
        on data.

    Returns a dict of per-sample arrays [B] keyed by METRIC_NAMES. Samples
    with no valid pixels report zeros (matching the numpy twin's first
    fallback).
    """
    b = gt.shape[0]
    gt = gt.reshape(b, -1).astype(jnp.float32)
    pred = pred.reshape(b, -1).astype(jnp.float32)
    eps = 1e-3 if metric_scale else 1e-6

    valid = (gt > eps) & (pred > eps)
    w = valid.astype(jnp.float32)
    n = jnp.sum(w, axis=1)
    safe_n = jnp.maximum(n, 1.0)
    has = n > 0

    def wmean(x):
        return jnp.sum(x * w, axis=1) / safe_n

    gt_s = jnp.where(valid, gt, 1.0)
    pred_s = jnp.where(valid, jnp.maximum(pred, eps), 1.0)

    ratio = jnp.maximum(gt_s / pred_s, pred_s / gt_s)
    a1 = wmean((ratio < 1.25).astype(jnp.float32))
    a2 = wmean((ratio < 1.25 ** 2).astype(jnp.float32))
    a3 = wmean((ratio < 1.25 ** 3).astype(jnp.float32))
    diff = gt_s - pred_s
    rmse = jnp.sqrt(wmean(diff * diff))
    abs_rel = wmean(jnp.abs(diff) / gt_s)
    log10 = wmean(jnp.abs(jnp.log10(gt_s) - jnp.log10(pred_s)))
    mae = wmean(jnp.abs(diff))

    out = dict(zip(METRIC_NAMES, (abs_rel, rmse, a1, a2, a3, log10, mae)))
    return {k: jnp.where(has, v, 0.0) for k, v in out.items()}
