"""Core depth losses: masked L1, SIlog, and the Combined criterion.

Pure jittable functions. The reference applies losses to *gathered* valid
pixels (boolean-mask indexing, e.g. train.py:646-669 and utils_loss.py:29-49
in Kang-ChangWoo/audio-depth-estimation); gathering is shape-dynamic, so here
every loss takes an optional ``mask`` and computes the mathematically
identical weighted mean over static shapes.

SIlog definition (utils_loss.py:9-49):
    d = log(clamp(pred, eps)) - log(clamp(target, eps))
    SIlog = sqrt(max(mean(d^2) - lam * mean(d)^2, 0))
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    w = mask.astype(x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def l1_loss(pred, target, mask=None):
    return _masked_mean(jnp.abs(pred - target), mask)


def l2_loss(pred, target, mask=None):
    d = pred - target
    return _masked_mean(d * d, mask)


def silog_loss(pred, target, mask=None, lambda_scale: float = 0.5, eps: float = 1e-6):
    pred = jnp.maximum(pred, eps)
    target = jnp.maximum(target, eps)
    d = jnp.log(pred) - jnp.log(target)
    m2 = _masked_mean(d * d, mask)
    m1 = _masked_mean(d, mask)
    var = m2 - lambda_scale * m1 * m1
    return jnp.sqrt(jnp.maximum(var, 0.0))


def combined_loss(
    pred,
    target,
    mask=None,
    l1_weight: float = 0.237,
    silog_weight: float = 0.637,
    silog_lambda: float = 0.869,
):
    """Weighted L1 + SIlog (the swept defaults from conf/mode/train.yaml)."""
    return l1_weight * l1_loss(pred, target, mask) + silog_weight * silog_loss(
        pred, target, mask, lambda_scale=silog_lambda
    )


def make_criterion(name: str, *, l1_weight=0.237, silog_weight=0.637, silog_lambda=0.869):
    """Return loss_fn(pred, target, mask) for a criterion name (L1|SIlog|Combined)."""
    key = name.lower()
    if key == "l1":
        return l1_loss
    if key == "l2" or key == "mse":
        return l2_loss
    if key == "silog":
        return lambda p, t, m=None: silog_loss(p, t, m, lambda_scale=silog_lambda)
    if key == "combined":
        return lambda p, t, m=None: combined_loss(
            p, t, m,
            l1_weight=l1_weight, silog_weight=silog_weight, silog_lambda=silog_lambda,
        )
    raise ValueError(f"unknown criterion: {name!r}")
