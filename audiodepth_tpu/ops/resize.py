"""Resize ops with the exact sample semantics of the reference pipeline.

  * ``resize_bilinear`` — spectrogram/image resize. Matches
    torchvision.transforms.Resize((s, s)) on tensors (bilinear, half-pixel
    centers, antialiased when downscaling) within fp32 tolerance; built on
    jax.image.resize which implements the same triangle resampling.
  * ``resize_nearest_cv2`` — depth-map resize. Replicates cv2.resize
    INTER_NEAREST index arithmetic (src = floor(dst * scale), no half-pixel
    offset), which the reference uses for ground-truth depth
    (BatvisionV2_Dataset.py:76-77; the repo's interpolation-comparison
    notebook picked INTER_NEAREST deliberately).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int, antialias: bool = True) -> jnp.ndarray:
    """Bilinear resize of the last two axes of [..., H, W]."""
    shape = x.shape[:-2] + (out_h, out_w)
    method = "linear"
    return jax.image.resize(x, shape, method=method, antialias=antialias)


def resize_nearest_cv2(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.INTER_NEAREST-compatible resize of the last two axes of [..., H, W]."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    ys = np.minimum(np.floor(np.arange(out_h) * (in_h / out_h)).astype(np.int32), in_h - 1)
    xs = np.minimum(np.floor(np.arange(out_w) * (in_w / out_w)).astype(np.int32), in_w - 1)
    return x[..., jnp.asarray(ys), :][..., jnp.asarray(xs)]


def resize_nearest_cv2_np(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host numpy twin of resize_nearest_cv2 (for data-pipeline workers)."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    ys = np.minimum(np.floor(np.arange(out_h) * (in_h / out_h)).astype(np.int64), in_h - 1)
    xs = np.minimum(np.floor(np.arange(out_w) * (in_w / out_w)).astype(np.int64), in_w - 1)
    return x[..., ys, :][..., xs]
