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


def _triangle_weight_mat(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] row-stochastic triangle (linear/antialias) resample matrix.

    Mirrors jax._src.image.scale.compute_weight_mat for the 'linear' kernel
    with antialias=True: half-pixel sample centers, kernel support widened by
    in/out when downscaling, weights renormalized to sum 1.
    """
    inv_scale = in_size / out_size
    kernel_scale = max(inv_scale, 1.0)
    sample_f = (np.arange(out_size, dtype=np.float64) + 0.5) * inv_scale - 0.5
    x = np.abs(sample_f[:, None] - np.arange(in_size, dtype=np.float64)[None, :])
    w = np.maximum(0.0, 1.0 - x / kernel_scale)
    total = w.sum(axis=1, keepdims=True)
    w = np.where(np.abs(total) > 1000.0 * np.finfo(np.float32).eps,
                 w / np.where(total != 0.0, total, 1.0), 0.0)
    ok = (sample_f >= -0.5) & (sample_f <= in_size - 0.5)
    return np.where(ok[:, None], w, 0.0).astype(np.float32)


_weight_cache: dict = {}


def resize_bilinear_np(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host numpy twin of resize_bilinear (torchvision Resize semantics).

    Used by host-side dataset loaders (e.g. sparse-depth targets, which the
    reference resizes with torchvision.transforms.Resize — bilinear,
    antialiased — via get_transform(convert=True),
    SparseDepth_Dataset.py:129-133) without touching the accelerator.
    """
    in_h, in_w = x.shape[-2], x.shape[-1]
    kh, kw = ("h", in_h, out_h), ("w", in_w, out_w)
    if kh not in _weight_cache:
        _weight_cache[kh] = _triangle_weight_mat(in_h, out_h)
    if kw not in _weight_cache:
        _weight_cache[kw] = _triangle_weight_mat(in_w, out_w)
    wh, ww = _weight_cache[kh], _weight_cache[kw]
    y = np.einsum("oh,...hw->...ow", wh, x.astype(np.float32))
    return np.einsum("pw,...ow->...op", ww, y)


def resize_nearest_cv2_np(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host numpy twin of resize_nearest_cv2 (for data-pipeline workers)."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    ys = np.minimum(np.floor(np.arange(out_h) * (in_h / out_h)).astype(np.int64), in_h - 1)
    xs = np.minimum(np.floor(np.arange(out_w) * (in_w / out_w)).astype(np.int64), in_w - 1)
    return x[..., ys, :][..., xs]
