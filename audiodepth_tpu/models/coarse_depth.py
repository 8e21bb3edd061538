"""Coarse-depth (depth-as-classification) model family.

Capability twins of models/coarse_depth_model.py in the reference:
  * CoarseDepthUNet  — UNet encoder-decoder with an n_bins classification
    head; depth = Σ softmax(logits)·bin_centers (soft binning), logits
    bilinear-resized when needed (:86-192).
  * CoarseDepthLite  — plain strided conv encoder / transposed-conv decoder
    (5 stages, LeakyReLU down / ReLU up) with a 3×3 n_bins head (:199-287).
  * CoarseWithOffsetModel — shared encoder, classification decoder + an
    offset-regression decoder whose fusion conv consumes stop_grad(coarse);
    final = coarse + offset (:591-770).
  * DualRegressionModel — two regression decoders, offset fusion consumes
    stop_grad(coarse); final = coarse + offset (:857-994).

bin_centers enter as a forward argument (not a buffer) so the same compiled
graph serves any binning scheme; checkpoints carry them as aux payloads.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from .base_residual import SharedEncoder
from .layers import BatchNorm, ConvDown, ConvUp, UpBilinear, at_least_f32, kaiming_init


def soft_binning(logits: jnp.ndarray, bin_centers: jnp.ndarray) -> jnp.ndarray:
    """Expected depth from [B,H,W,n_bins] logits and [n_bins] centers."""
    probs = jax.nn.softmax(at_least_f32(logits), axis=-1)
    return jnp.sum(probs * bin_centers[None, None, None, :], axis=-1, keepdims=True)


def _resize_bilinear_to(x: jnp.ndarray, size: int) -> jnp.ndarray:
    if x.shape[1] == size and x.shape[2] == size:
        return x
    return jax.image.resize(
        x, (x.shape[0], size, size, x.shape[-1]), method="linear"
    )


class _Decoder(nn.Module):
    """Standard 4-Up UNet decoder over a SharedEncoder pyramid."""

    base_channels: int
    train: bool
    dtype: Any

    @nn.compact
    def __call__(self, f: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        c = self.base_channels
        x = UpBilinear(c * 4, train=self.train, dtype=self.dtype)(f["x5"], f["x4"])
        x = UpBilinear(c * 2, train=self.train, dtype=self.dtype)(x, f["x3"])
        x = UpBilinear(c, train=self.train, dtype=self.dtype)(x, f["x2"])
        x = UpBilinear(c, train=self.train, dtype=self.dtype)(x, f["x1"])
        return x


class CoarseDepthUNet(nn.Module):
    input_channels: int = 2
    n_bins: int = 128
    base_channels: int = 64
    output_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bin_centers, train: bool = True):
        x = x.astype(self.dtype)
        f = SharedEncoder(self.base_channels, train=train, dtype=self.dtype)(x)
        h = _Decoder(self.base_channels, train, self.dtype)(f)
        logits = at_least_f32(nn.Conv(self.n_bins, (1, 1), dtype=self.dtype,
                                      kernel_init=kaiming_init())(h))
        logits = _resize_bilinear_to(logits, self.output_size)
        depth = soft_binning(logits, bin_centers)
        return logits, depth


class CoarseDepthLite(nn.Module):
    input_channels: int = 2
    n_bins: int = 128
    base_channels: int = 48
    output_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bin_centers, train: bool = True):
        x = x.astype(self.dtype)
        c = self.base_channels
        widths_down = [c, c * 2, c * 4, c * 8, c * 8]
        h = x
        for w in widths_down:
            h = ConvDown(w, use_bias=True, kernel_init=kaiming_init(), dtype=self.dtype)(h)
            h = BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.2)
        widths_up = [c * 8, c * 4, c * 2, c, c]
        for w in widths_up:
            h = ConvUp(w, use_bias=True, kernel_init=kaiming_init(), dtype=self.dtype)(h)
            h = BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
            h = nn.relu(h)
        logits = at_least_f32(nn.Conv(self.n_bins, (3, 3), padding="SAME",
                                      dtype=self.dtype,
                                      kernel_init=kaiming_init())(h))
        logits = _resize_bilinear_to(logits, self.output_size)
        depth = soft_binning(logits, bin_centers)
        return logits, depth


class _OffsetFusion(nn.Module):
    """conv3(c+1→c)+BN+ReLU → conv3(c→c/2)+BN+ReLU → 1×1 head."""

    base_channels: int
    train: bool
    dtype: Any

    @nn.compact
    def __call__(self, feats, coarse_detached):
        c = self.base_channels
        h = jnp.concatenate([feats, coarse_detached.astype(feats.dtype)], axis=-1)
        h = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=kaiming_init())(h)
        h = BatchNorm(use_running_average=not self.train, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(c // 2, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=kaiming_init())(h)
        h = BatchNorm(use_running_average=not self.train, dtype=self.dtype)(h)
        h = nn.relu(h)
        return at_least_f32(nn.Conv(1, (1, 1), dtype=self.dtype,
                                    kernel_init=kaiming_init())(h))


class CoarseWithOffsetModel(nn.Module):
    input_channels: int = 2
    n_bins: int = 8
    base_channels: int = 64
    output_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bin_centers, train: bool = True):
        x = x.astype(self.dtype)
        c = self.base_channels
        f = SharedEncoder(c, train=train, dtype=self.dtype)(x)

        ch = _Decoder(c, train, self.dtype, name="coarse_decoder")(f)
        logits = nn.Conv(self.n_bins, (1, 1), dtype=self.dtype,
                         kernel_init=kaiming_init(), name="coarse_head")(ch)
        logits = _resize_bilinear_to(at_least_f32(logits), self.output_size)
        coarse = soft_binning(logits, bin_centers)

        oh = _Decoder(c, train, self.dtype, name="offset_decoder")(f)
        oh = _resize_bilinear_to(oh, self.output_size)
        offset = _OffsetFusion(c, train, self.dtype, name="offset_fusion")(
            oh, jax.lax.stop_gradient(coarse)
        )
        final = coarse + offset
        return logits, coarse, offset, final


class DualRegressionModel(nn.Module):
    input_channels: int = 2
    base_channels: int = 64
    output_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        c = self.base_channels
        f = SharedEncoder(c, train=train, dtype=self.dtype)(x)

        ch = _Decoder(c, train, self.dtype, name="coarse_decoder")(f)
        coarse = at_least_f32(nn.Conv(1, (1, 1), dtype=self.dtype,
                                      kernel_init=kaiming_init(),
                                      name="coarse_head")(ch))
        coarse = _resize_bilinear_to(coarse, self.output_size)

        oh = _Decoder(c, train, self.dtype, name="offset_decoder")(f)
        oh = _resize_bilinear_to(oh, self.output_size)
        offset = _OffsetFusion(c, train, self.dtype, name="offset_fusion")(
            oh, jax.lax.stop_gradient(coarse)
        )
        final = coarse + offset
        return coarse, offset, final
