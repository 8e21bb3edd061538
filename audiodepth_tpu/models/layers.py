"""Shared NHWC building blocks for the model zoo.

TPU-first conventions:
  * NHWC layout (XLA's native TPU conv layout) — inputs are [B, H, W, C].
  * Params live in fp32; compute dtype is configurable (bfloat16 default in
    training) via the ``dtype`` attribute threaded through every block.
  * BatchNorm statistics are computed over the *global* batch: under jit with
    a data-sharded batch, XLA inserts the cross-chip reduction automatically,
    so data-parallel training gets sync-BN semantics by construction (the
    reference's per-replica DataParallel stats are a quirk, not a feature).

Initializers mirror the reference families:
  * ``normal_init(0.02)`` — pix2pix-style UNet baseline
    (models/unetbaseline_model.py:9-40 in the reference).
  * ``kaiming_init()`` — fan_out ReLU init used by the residual/attention/
    adabins/coarse families (e.g. models/base_residual_model.py:142-151).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def normal_init(std: float = 0.02):
    return nn.initializers.normal(stddev=std)


def kaiming_init():
    # torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def at_least_f32(x):
    """Cast to fp32 for numerics-critical math (heads, softmax statistics)
    without ever DOWNcasting — the float64 gradient-parity tests run the
    whole model in f64 and a hard .astype(float32) would truncate them."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


class _TorchExactBatchNorm(nn.Module):
    """BatchNorm core with torch's EXACT running-stat update.

    flax.linen.BatchNorm folds the BIASED batch variance into the running
    average; torch.nn.BatchNorm2d folds the UNBIASED one (×n/(n−1),
    n = B·H·W per channel — _functions.py BatchNorm backward). At
    n = 2048 that is a 5e-4 relative running-var skew, which the
    driver-level A/B (tests/test_driver_parity.py, eval-mode forwards
    after a trained epoch) measures directly; train-mode normalization
    (biased batch stats) is identical in both frameworks. Param/stat
    names and shapes mirror flax's BatchNorm so existing checkpoints and
    torch transplants are untouched.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (feat,))
        bias = self.param("bias", nn.initializers.zeros_init(), (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if self.use_running_average:
            mean = ra_mean.value.astype(stat_dtype)
            var = ra_var.value.astype(stat_dtype)
        else:
            xs = x.astype(stat_dtype)
            mean = jnp.mean(xs, axis=axes)
            # E[x²]−E[x]² (flax's fast-variance formula); clipped at 0
            var = jnp.maximum(
                jnp.mean(jnp.square(xs), axis=axes) - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size // feat
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                # accumulate in the STORED stat dtype (f32 normally; f64
                # transplants keep full precision like torch double mode)
                rdt = ra_var.value.dtype
                ra_mean.value = (m * ra_mean.value
                                 + (1.0 - m) * mean.astype(rdt))
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * unbiased.astype(rdt))
        y = (x.astype(stat_dtype) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(stat_dtype) + bias.astype(stat_dtype)
        return y.astype(self.dtype)


class BatchNorm(nn.Module):
    """BatchNorm2d twin: momentum 0.9 (torch 0.1), eps 1e-5, affine."""

    use_running_average: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # explicit name keeps the param/stat tree identical to the old
        # flax nn.BatchNorm inner module (checkpoints/transplants stable)
        return _TorchExactBatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="BatchNorm_0",
        )(x)


def make_norm(norm: str, train: bool, dtype: Dtype):
    """norm in {batch, instance, none} (unetbaseline_model.py:59-77)."""
    if norm == "batch":
        return lambda x: BatchNorm(use_running_average=not train, dtype=dtype)(x)
    if norm == "instance":
        # InstanceNorm: per-sample, per-channel spatial normalization,
        # no affine params, no running stats.
        def inorm(x):
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)

        return inorm
    if norm == "none":
        return lambda x: x
    raise ValueError(f"unknown norm {norm!r}")


class ConvDown(nn.Module):
    """k4 s2 p1 strided conv (the pix2pix down-sampling conv)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = normal_init()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )(x)


class ConvUp(nn.Module):
    """k4 s2 transposed conv producing exactly 2x spatial (pix2pix up conv)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = normal_init()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )(x)


class DoubleConv(nn.Module):
    """(conv3x3 → BN → ReLU) × 2 (base_residual_model.py:23-40 twin)."""

    features: int
    mid_features: Optional[int] = None
    train: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.mid_features or self.features
        for feats in (mid, self.features):
            x = nn.Conv(
                feats, (3, 3), padding="SAME", use_bias=False,
                kernel_init=kaiming_init(), dtype=self.dtype,
            )(x)
            x = BatchNorm(use_running_average=not self.train, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class Down(nn.Module):
    """maxpool2 then DoubleConv."""

    features: int
    train: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.features, train=self.train, dtype=self.dtype)(x)


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample with torch align_corners=True phase.

    torch's nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)
    maps output index o to input coordinate o*(in-1)/(out-1) with pixel
    centers at integers. jax.image.scale_and_translate samples input at
    (o + 0.5 - translation)/scale - 0.5, so scale=(out-1)/(in-1) and
    translation=0.5-0.5*scale reproduce it exactly (verified vs torch to
    ~4e-6 fp32). Weight-transplant parity with the reference Up blocks
    (base_residual_model.py:57-80) depends on this phase.
    """
    b, h, w, c = x.shape
    oh, ow = 2 * h, 2 * w
    scale = jnp.array(
        [(oh - 1) / max(h - 1, 1), (ow - 1) / max(w - 1, 1)],
        dtype=jnp.promote_types(x.dtype, jnp.float32),
    )
    translation = 0.5 - 0.5 * scale
    return jax.image.scale_and_translate(
        x, (b, oh, ow, c), (1, 2), scale, translation, "linear", antialias=False
    )


class UpBilinear(nn.Module):
    """2x bilinear upsample → concat skip → DoubleConv(out, mid=in//2).

    Twin of the bilinear branch of Up (base_residual_model.py:57-80),
    including the align_corners=True upsample phase.
    """

    features: int
    train: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = upsample2x_align_corners(x)
        x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
        in_ch = x.shape[-1]
        return DoubleConv(
            self.features, mid_features=in_ch // 2, train=self.train, dtype=self.dtype
        )(x)


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
