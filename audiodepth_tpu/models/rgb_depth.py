"""RGB teacher UNet with feature taps for distillation.

Capability twin of models/rgb_depth_model.py:80-222 in the reference: a
plain UNet for 3-channel RGB whose feature widths (64/128/256/512/512 at
x1-x5, 256/128/64/64 at d4-d1) deliberately match the binaural student's
fused pyramid so encoder/decoder features can be distilled level-by-level.
Head is a 1×1 conv with clamp [0, max_depth] (no sigmoid).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .base_residual import SharedEncoder
from .layers import UpBilinear, at_least_f32, kaiming_init


class RGBDepthNet(nn.Module):
    base_channels: int = 64
    max_depth: float = 30.0
    output_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        x = x.astype(self.dtype)
        c = self.base_channels
        f = SharedEncoder(c, train=train, dtype=self.dtype)(x)

        d4 = UpBilinear(c * 4, train=train, dtype=self.dtype)(f["x5"], f["x4"])
        d3 = UpBilinear(c * 2, train=train, dtype=self.dtype)(d4, f["x3"])
        d2 = UpBilinear(c, train=train, dtype=self.dtype)(d3, f["x2"])
        d1 = UpBilinear(c, train=train, dtype=self.dtype)(d2, f["x1"])

        depth = nn.Conv(1, (1, 1), dtype=self.dtype, kernel_init=kaiming_init())(d1)
        depth = at_least_f32(depth)
        if depth.shape[1] != self.output_size:
            depth = jax.image.resize(
                depth, (depth.shape[0], self.output_size, self.output_size, 1),
                method="linear",
            )
        depth = jnp.clip(depth, 0.0, self.max_depth)

        if return_features:
            feats = dict(f)
            feats.update({"d1": d1, "d2": d2, "d3": d3, "d4": d4})
            return depth, feats
        return depth
