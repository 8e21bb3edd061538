"""Base + Residual depth model: shared encoder, two decoders.

Capability twin of models/base_residual_model.py:83-237 in the reference:
a UNet encoder (DoubleConv + 4 maxpool Downs, bilinear factor 2 → 512-ch
bottleneck) feeding
  * a deliberately THIN base decoder (1024→128→64→32→16→1) whose head is
    sigmoid·max_depth (coarse room structure, forced to generalize), and
  * a full-width residual decoder (→256→128→64→64→1) whose head is
    tanh·(0.3·max_depth) (signed fine corrections),
with final = clip(base + residual, 0, max_depth) computed by the caller
(the detach-curriculum in the task decides where gradients flow).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import DoubleConv, Down, UpBilinear, at_least_f32


class SharedEncoder(nn.Module):
    """inc + down1..4 (base_channels ×{1,2,4,8,8} with bilinear factor 2)."""

    base_channels: int = 64
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        c = self.base_channels
        x1 = DoubleConv(c, train=self.train, dtype=self.dtype)(x)
        x2 = Down(c * 2, train=self.train, dtype=self.dtype)(x1)
        x3 = Down(c * 4, train=self.train, dtype=self.dtype)(x2)
        x4 = Down(c * 8, train=self.train, dtype=self.dtype)(x3)
        x5 = Down(c * 8, train=self.train, dtype=self.dtype)(x4)  # 16//factor
        return {"x1": x1, "x2": x2, "x3": x3, "x4": x4, "x5": x5}


class BaseResidualNet(nn.Module):
    input_channels: int = 2
    base_channels: int = 64
    max_depth: float = 30.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        c = self.base_channels
        f = SharedEncoder(c, train=train, dtype=self.dtype)(x)

        # thin base decoder (channels fixed per the reference's design note)
        b = UpBilinear(128, train=train, dtype=self.dtype)(f["x5"], f["x4"])
        b = UpBilinear(64, train=train, dtype=self.dtype)(b, f["x3"])
        b = UpBilinear(32, train=train, dtype=self.dtype)(b, f["x2"])
        b = UpBilinear(16, train=train, dtype=self.dtype)(b, f["x1"])
        b = at_least_f32(nn.Conv(1, (1, 1), dtype=self.dtype)(b))
        base = nn.sigmoid(b) * self.max_depth

        # full-width residual decoder
        r = UpBilinear(c * 4, train=train, dtype=self.dtype)(f["x5"], f["x4"])
        r = UpBilinear(c * 2, train=train, dtype=self.dtype)(r, f["x3"])
        r = UpBilinear(c, train=train, dtype=self.dtype)(r, f["x2"])
        r = UpBilinear(c, train=train, dtype=self.dtype)(r, f["x1"])
        r = at_least_f32(nn.Conv(1, (1, 1), dtype=self.dtype)(r))
        residual = jnp.tanh(r) * (0.3 * self.max_depth)

        return base, residual
