"""Legacy generic blocks (parity with models/utils_models.py).

The reference keeps leftover encode/fc/decode blocks that no current model
uses (utils_models.py:6-65 — imported `*` by train.py/test.py but never
referenced; its only live content is a comment about DDP unused-parameter
pitfalls). They are reproduced here for capability parity: a strided
conv + BN + LeakyReLU encoder block, a Dense + BN + LeakyReLU block, and a
transposed-conv decoder block.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm


class EncodeBlock(nn.Module):
    features: int
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.2)


class FCBlock(nn.Module):
    features: int
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.2)


class DecodeBlock(nn.Module):
    features: int
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not self.train, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.2)
