"""UNet with a VAE bottleneck at the innermost 1×1 block (cVAE family).

Capability twin of models/unet_cvae_model.py in the reference. Differences
from the baseline UNet (all per the reference semantics):
  * the innermost block's bottleneck feature [B,1,1,C] is flattened and run
    through fc_mu / fc_logvar / reparameterize / fc_dec
    (unet_cvae_model.py:8-46), with KL = mean_B(−½ Σ(1+logvar−μ²−e^logvar));
  * the innermost block does NOT concat its skip, so the up-conv directly
    above it takes inner_nc channels (unet_cvae_model.py:126-140);
  * the outermost head is identity when depth_norm else ReLU
    (unet_cvae_model.py:104-109 — note: NOT sigmoid, unlike the baseline).

forward → (depth, kl).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvDown, ConvUp, at_least_f32, make_norm
from .unet import UNetGenerator


class VAEBottleneck(nn.Module):
    latent_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, h: jnp.ndarray, sample: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = h.shape[0]
        c = h.shape[-1]
        flat = at_least_f32(h.reshape(b, -1))
        mu = nn.Dense(self.latent_dim, name="fc_mu")(flat)
        logvar = nn.Dense(self.latent_dim, name="fc_logvar")(flat)
        if sample:
            eps = jax.random.normal(self.make_rng("latent"), mu.shape)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            # deterministic posterior mean (used for eval/parity)
            z = mu
        recon = nn.Dense(flat.shape[-1], name="fc_dec")(z)
        kl = jnp.mean(-0.5 * jnp.sum(1.0 + logvar - mu ** 2 - jnp.exp(logvar), axis=1))
        return recon.reshape(h.shape).astype(h.dtype), kl


class UNetCVAE(nn.Module):
    input_nc: int = 2
    output_nc: int = 1
    num_downs: int = 8
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False
    depth_norm: bool = True
    latent_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x, train: bool = True, sample: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        norm = lambda: make_norm(self.norm, train, self.dtype)
        use_bias = self.norm == "instance"
        widths = UNetGenerator.channel_plan(self)
        n = self.num_downs

        x = x.astype(self.dtype)
        skips = []
        h = ConvDown(widths[0], use_bias=use_bias, dtype=self.dtype)(x)
        skips.append(h)
        for i in range(1, n):
            h = nn.leaky_relu(h, 0.2)
            h = ConvDown(widths[i], use_bias=use_bias, dtype=self.dtype)(h)
            if i < n - 1:
                h = norm()(h)
                skips.append(h)

        # VAE bottleneck on the 1x1 innermost feature
        h, kl = VAEBottleneck(self.latent_dim, dtype=self.dtype)(h, sample=sample)

        # innermost up (no skip concat above the bottleneck)
        h = nn.relu(h)
        h = ConvUp(widths[n - 2], use_bias=use_bias, dtype=self.dtype)(h)
        h = norm()(h)

        first_middle = True
        for i in range(n - 2, 0, -1):
            if first_middle:
                # the block above the innermost consumes inner_nc (no concat)
                first_middle = False
            else:
                h = jnp.concatenate([skips[i], h], axis=-1)
            h = nn.relu(h)
            h = ConvUp(widths[i - 1], use_bias=use_bias, dtype=self.dtype)(h)
            h = norm()(h)
            if self.use_dropout and widths[i - 1] == self.ngf * 8:
                h = nn.Dropout(0.5, deterministic=not train)(h)

        h = jnp.concatenate([skips[0], h], axis=-1)
        h = nn.relu(h)
        h = ConvUp(self.output_nc, use_bias=True, dtype=self.dtype)(h)
        h = at_least_f32(h)
        if not self.depth_norm:
            h = nn.relu(h)
        return h, kl


def build_unet_cvae(cfg) -> UNetCVAE:
    num_downs = 8 if cfg.model.generator == "unet_256" else 7
    from ..configs import resolve_compute_dtype

    compute = resolve_compute_dtype(cfg)
    return UNetCVAE(
        input_nc=cfg.model.input_nc,
        output_nc=cfg.model.output_nc,
        num_downs=num_downs,
        ngf=cfg.model.ngf,
        norm=cfg.model.norm,
        use_dropout=cfg.model.use_dropout,
        depth_norm=cfg.dataset.depth_norm,
        latent_dim=cfg.model.latent_dim,
        dtype=compute,
    )
