"""pix2pix-style UNet generator (the `unet_baseline` family).

Capability twin of models/unetbaseline_model.py:84-235 in the reference
(UnetGenerator / UnetSkipConnectionBlock / define_G), re-expressed as an
explicit NHWC encoder-decoder loop: the reference's recursive
skip-connection blocks compute exactly an encoder stack, a bottleneck, and a
decoder stack with channel-concat skips, so the loop form is the same
function with a layout XLA schedules better.

Structure for unet_256 (num_downs=8, ngf=64):
  enc:  in→64 (conv only), 64→128, 128→256, 256→512, 512→512, 512→512,
        512→512 (each: lrelu(0.2) → conv k4s2 → BN), innermost 512→512
        (lrelu → conv, no norm)
  dec:  innermost up 512→512 (relu → convT k4s2 → BN), then ups on
        concat(skip, prev): 1024→512 ×3 (optional dropout 0.5), 1024→256,
        512→128, 256→64, outermost 128→out (relu → convT → head)
  head: Sigmoid when depth_norm else ReLU
        (unetbaseline_model.py:195-206 — sigmoid keeps normalized depth in
        [0,1]; relu keeps metric depth non-negative).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvDown, ConvUp, at_least_f32, make_norm


class UNetGenerator(nn.Module):
    input_nc: int = 2
    output_nc: int = 1
    num_downs: int = 8          # 8 = unet_256, 7 = unet_128
    ngf: int = 64
    norm: str = "batch"         # batch | instance | none
    use_dropout: bool = False
    depth_norm: bool = True     # selects sigmoid vs relu head
    dtype: Any = jnp.float32

    def channel_plan(self) -> Sequence[int]:
        """Encoder output channels, outermost→innermost."""
        ngf = self.ngf
        widths = [ngf, ngf * 2, ngf * 4] + [ngf * 8] * (self.num_downs - 3)
        return widths

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: make_norm(self.norm, train, self.dtype)
        use_bias = self.norm == "instance"
        widths = self.channel_plan()
        n = self.num_downs

        x = x.astype(self.dtype)

        # ---- encoder -------------------------------------------------
        skips = []
        h = ConvDown(widths[0], use_bias=use_bias, dtype=self.dtype)(x)
        skips.append(h)
        for i in range(1, n):
            h = nn.leaky_relu(h, 0.2)
            h = ConvDown(widths[i], use_bias=use_bias, dtype=self.dtype)(h)
            if i < n - 1:  # innermost conv has no norm
                h = norm()(h)
                skips.append(h)

        # ---- decoder -------------------------------------------------
        # innermost up: operates on bottleneck alone
        h = nn.relu(h)
        h = ConvUp(widths[n - 2], use_bias=use_bias, dtype=self.dtype)(h)
        h = norm()(h)

        # middle ups: concat skip then up. Dropout on the ngf*8 blocks only
        # (the reference applies it to the num_downs-5 intermediate blocks).
        for i in range(n - 2, 0, -1):
            h = jnp.concatenate([skips[i], h], axis=-1)
            h = nn.relu(h)
            h = ConvUp(widths[i - 1], use_bias=use_bias, dtype=self.dtype)(h)
            h = norm()(h)
            if self.use_dropout and widths[i - 1] == self.ngf * 8:
                h = nn.Dropout(0.5, deterministic=not train)(h)

        # outermost
        h = jnp.concatenate([skips[0], h], axis=-1)
        h = nn.relu(h)
        h = ConvUp(self.output_nc, use_bias=True, dtype=self.dtype)(h)
        h = at_least_f32(h)
        if self.depth_norm:
            return nn.sigmoid(h)
        return nn.relu(h)


def build_unet(cfg, input_nc=None) -> UNetGenerator:
    """Factory from a Config (define_G twin, unetbaseline_model.py:84-120)."""
    gen = cfg.model.generator
    if gen == "unet_256":
        num_downs = 8
    elif gen == "unet_128":
        num_downs = 7
    else:
        raise NotImplementedError(f"generator {gen!r} not recognized")
    from ..configs import resolve_compute_dtype

    compute = resolve_compute_dtype(cfg)
    return UNetGenerator(
        input_nc=input_nc if input_nc is not None else cfg.model.input_nc,
        output_nc=cfg.model.output_nc,
        num_downs=num_downs,
        ngf=cfg.model.ngf,
        norm=cfg.model.norm,
        use_dropout=cfg.model.use_dropout,
        depth_norm=cfg.dataset.depth_norm,
        dtype=compute,
    )
