"""Twin AdaBins networks: RGB teacher + audio student with distillation.

Capability twin of models/adabins_distillation_model.py:85-459 in the
reference: each network is a 5-scale encoder, an adaptive-bin predictor
(global average pool → MLP → softmax widths → cumsum edges × max_depth →
centers), and a UNet decoder with an n_bins classification head whose
soft-binning expectation Σ softmax(logits)·centers gives the base depth; a
SHARED 1×1 residual head over the decoder features adds tanh·(0.05·max_depth).

TPU-native delta: the reference runs each decoder TWICE (once for logits,
once to re-derive features for the residual head —
adabins_distillation_model.py:322-340,371-389, flagged in SURVEY §3.3); here
the decoder returns (logits, features) in ONE pass, halving decoder FLOPs
with identical outputs.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import DoubleConv, Down, UpBilinear, at_least_f32, kaiming_init


class AdaBinsEncoder(nn.Module):
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
        x5 = Down(c * 8, train=self.train, dtype=self.dtype)(x4)
        return {"x1": x1, "x2": x2, "x3": x3, "x4": x4, "x5": x5}


class BinPredictor(nn.Module):
    """global pool → Linear(256) → ReLU → Dropout(0.1) → Linear(n_bins) → softmax."""

    n_bins: int = 128
    max_depth: float = 30.0
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        g = at_least_f32(jnp.mean(feats, axis=(1, 2)))
        h = nn.Dense(256, kernel_init=kaiming_init())(g)
        h = nn.relu(h)
        h = nn.Dropout(0.1, deterministic=not self.train)(h)
        widths = jax.nn.softmax(nn.Dense(self.n_bins, kernel_init=kaiming_init())(h), axis=1)
        edges = jnp.cumsum(widths, axis=1)
        edges = jnp.concatenate([jnp.zeros_like(edges[:, :1]), edges], axis=1) * self.max_depth
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
        return centers, widths


class AdaBinsDecoder(nn.Module):
    """UNet decoder → (bin logits, final decoder features)."""

    base_channels: int = 64
    n_bins: int = 128
    output_size: int = 256
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f: Dict[str, jnp.ndarray]):
        c = self.base_channels
        x = UpBilinear(c * 8, train=self.train, dtype=self.dtype)(f["x5"], f["x4"])
        x = UpBilinear(c * 4, train=self.train, dtype=self.dtype)(x, f["x3"])
        x = UpBilinear(c * 2, train=self.train, dtype=self.dtype)(x, f["x2"])
        x = UpBilinear(c, train=self.train, dtype=self.dtype)(x, f["x1"])
        logits = nn.Conv(self.n_bins, (1, 1), dtype=self.dtype,
                         kernel_init=kaiming_init())(x)
        logits = at_least_f32(logits)
        if logits.shape[1] != self.output_size:
            # NEAREST for depth-related logits (reference choice)
            logits = jax.image.resize(
                logits,
                (logits.shape[0], self.output_size, self.output_size, logits.shape[-1]),
                method="nearest",
            )
        return logits, x


class AdaBinsBranch(nn.Module):
    """One full AdaBins net (encoder + bin predictor + decoder)."""

    input_channels: int
    base_channels: int = 64
    n_bins: int = 128
    max_depth: float = 30.0
    output_size: int = 256
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = AdaBinsEncoder(self.base_channels, train=self.train, dtype=self.dtype)(x)
        centers, widths = BinPredictor(
            self.n_bins, self.max_depth, train=self.train, dtype=self.dtype
        )(feats["x5"])
        logits, dec_feats = AdaBinsDecoder(
            self.base_channels, self.n_bins, self.output_size,
            train=self.train, dtype=self.dtype,
        )(feats)
        probs = jax.nn.softmax(logits, axis=-1)
        base_depth = jnp.sum(probs * centers[:, None, None, :], axis=-1, keepdims=True)
        return {
            "features": feats,
            "bin_centers": centers,
            "bin_widths": widths,
            "bin_logits": logits,
            "base_depth": base_depth,
            "decoder_features": dec_feats,
        }


class AdaBinsDistillationModel(nn.Module):
    n_bins: int = 128
    base_channels: int = 64
    output_size: int = 256
    max_depth: float = 30.0
    # twin networks double activation memory, but bs<=64 fits a 16 GB chip
    # without remat and remat costs 28-33% (RESULTS.md ablation) — so the
    # default is OFF; pass remat=True for larger batches
    # (SURVEY hard part 7: "consider remat for the teacher")
    remat: bool = False
    dtype: Any = jnp.float32

    def _branch(self, name: str, in_ch: int, train: bool):
        cls = nn.remat(AdaBinsBranch) if self.remat else AdaBinsBranch
        return cls(
            input_channels=in_ch,
            base_channels=self.base_channels,
            n_bins=self.n_bins,
            max_depth=self.max_depth,
            output_size=self.output_size,
            train=train,
            dtype=self.dtype,
            name=name,
        )

    @staticmethod
    def _residual_from(head, dec_feats, output_size, max_depth):
        raw = at_least_f32(head(dec_feats))
        if raw.shape[1] != output_size:
            raw = jax.image.resize(
                raw, (raw.shape[0], output_size, output_size, 1), method="nearest"
            )
        return jnp.tanh(raw) * (0.05 * max_depth)

    @nn.compact
    def __call__(self, audio, rgb=None, train: bool = True, mode: str = "train"):
        # ONE shared residual head module, applied to both branches
        # (adabins_distillation_model.py:280 — shared architecture)
        residual_head = nn.Conv(1, (1, 1), dtype=self.dtype,
                                kernel_init=kaiming_init(), name="residual_head")

        audio_out = self._branch("audio", 2, train)(audio.astype(self.dtype))
        audio_out["residual"] = self._residual_from(
            residual_head, audio_out["decoder_features"], self.output_size, self.max_depth
        )
        audio_out["final_depth"] = jnp.clip(
            audio_out["base_depth"] + audio_out["residual"], 0.0, self.max_depth
        )

        rgb_out = None
        if mode == "train" and rgb is not None:
            # frozen teacher: no gradients flow into the RGB branch
            rgb_out = self._branch("rgb", 3, train)(rgb.astype(self.dtype))
            rgb_out["residual"] = self._residual_from(
                residual_head, rgb_out["decoder_features"], self.output_size, self.max_depth
            )
            rgb_out["final_depth"] = jnp.clip(
                rgb_out["base_depth"] + rgb_out["residual"], 0.0, self.max_depth
            )
            rgb_out = jax.tree_util.tree_map(jax.lax.stop_gradient, rgb_out)
        return {"audio": audio_out, "rgb": rgb_out}
