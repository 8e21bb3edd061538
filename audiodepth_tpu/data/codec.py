"""Compact host→device transport codec.

HBM/host-link bandwidth is the usual bottleneck (and in this environment
fresh fp32 batches move at tunnel speed): a bs=256 batch is 83 MB in fp32
but only ~25 MB in source precision. The codec is lossless w.r.t. the data
sources:
  * waveform → int16: BatVision WAVs are 16-bit PCM, so int16 is exactly the
    source precision (load_wav divides by 32768; encode multiplies back).
  * depth → uint16 fixed-point with scale 65535/max_units: at 30 m range the
    quantum is 0.46 mm, finer than the datasets' native mm resolution.

Decode runs ON DEVICE inside the jitted step (Engine.put_batch), so the
host link carries the compact form and the float conversion is free
VPU work fused into the step.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

_DEPTH_KEYS = ("depth", "original_depth")


def encode_batch(batch: Dict[str, np.ndarray], max_depth_units: float) -> Dict[str, np.ndarray]:
    """Host-side: fp32 batch → compact dtypes. Leaves other keys untouched."""
    out = dict(batch)
    if "waveform" in out and out["waveform"].dtype == np.float32:
        # exact inverse of load_wav's /32768 PCM scaling
        w = np.round(out["waveform"] * 32768.0)
        out["waveform"] = np.clip(w, -32768, 32767).astype(np.int16)
    scale = 65535.0 / max_depth_units
    for key in _DEPTH_KEYS:
        if key in out and out[key].dtype == np.float32:
            d = np.clip(out[key], 0.0, max_depth_units)
            out[key] = np.round(d * scale).astype(np.uint16)
    if "image" in out and out["image"].dtype == np.float32:
        # images came from uint8 sources (/255 in the loaders): lossless
        out["image"] = np.round(np.clip(out["image"], 0, 1) * 255.0).astype(np.uint8)
    return out


def decode_batch(batch: Dict[str, jnp.ndarray], max_depth_units: float) -> Dict[str, jnp.ndarray]:
    """Device-side (jit-safe): compact dtypes → fp32 in dataset units."""
    out = dict(batch)
    if "waveform" in out and out["waveform"].dtype == jnp.int16:
        out["waveform"] = out["waveform"].astype(jnp.float32) / 32768.0
    inv = max_depth_units / 65535.0
    for key in _DEPTH_KEYS:
        if key in out and out[key].dtype == jnp.uint16:
            out[key] = out[key].astype(jnp.float32) * inv
    if "image" in out and out["image"].dtype == jnp.uint8:
        out["image"] = out["image"].astype(jnp.float32) / 255.0
    return out


def batch_is_compact(batch) -> bool:
    return any(
        getattr(v, "dtype", None) in (np.int16, np.uint16, jnp.int16, jnp.uint16)
        for v in batch.values()
    )
