"""Compact host→device transport codec.

HBM/host-link bandwidth is the usual bottleneck (and in this environment
fresh fp32 batches move at tunnel speed): a bs=256 batch is 83 MB in fp32
but only ~25 MB in source precision. The codec is lossless w.r.t. the data
sources:
  * waveform → int16: BatVision WAVs are 16-bit PCM, so int16 is exactly the
    source precision (load_wav divides by 32768; encode multiplies back).
    Raw .npy waveforms (BV1) with |w| > 1 get a per-sample waveform_scale
    factor (decoded on device) — ~1e-5 relative quantization instead of
    hard clipping.
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


def depth_storage_normalized(cfg) -> bool:
    """Whether the DATASET stores depth normalized to [0, 1].

    BV1, synthetic, and sparse-depth divide by max_depth when
    cfg.dataset.depth_norm (BatvisionV1_Dataset.py:63-64); the genuine BV2
    class ignores the flag and always keeps meters
    (BatvisionV2_Dataset.py:54-80) — the reference driver's depth_norm
    branch then scales those meters by max_depth again, a quirk the tasks
    reproduce via to_meters. The codec must clip to the STORED range, so
    every units decision routes through here (was: a scattered
    `1.0 if depth_norm else max_depth` that crushed BV2+depth_norm
    batches to [0, 1]; caught by tests/test_driver_parity.py).
    """
    return bool(cfg.dataset.depth_norm) and cfg.dataset.name != "batvisionv2"


def depth_storage_units(cfg) -> float:
    """Upper bound of the dataset's stored depth values (codec clip range)."""
    return 1.0 if depth_storage_normalized(cfg) else float(cfg.dataset.max_depth)


def encode_batch(batch: Dict[str, np.ndarray], max_depth_units: float) -> Dict[str, np.ndarray]:
    """Host-side: fp32 batch → compact dtypes. Leaves other keys untouched."""
    out = dict(batch)
    if "waveform" in out and out["waveform"].dtype == np.float32:
        w = out["waveform"]
        # WAV-decoded audio (BV2) is 16-bit PCM /32768, so |w| <= 1 and the
        # int16 round-trip is exact with scale 1. Raw .npy waveforms (BV1)
        # carry no range guarantee: a per-sample scale keeps them in int16
        # range instead of hard-clipping everything above 1.0 to garbage.
        peak = np.max(np.abs(w).reshape(w.shape[0], -1), axis=1)
        scale = np.maximum(peak, 1.0).astype(np.float32)
        sh = (-1,) + (1,) * (w.ndim - 1)
        wq = np.round(w / scale.reshape(sh) * 32768.0)
        out["waveform"] = np.clip(wq, -32768, 32767).astype(np.int16)
        out["waveform_scale"] = scale
    scale = 65535.0 / max_depth_units
    for key in _DEPTH_KEYS:
        if key in out and out[key].dtype == np.float32:
            # non-finite depth pixels (possible in raw BV2 .npy maps, which
            # the reference leaves unscrubbed and would NaN its loss with)
            # map to 0 = the invalid-mask value excluded from loss/metrics,
            # instead of an undefined float→uint16 cast; matches the native
            # path's scrub (adepth_io.cpp) and the reference's BV1 scrub
            # (BatvisionV1_Dataset.py:47-52: NaN/±inf→0)
            d = np.clip(np.nan_to_num(out[key], nan=0.0, posinf=0.0,
                                      neginf=0.0), 0.0, max_depth_units)
            out[key] = np.round(d * scale).astype(np.uint16)
    if "image" in out and out["image"].dtype == np.float32:
        # images came from uint8 sources (/255 in the loaders): lossless
        out["image"] = np.round(np.clip(out["image"], 0, 1) * 255.0).astype(np.uint8)
    return out


def decode_batch(batch: Dict[str, jnp.ndarray], max_depth_units: float) -> Dict[str, jnp.ndarray]:
    """Device-side (jit-safe): compact dtypes → fp32 in dataset units."""
    out = dict(batch)
    wscale = out.pop("waveform_scale", None)
    if "waveform" in out and out["waveform"].dtype == jnp.int16:
        w = out["waveform"].astype(jnp.float32) / 32768.0
        if wscale is not None:
            sh = (-1,) + (1,) * (w.ndim - 1)
            w = w * wscale.astype(jnp.float32).reshape(sh)
        out["waveform"] = w
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
