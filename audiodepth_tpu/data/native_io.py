"""ctypes binding for the native IO runtime (native/adepth_io.cpp).

Builds libadepth_io.so with g++ on first use (cached next to the source)
and exposes:
  * decode_wav_i16(path, fixed_len) → int16 [C, fixed_len] (transport form)
  * load_depth_u16(path, out_hw, max_depth, depth_norm) → uint16 [H, W]
  * assemble_batch(wav_paths, depth_paths, ...) → (int16 [B,C,L],
    uint16 [B,H,W,1]) decoded by a GIL-free thread pool

Falls back cleanly: `available()` is False when no compiler/toolchain
exists, and callers keep the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "adepth_io.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libadepth_io.so")


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    try:
        if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
            return so
    except OSError:
        # source absent (e.g. installed without the native tree): use the
        # prebuilt .so if there is one
        return so if os.path.exists(so) else None
    # compile to a private temp name, then os.replace (atomic on POSIX):
    # a concurrent builder in another process never sees a half-written .so
    tmp = f"{so}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", tmp, src, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so)
        return so
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            # corrupt cached .so (older interrupted build): rebuild once
            try:
                os.remove(so)
            except OSError:
                return None
            so = _build()
            if so is None:
                return None
            try:
                lib = ctypes.CDLL(so)
            except OSError:
                return None
        try:
            _bind(lib)
        except AttributeError:  # stale .so missing a symbol
            return None
        _LIB = lib
        return _LIB


def _bind(lib: ctypes.CDLL) -> None:
    lib.adepth_decode_wav_i16.restype = ctypes.c_int
    lib.adepth_decode_wav_i16.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.adepth_load_depth_u16.restype = ctypes.c_int
    lib.adepth_load_depth_u16.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
    ]
    lib.adepth_assemble_batch.restype = ctypes.c_int
    lib.adepth_assemble_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int32,
    ]


def available() -> bool:
    return _load() is not None


def decode_wav_i16(path: str, fixed_len: int, channels: int = 2) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.zeros((channels, fixed_len), np.int16)
    ch = ctypes.c_int32(0)
    sr = ctypes.c_int32(0)
    rc = lib.adepth_decode_wav_i16(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        fixed_len, ctypes.byref(ch), ctypes.byref(sr),
    )
    if rc != 0:
        raise IOError(f"native wav decode failed ({rc}): {path}")
    if ch.value != channels:
        raise IOError(f"expected {channels}ch, got {ch.value}: {path}")
    return out


def load_depth_u16(path: str, out_hw: Tuple[int, int], max_depth: float,
                   depth_norm: bool) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.zeros(out_hw, np.uint16)
    rc = lib.adepth_load_depth_u16(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out_hw[0], out_hw[1], max_depth, 1 if depth_norm else 0,
    )
    if rc != 0:
        raise IOError(f"native depth load failed ({rc}): {path}")
    return out


def assemble_batch(
    wav_paths: Optional[Sequence[str]],
    depth_paths: Sequence[str],
    fixed_len: int,
    out_hw: Tuple[int, int],
    max_depth: float,
    depth_norm: bool,
    channels: int = 2,
    n_threads: int = 8,
):
    """Decode a whole batch in native threads (GIL released during the call).

    Returns (wav int16 [B,C,L] or None, depth uint16 [B,H,W,1]) — already in
    the compact transport dtypes of data/codec.py.
    """
    lib = _load()
    assert lib is not None
    b = len(depth_paths)
    wav_out = np.zeros((b, channels, fixed_len), np.int16)
    depth_out = np.zeros((b, out_hw[0], out_hw[1]), np.uint16)
    wav_blob = "\n".join(wav_paths).encode() if wav_paths else b""
    rc = lib.adepth_assemble_batch(
        wav_blob, "\n".join(depth_paths).encode(), b, fixed_len, channels,
        out_hw[0], out_hw[1], max_depth, 1 if depth_norm else 0,
        wav_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        depth_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n_threads,
    )
    if rc != 0:
        raise IOError(f"native batch assembly failed ({rc})")
    return (wav_out if wav_paths else None), depth_out[..., None]
