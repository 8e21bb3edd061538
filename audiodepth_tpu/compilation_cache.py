"""Persistent XLA compilation-cache setup.

The flagship graphs here (UNet-256 train step at bs=256, the full-width
binaural step) cost minutes of XLA compile time on a slow host window.
Pointing JAX at an on-disk cache makes every repeat invocation of the
bench / CLI / driver entry start timing in seconds instead. Safe to call
any time before the first compilation; harmless if the backend declines
the cache (the try/except keeps exotic platforms working).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)


def enable(cache_dir: str | None = None,
           min_compile_secs: float = 10.0) -> None:
    """Enable the persistent compilation cache (idempotent).

    Skipped unless the process resolves to a TPU backend: XLA:CPU AOT
    cache keys do not include the host's CPU feature set, so an entry
    written on one host can SIGILL on another (observed as
    cpu_aot_loader "machine type ... doesn't match" errors when this VM
    migrates). TPU executables don't have that problem — the serialized
    artifact targets the accelerator, not the host. The check covers both
    an explicit jax_platforms=cpu pin AND a silent CPU fallback (e.g. the
    device tunnel being unavailable).

    NOTE: resolves the backend as a side effect, which makes the platform
    choice sticky — do not call before code that must pick the platform
    itself (e.g. __graft_entry__.dryrun_multichip provisions a virtual CPU
    mesh first and only then compiles).
    """
    try:
        if (getattr(jax.config, "jax_platforms", None) or "").strip() == "cpu":
            return
        if jax.default_backend() != "tpu":
            return
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        pass


def disable() -> None:
    """Turn the persistent cache back off (used when a process that already
    called enable() later pins itself to the CPU platform)."""
    try:
        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass
