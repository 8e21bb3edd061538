"""Load the reference PyTorch model modules for interop/parity tests.

The reference checkout at /root/reference has no package __init__, and
models/unet_cvae_model.py uses a relative import, so we synthesize a
package named ``refmodels`` and load the files into it.  Nothing is copied
into this repo; tests that need the reference skip when it is absent.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path
from types import SimpleNamespace

REFERENCE_ROOT = Path("/root/reference")

_MODULES = [
    "unetbaseline_model",
    "unet_cvae_model",
    "base_residual_model",
    "binaural_attention_model",
    "rgb_depth_model",
    "adabins_distillation_model",
    "coarse_depth_model",
]

_cache = {}


def reference_available() -> bool:
    return (REFERENCE_ROOT / "models" / "unetbaseline_model.py").is_file()


def load_ref_models():
    """Return a namespace of the reference model modules (cached)."""
    if _cache:
        return _cache["ns"]
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [str(REFERENCE_ROOT / "models")]
    sys.modules["refmodels"] = pkg
    ns = SimpleNamespace()
    for name in _MODULES:
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", REFERENCE_ROOT / "models" / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(ns, name, mod)
    _cache["ns"] = ns
    return ns


def load_ref_file(name: str):
    """Load a top-level reference module (e.g. utils_loss) by file (cached)."""
    key = f"file:{name}"
    if key not in _cache:
        spec = importlib.util.spec_from_file_location(
            f"ref_{name}", REFERENCE_ROOT / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_{name}"] = mod
        spec.loader.exec_module(mod)
        _cache[key] = mod
    return _cache[key]


def ref_cfg(depth_norm: bool = True):
    """Minimal cfg stand-in for reference constructors (cfg.dataset.depth_norm)."""
    return SimpleNamespace(dataset=SimpleNamespace(depth_norm=depth_norm))
