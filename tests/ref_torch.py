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
        # sibling imports (e.g. utils_base_residual_loss -> utils_loss)
        # resolve genuinely while the module body executes
        path_added = str(REFERENCE_ROOT) not in sys.path
        if path_added:
            sys.path.insert(0, str(REFERENCE_ROOT))
        try:
            spec.loader.exec_module(mod)
        finally:
            if path_added:
                sys.path.remove(str(REFERENCE_ROOT))
        _cache[key] = mod
    return _cache[key]


class _WandbStub(types.ModuleType):
    """Records wandb.log calls; everything else is a silent no-op. Lets the
    genuine reference DRIVER scripts execute without the wandb dependency
    (they import it unconditionally) while tests read back what they logged."""

    def __init__(self):
        super().__init__("wandb")
        self.logged = []
        self.run = None

    def init(self, *a, **k):
        return SimpleNamespace(name="stub", id="stub", finish=lambda: None)

    def log(self, data=None, step=None, **k):
        self.logged.append((step, dict(data or {})))

    def watch(self, *a, **k):
        pass

    def finish(self, *a, **k):
        pass

    def __getattr__(self, name):  # Image, config, etc.
        if name.startswith("__"):  # keep module introspection honest
            raise AttributeError(name)
        return lambda *a, **k: None


def load_ref_driver(name: str):
    """Load a reference top-level DRIVER script (train.py, train_*.py,
    test.py) as a module, with wandb/tqdm stubbed and /root/reference on
    sys.path so its sibling imports (config_loader, utils_*, models.*,
    dataloader.*) resolve genuinely. Returns (module, wandb_stub). NOT
    cached: each call re-executes the file so module state is fresh."""
    from ref_shims import install_shims

    install_shims()  # torchaudio/torchvision surface for the dataloaders
    stub = _WandbStub()
    sys.modules["wandb"] = stub
    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda it=None, *a, **k: it
        sys.modules["tqdm"] = tq
    path_added = str(REFERENCE_ROOT) not in sys.path
    if path_added:
        sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        spec = importlib.util.spec_from_file_location(
            f"refdriver_{name}", REFERENCE_ROOT / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refdriver_{name}"] = mod
        spec.loader.exec_module(mod)
    finally:
        if path_added:
            sys.path.remove(str(REFERENCE_ROOT))
    return mod, stub


def ref_cfg(depth_norm: bool = True):
    """Minimal cfg stand-in for reference constructors (cfg.dataset.depth_norm)."""
    return SimpleNamespace(dataset=SimpleNamespace(depth_norm=depth_norm))
