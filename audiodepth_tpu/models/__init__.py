"""Model zoo registry.

Families (mirrors the reference factories, SURVEY §2.3):
  unet_baseline        — pix2pix UNet-256/128 (define_G)
  unet_cvae            — UNet with VAE bottleneck (define_G_cvae)
  base_residual        — shared encoder, base+residual decoders
  binaural_attention   — dual encoders + cross-channel attention
  rgb_depth            — RGB teacher UNet
  adabins_distillation — twin AdaBins nets, RGB→audio distillation
  coarse_depth         — depth-as-classification family
"""

from .unet import UNetGenerator, build_unet
from .layers import count_params

__all__ = ["UNetGenerator", "build_unet", "count_params", "make_task"]


def make_task(cfg, **kwargs):
    """Build the Task for cfg.model.name (registry of family constructors)."""
    from ..train import tasks as t

    name = cfg.model.name
    registry = {
        "unet_baseline": t.UNetBaselineTask,
    }
    try:
        from ..train import tasks_extra  # populated as families land
        registry.update(tasks_extra.REGISTRY)
    except ImportError:
        pass
    if name == "spline_depth":
        # dead config in the reference: conf/model/spline_depth.yaml exists
        # but no model code does (SURVEY §2.1) — registered for parity,
        # intentionally unimplemented
        raise NotImplementedError(
            "spline_depth is aspirational/dead config in the reference "
            "(no model code); pick one of: " + ", ".join(sorted(registry))
        )
    if name not in registry:
        raise NotImplementedError(f"model family {name!r} not registered")
    return registry[name](cfg, **kwargs)
