"""Feature-shape contract checks (verify_feature_compatibility twin).

The reference ships a standalone script asserting that the RGB teacher's
encoder features x1–x5 match the binaural student's fused pyramid shapes and
that both emit the same depth shape (verify_feature_compatibility.py:75-235),
returning a process exit code. Here the same contract is a callable (used by
tests/test_tools.py) and a CLI.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp


def verify_compatibility(base_channels: int = 8, size: int = 64, verbose: bool = True) -> bool:
    from ..models.binaural_attention import BinauralAttentionNet
    from ..models.rgb_depth import RGBDepthNet
    from ..models.base_residual import SharedEncoder

    ok = True
    rng = jax.random.PRNGKey(0)

    rgb = RGBDepthNet(base_channels=base_channels, output_size=size, dtype=jnp.float32)
    rgb_vars = rgb.init(rng, jnp.zeros((1, size, size, 3)), train=False)
    rgb_depth, rgb_feats = rgb.apply(
        rgb_vars, jnp.zeros((1, size, size, 3)), train=False, return_features=True
    )

    # student fused pyramid = SharedEncoder widths (attention/fusion keep C)
    enc = SharedEncoder(base_channels, train=False, dtype=jnp.float32)
    enc_vars = enc.init(rng, jnp.zeros((1, size, size, 1)))
    student_feats = enc.apply(enc_vars, jnp.zeros((1, size, size, 1)))

    for level in ("x1", "x2", "x3", "x4", "x5"):
        a, b = rgb_feats[level].shape, student_feats[level].shape
        match = a == b
        ok &= match
        if verbose:
            print(f"  {level}: teacher {a} vs student {b} {'OK' if match else 'MISMATCH'}")

    net = BinauralAttentionNet(base_channels=base_channels, output_size=size,
                               attention_levels=(4, 5), dtype=jnp.float32)
    net_vars = net.init(rng, jnp.zeros((1, size, size, 2)), train=False)
    student_depth = net.apply(net_vars, jnp.zeros((1, size, size, 2)), train=False)
    match = student_depth.shape == rgb_depth.shape
    ok &= match
    if verbose:
        print(f"  depth: teacher {rgb_depth.shape} vs student {student_depth.shape} "
              f"{'OK' if match else 'MISMATCH'}")
        print("distillation readiness:", "READY" if ok else "NOT READY")
    return bool(ok)


def main(argv=None):
    ok = verify_compatibility()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
