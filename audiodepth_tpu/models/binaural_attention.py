"""Binaural cross-attention depth network.

Capability twin of models/binaural_attention_model.py:81-345 in the
reference: the stereo spectrogram is split into L/R channels, each runs
through its own 5-scale encoder, bidirectional cross-channel attention is
applied at the configured levels (default [2,3,4,5]) with SHARED Q/K/V/out
projections and a zero-initialized γ residual gate, per-level features are
fused (concat + 1×1 conv + BN + ReLU), and a UNet decoder over the fused
pyramid emits sigmoid·max_depth.

TPU-native deltas: NHWC layout; the HW×HW attention runs through
ops.attention.blockwise_cross_attention (O(block·N) memory instead of the
reference's full N² materialization); Q/K/V projections are Dense over
[B, N, C] tokens so both contractions hit the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas.flash_attention import cross_attention
from .base_residual import SharedEncoder
from .layers import BatchNorm, UpBilinear, at_least_f32, kaiming_init

# Q/K projection bottleneck divisor (reference reduction=8,
# binaural_attention_model.py:90-98). bench.py derives attention FLOPs
# from this and level_channels() instead of hardcoding the schedule.
ATTENTION_REDUCTION = 8


def level_channels(base_channels: int):
    """Feature channels at encoder levels 1-5 (SharedEncoder widths)."""
    c = base_channels
    return {1: c, 2: c * 2, 3: c * 4, 4: c * 8, 5: c * 8}


class BinauralCrossAttention(nn.Module):
    """Bidirectional cross-channel attention with shared projections.

    sp_axis: optional mesh axis name for sequence parallelism — the query
    (spatial) dimension is sharding-constrained to that axis, so under a
    2-D ('data','model') mesh GSPMD splits each attention across chips by
    query rows (K/V replicated within the axis; no manual collectives).
    This is the one op in the workload with O(N²) work (SURVEY §2.6 TP row).
    """

    channels: int
    reduction: int = ATTENTION_REDUCTION
    block_q: int = 1024
    sp_axis: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left, right) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, c = left.shape
        inner = c // self.reduction
        q_proj = nn.Dense(inner, dtype=self.dtype, kernel_init=kaiming_init())
        k_proj = nn.Dense(inner, dtype=self.dtype, kernel_init=kaiming_init())
        v_proj = nn.Dense(c, dtype=self.dtype, kernel_init=kaiming_init())
        out_proj = nn.Dense(c, dtype=self.dtype, kernel_init=kaiming_init())
        gamma = self.param("gamma", nn.initializers.zeros, (1,))

        lt = left.reshape(b, h * w, c)
        rt = right.reshape(b, h * w, c)
        scale = 1.0 / (c ** 0.5)  # reference scales by sqrt(C_full)

        # Both directions share Q/K/V/out projections, so L→R and R→L stack
        # along batch into ONE attention call — half the kernel launches
        # with identical math.
        both = jnp.concatenate([lt, rt], axis=0)        # queries: [2B, N, C]
        swapped = jnp.concatenate([rt, lt], axis=0)     # keys/values
        q = q_proj(both)
        if self.sp_axis is not None:
            from jax.sharding import PartitionSpec as P

            q = jax.lax.with_sharding_constraint(q, P(None, self.sp_axis, None))
        att = cross_attention(
            q, k_proj(swapped), v_proj(swapped), scale, block_q=self.block_q
        )
        out = out_proj(att)
        left_out = lt + gamma * out[:b]
        right_out = rt + gamma * out[b:]
        return (
            left_out.reshape(b, h, w, c).astype(left.dtype),
            right_out.reshape(b, h, w, c).astype(right.dtype),
        )


class BinauralAttentionNet(nn.Module):
    base_channels: int = 64
    max_depth: float = 30.0
    attention_levels: Sequence[int] = (2, 3, 4, 5)
    output_size: int = 256
    sp_axis: Any = None  # mesh axis for sequence-parallel attention
    # Rematerialize encoders: measured 55x throughput at bs=32-64 on v5e-1
    # (16 GB HBM) because full activations thrash; recompute is far cheaper.
    remat: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        c = self.base_channels
        channel_map = level_channels(c)

        enc_cls = nn.remat(SharedEncoder) if self.remat else SharedEncoder
        left = x[..., 0:1]
        right = x[..., 1:2]
        lf = enc_cls(c, train=train, dtype=self.dtype, name="left_encoder")(left)
        rf = enc_cls(c, train=train, dtype=self.dtype, name="right_encoder")(right)

        fused = {}
        for level in (1, 2, 3, 4, 5):
            lfeat, rfeat = lf[f"x{level}"], rf[f"x{level}"]
            if level in self.attention_levels:
                lfeat, rfeat = BinauralCrossAttention(
                    channels=channel_map[level], dtype=self.dtype,
                    sp_axis=self.sp_axis, name=f"attn_{level}",
                )(lfeat, rfeat)
            y = jnp.concatenate([lfeat, rfeat], axis=-1)
            y = nn.Conv(channel_map[level], (1, 1), dtype=self.dtype,
                        kernel_init=kaiming_init(), name=f"fusion_{level}")(y)
            y = BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name=f"fusion_bn_{level}")(y)
            fused[level] = nn.relu(y)

        h = UpBilinear(c * 4, train=train, dtype=self.dtype)(fused[5], fused[4])
        h = UpBilinear(c * 2, train=train, dtype=self.dtype)(h, fused[3])
        h = UpBilinear(c, train=train, dtype=self.dtype)(h, fused[2])
        h = UpBilinear(c, train=train, dtype=self.dtype)(h, fused[1])
        h = nn.Conv(1, (1, 1), dtype=self.dtype, kernel_init=kaiming_init())(h)
        depth = nn.sigmoid(at_least_f32(h)) * self.max_depth

        if depth.shape[1] != self.output_size:
            depth = jax.image.resize(
                depth,
                (depth.shape[0], self.output_size, self.output_size, 1),
                method="linear",
            )
        return jnp.clip(depth, 0.0, self.max_depth)
