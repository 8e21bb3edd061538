"""Optimizer + LR-schedule factory (optax).

Mirrors the reference driver settings: Adam/AdamW/SGD selection
(train.py:471-476), global-norm gradient clipping at 1.0 used by every
trainer (train.py:689 etc.), AdamW weight_decay=0.01 — torch's default,
which every reference AdamW path inherits or sets explicitly
(train.py:474, train_binaural_attention.py:321-326) — cosine annealing to
1% of lr (train_adabins_distillation.py:389-391), and
CosineAnnealingWarmRestarts (T_0=20, T_mult=2) for the coarse family
(train_coarse_depth.py:363-365).

The full update rule (clip → AdamW with decoupled decay → schedule) is
pinned against torch by the K-step trajectory-parity test
(tests/test_trajectory_parity.py): transplanted weights stepped K times by
both frameworks in float64 agree leaf-for-leaf. The one known seam is
torch's clip_grad_norm_ epsilon (scale = max_norm/(total+1e-6) vs optax's
max_norm/total), a ~1e-6 relative difference on clipped steps only.
"""

from __future__ import annotations

import optax

from ..configs import ModeConfig


def make_schedule(mode: ModeConfig, steps_per_epoch: int) -> optax.Schedule:
    lr = mode.learning_rate
    kind = (mode.lr_schedule or "constant").lower()
    total = max(1, mode.epochs * steps_per_epoch)
    if kind == "constant":
        return optax.constant_schedule(lr)
    if kind == "cosine":
        # anneal to 1% of peak (CosineAnnealingLR with eta_min=0.01*lr)
        return optax.cosine_decay_schedule(lr, total, alpha=0.01)
    if kind == "step":
        # StepLR(step_size=50 epochs, gamma=0.5)
        boundaries = {
            i * 50 * steps_per_epoch: 0.5 for i in range(1, mode.epochs // 50 + 1)
        }
        return optax.piecewise_constant_schedule(lr, boundaries)
    if kind == "warm_restarts":
        # CosineAnnealingWarmRestarts(T_0=20 epochs, T_mult=2, eta_min=1e-6)
        # — the coarse driver's exact settings (train_coarse_depth.py:363-365)
        periods = []
        t = 20 * steps_per_epoch
        covered = 0
        while covered < total:
            periods.append(t)
            covered += t
            t *= 2
        return optax.sgdr_schedule(
            [dict(init_value=lr, peak_value=lr, decay_steps=p,
                  warmup_steps=0, end_value=1e-6)
             for p in periods]
        )
    raise ValueError(f"unknown lr_schedule {kind!r}")


def make_optimizer(mode: ModeConfig, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    sched = make_schedule(mode, steps_per_epoch)
    name = mode.optimizer.lower()
    if name == "adam":
        opt = optax.adam(sched)
    elif name == "adamw":
        opt = optax.adamw(sched, weight_decay=mode.weight_decay)
    elif name == "sgd":
        opt = optax.sgd(sched, momentum=mode.sgd_momentum or None)
    else:
        raise ValueError(f"unknown optimizer {mode.optimizer!r}")
    # grad_clip_norm <= 0 disables clipping. Reference nuance: train.py /
    # cvae / base_residual / adabins / coarse all clip at 1.0, but the
    # rgb_depth and binaural_attention drivers do NOT clip at all — our
    # default keeps 1.0 for every family as a stability choice (documented
    # deviation); set mode.grad_clip_norm=0 to reproduce those two drivers
    # bit-for-bit (tests/test_trajectory_parity.py rgb_depth does).
    if mode.grad_clip_norm and mode.grad_clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(mode.grad_clip_norm), opt)
    return opt
