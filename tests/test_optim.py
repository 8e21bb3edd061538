"""Optimizer + LR schedule factory tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.train.optim import make_optimizer, make_schedule


def mode(**over):
    cfg = load_config("batvisionv2")
    return dataclasses.replace(cfg.mode, **over)


def test_constant_schedule():
    s = make_schedule(mode(), steps_per_epoch=10)
    assert float(s(0)) == 0.002 and float(s(1999)) == 0.002


def test_cosine_anneals_to_one_percent():
    m = mode(lr_schedule="cosine", epochs=10, learning_rate=0.01)
    s = make_schedule(m, steps_per_epoch=10)
    assert float(s(0)) == pytest.approx(0.01)
    assert float(s(100)) == pytest.approx(0.0001, rel=1e-3)


def test_step_schedule_halves_every_50_epochs():
    m = mode(lr_schedule="step", epochs=200, learning_rate=0.002)
    s = make_schedule(m, steps_per_epoch=1)
    assert float(s(49)) == pytest.approx(0.002)
    assert float(s(51)) == pytest.approx(0.001)
    assert float(s(101)) == pytest.approx(0.0005)


def test_warm_restarts_periods_double():
    m = mode(lr_schedule="warm_restarts", epochs=200, learning_rate=0.002)
    s = make_schedule(m, steps_per_epoch=1)
    # T_0 = 20 epochs: lr dips toward 0 near step 19, restarts at 20
    assert float(s(0)) == pytest.approx(0.002, rel=1e-3)
    assert float(s(19)) < 0.0005
    assert float(s(21)) > 0.0015  # restarted
    # second period is 40 epochs: low again near 59
    assert float(s(59)) < 0.0005


@pytest.mark.parametrize("name", ["Adam", "AdamW", "SGD"])
def test_optimizers_step(name):
    tx = make_optimizer(mode(optimizer=name), steps_per_epoch=1)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    grads = {"w": jnp.full((4,), 100.0)}  # large: exercises clip(1.0)
    updates, _ = tx.update(grads, state, params)
    # global-norm clip bounds the effective gradient
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError):
        make_optimizer(mode(optimizer="rmsprop"))
    with pytest.raises(ValueError):
        make_schedule(mode(lr_schedule="nope"), 1)


def test_grad_clip_norm_applied():
    tx = make_optimizer(mode(optimizer="SGD", lr_schedule="constant"), 1)
    params = {"w": jnp.zeros((3,))}
    state = tx.init(params)
    grads = {"w": jnp.asarray([300.0, 400.0, 0.0])}  # norm 500 -> clip to 1
    updates, _ = tx.update(grads, state, params)
    # sgd(momentum) first step update = -lr * clipped_grad * 1 (momentum warmup)
    clipped = np.asarray(updates["w"]) / -0.002
    np.testing.assert_allclose(np.linalg.norm(clipped), 1.0, rtol=1e-4)


# --- exact-value schedule parity vs the genuine torch schedulers -----------
# The reference steps its scheduler once per epoch (train_binaural_attention
# .py:313-347, train_adabins_distillation.py:389-391, train_coarse_depth
# .py:363-365); with steps_per_epoch=1 our per-step schedules must reproduce
# torch's lr sequence over the whole 200-epoch horizon.  Observed agreement
# is ~3e-10 (f32 schedule arithmetic); asserted at 1e-9 absolute.

torch = pytest.importorskip("torch")


def _torch_lr_sequence(make_sched, epochs, lr):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr)
    sch = make_sched(opt)
    out = []
    for _ in range(epochs):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sch.step()
    return np.asarray(out)


@pytest.mark.parametrize(
    "kind,make_sched",
    [
        ("cosine",
         lambda opt: torch.optim.lr_scheduler.CosineAnnealingLR(
             opt, T_max=200, eta_min=0.01 * 0.002)),
        ("step",
         lambda opt: torch.optim.lr_scheduler.StepLR(
             opt, step_size=50, gamma=0.5)),
        ("warm_restarts",
         lambda opt: torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
             opt, T_0=20, T_mult=2, eta_min=1e-6)),
    ],
)
def test_schedule_matches_torch_exactly(kind, make_sched):
    epochs, lr = 200, 0.002
    ours = np.asarray(
        [float(make_schedule(mode(lr_schedule=kind, epochs=epochs,
                                  learning_rate=lr), 1)(e))
         for e in range(epochs)])
    theirs = _torch_lr_sequence(make_sched, epochs, lr)
    np.testing.assert_allclose(ours, theirs, atol=1e-9, rtol=0)
