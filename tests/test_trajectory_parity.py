"""K-step TRAINING-TRAJECTORY parity against the genuine reference, in f64.

The last link in the executable-parity chain: forward (test_torch_interop),
loss+gradients (test_grad_parity), and now the OPTIMIZER UPDATE.  Both
frameworks start from the identical transplanted weights and take K full
production training steps — forward in train-mode BN, the reference
Combined criterion in meters (train.py:646-669), clip_grad_norm(1.0)
(train.py:689), AdamW with torch's default weight_decay=0.01
(train.py:474), and the LR schedule — on the same K batches.  Every
parameter must then agree leaf-for-leaf, which pins betas, eps placement,
bias correction indexing, decoupled weight-decay coupling, schedule
stepping cadence, and the clip threshold all at once.

Tolerance regime: when no step clips (torch total_norm <= 1), the two
update rules are mathematically identical and we assert 1e-8 relative (f64
noise is ~1e-13).  When a step clips, torch scales gradients by
max_norm/(total+1e-6) where optax uses max_norm/total — a known ~1e-6
relative seam documented in train/optim.py — so the tolerance widens to
2e-6, still far below anything a real wiring bug (wrong beta, missing
bias correction, coupled decay) produces within K steps (>=1e-3).

BatchNorm running stats are compared too: running_mean exactly, and
running_var through the Bessel identity — torch folds the unbiased
n/(n-1) batch variance into the running buffer (torch BatchNorm2d docs)
while flax folds the biased one, so
(torch_var - decay^K * v0) == (flax_var - decay^K * v0) * n/(n-1)
holds exactly and is asserted at f64 tolerance.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.tools import import_torch as it
from audiodepth_tpu.train.optim import make_optimizer

from ref_torch import load_ref_models, ref_cfg, reference_available
from test_grad_parity import (  # noqa: F401  (f64 is a fixture)
    _depth_target,
    _flax_combined,
    _nhwc,
    _rand,
    _torch_combined,
    f64,
)

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)

MAX_DEPTH = 30.0
K_STEPS = 4
LR = 1e-3
BN_DECAY = 0.9  # flax momentum 0.9 == torch momentum 0.1


def _flatten(tree):
    from flax.traverse_util import flatten_dict

    return flatten_dict(tree)


def _assert_trees_match(torch_tree, jax_tree, tol, what):
    want = _flatten(jax_tree)
    got = _flatten(torch_tree)
    assert set(want) == set(got)
    worst, worst_key = 0.0, None
    for k in want:
        a = np.asarray(want[k], np.float64)
        b = np.asarray(got[k], np.float64)
        scale = max(float(np.abs(b).max()), 1e-12)
        rel = float(np.abs(a - b).max()) / scale
        if rel > worst:
            worst, worst_key = rel, k
    assert worst < tol, f"worst {what} mismatch {worst:.2e} at {worst_key}"


@pytest.mark.parametrize("schedule", ["constant", "cosine"])
def test_unet_adamw_trajectory_parity(f64, schedule):
    """UNet (5 downs, ngf=8, 32x32): K production AdamW steps match torch."""
    ref = load_ref_models().unetbaseline_model
    tm = ref.UnetGenerator(
        ref_cfg(depth_norm=True), 2, 1, 5, 8,
        norm_layer=functools.partial(
            torch.nn.BatchNorm2d, affine=True, track_running_stats=True),
    ).double()
    ref.init_weights(tm, "normal", 0.02)
    sd0 = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    from audiodepth_tpu.models.unet import UNetGenerator

    fm = UNetGenerator(input_nc=2, output_nc=1, num_downs=5, ngf=8,
                       depth_norm=True, dtype=jnp.float64)
    variables = it.import_unet(sd0, num_downs=5)
    params, stats0 = variables["params"], variables["batch_stats"]
    stats = stats0

    # --- production optimizers on both sides -----------------------------
    mode = dataclasses.replace(
        load_config("batvisionv2").mode,
        optimizer="AdamW", learning_rate=LR, weight_decay=0.01,
        grad_clip_norm=1.0, lr_schedule=schedule, epochs=K_STEPS,
    )
    tx = make_optimizer(mode, steps_per_epoch=1)
    opt_state = tx.init(params)

    topt = torch.optim.AdamW(tm.parameters(), lr=LR)  # torch default wd=0.01
    tsched = None
    if schedule == "cosine":
        tsched = torch.optim.lr_scheduler.CosineAnnealingLR(
            topt, T_max=K_STEPS, eta_min=0.01 * LR)

    def flax_loss(p, st, xj, gj):
        out, upd = fm.apply({"params": p, "batch_stats": st}, xj,
                            train=True, mutable=["batch_stats"])
        return (
            _flax_combined(out * MAX_DEPTH, gj * MAX_DEPTH),
            upd["batch_stats"],
        )

    grad_fn = jax.jit(jax.value_and_grad(flax_loss, has_aux=True))

    clipped_any = False
    tm.train()
    for step in range(K_STEPS):
        x = _rand(2, 2, 32, 32, seed=100 + step)
        gt = _depth_target((2, 1, 32, 32), seed=200 + step, lo=0.02, hi=1.0)

        # torch production step (train.py:639-691)
        topt.zero_grad()
        pred = tm(torch.from_numpy(x))
        loss_t = _torch_combined(pred * MAX_DEPTH,
                                 torch.from_numpy(gt) * MAX_DEPTH)
        loss_t.backward()
        total = float(torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0))
        clipped_any |= total > 1.0
        topt.step()
        if tsched is not None:
            tsched.step()

        # flax production step
        lt = float(loss_t.detach())
        (loss_f, stats), grads = grad_fn(params, stats, _nhwc(x), _nhwc(gt))
        assert abs(float(loss_f) - lt) < 1e-10 * max(1.0, abs(lt))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    tol = 2e-6 if clipped_any else 1e-8
    tvars = it.import_unet(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()},
        num_downs=5)
    _assert_trees_match(tvars["params"], params, tol, "param")

    # --- BatchNorm running stats ------------------------------------------
    tstats, fstats = _flatten(tvars["batch_stats"]), _flatten(stats)
    init = _flatten(stats0)
    decay_k = BN_DECAY ** K_STEPS
    # Each BN reduces over n = B*H_layer*W_layer elements; H varies by level,
    # so infer the layer's Bessel factor from the identity and pin it to one
    # of the admissible n values (batch 2, spatial 1..16 at these shapes).
    admissible = np.array(
        [2 * s * s / (2 * s * s - 1.0) for s in (1, 2, 4, 8, 16)])
    for k in fstats:
        t = np.asarray(tstats[k], np.float64)
        f = np.asarray(fstats[k], np.float64)
        v0 = np.asarray(init[k], np.float64)
        if k[-1] == "mean":
            np.testing.assert_allclose(f, t, rtol=1e-9, atol=1e-12)
            continue
        # var: torch folds the UNBIASED batch var into the buffer, flax the
        # biased one; the accumulated deltas differ by exactly n/(n-1).
        num, den = t - decay_k * v0, f - decay_k * v0
        m = np.abs(den) > 1e-9
        assert m.any(), f"degenerate var delta at {k}"
        r = num[m] / den[m]
        assert float(r.max() - r.min()) < 1e-6 * float(
            np.abs(r).max()), f"non-constant Bessel ratio at {k}"
        assert np.min(np.abs(admissible - np.median(r))) < 1e-9, (
            f"Bessel ratio {np.median(r)} not an admissible n/(n-1) at {k}")


@pytest.mark.parametrize(
    "optimizer,momentum",
    [("Adam", None), ("SGD", 0.0), ("SGD", 0.9)],
    ids=["adam", "sgd", "sgd-momentum0.9"],
)
def test_unet_other_optimizer_trajectory_parity(f64, optimizer, momentum):
    """Adam (train.py:472) and SGD with the split momentum convention.

    The reference drivers disagree on SGD momentum: train.py:476 /
    train_cvae / train_base_residual use torch's default 0.0 while
    binaural/rgb/adabins/coarse pass momentum=0.9 — hence the
    `sgd_momentum` config field. Both conventions (and torch's Adam with
    its default weight_decay=0) must reproduce the torch trajectory
    leaf-for-leaf.
    """
    ref = load_ref_models().unetbaseline_model
    tm = ref.UnetGenerator(
        ref_cfg(depth_norm=True), 2, 1, 5, 8,
        norm_layer=functools.partial(
            torch.nn.BatchNorm2d, affine=True, track_running_stats=True),
    ).double()
    ref.init_weights(tm, "normal", 0.02)
    sd0 = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    from audiodepth_tpu.models.unet import UNetGenerator

    fm = UNetGenerator(input_nc=2, output_nc=1, num_downs=5, ngf=8,
                       depth_norm=True, dtype=jnp.float64)
    variables = it.import_unet(sd0, num_downs=5)
    params, stats = variables["params"], variables["batch_stats"]

    mode = dataclasses.replace(
        load_config("batvisionv2").mode,
        optimizer=optimizer, learning_rate=LR, grad_clip_norm=1.0,
        lr_schedule="constant", epochs=K_STEPS,
        sgd_momentum=(momentum if momentum is not None else 0.9),
    )
    tx = make_optimizer(mode, steps_per_epoch=1)
    opt_state = tx.init(params)

    if optimizer == "Adam":
        topt = torch.optim.Adam(tm.parameters(), lr=LR)
    else:
        topt = torch.optim.SGD(tm.parameters(), lr=LR, momentum=momentum)

    def flax_loss(p, st, xj, gj):
        out, upd = fm.apply({"params": p, "batch_stats": st}, xj,
                            train=True, mutable=["batch_stats"])
        return (
            _flax_combined(out * MAX_DEPTH, gj * MAX_DEPTH),
            upd["batch_stats"],
        )

    grad_fn = jax.jit(jax.value_and_grad(flax_loss, has_aux=True))

    clipped_any = False
    tm.train()
    for step in range(K_STEPS):
        x = _rand(2, 2, 32, 32, seed=300 + step)
        gt = _depth_target((2, 1, 32, 32), seed=400 + step, lo=0.02, hi=1.0)

        topt.zero_grad()
        pred = tm(torch.from_numpy(x))
        loss_t = _torch_combined(pred * MAX_DEPTH,
                                 torch.from_numpy(gt) * MAX_DEPTH)
        loss_t.backward()
        total = float(torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0))
        clipped_any |= total > 1.0
        topt.step()

        (loss_f, stats), grads = grad_fn(params, stats, _nhwc(x), _nhwc(gt))
        assert abs(float(loss_f) - float(loss_t.detach())) < 1e-10 * max(
            1.0, abs(float(loss_t.detach())))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    tol = 2e-6 if clipped_any else 1e-8
    tvars = it.import_unet(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()},
        num_downs=5)
    _assert_trees_match(tvars["params"], params, tol, f"{optimizer} param")
