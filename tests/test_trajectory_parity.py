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

BatchNorm running stats are compared DIRECTLY: models/layers.py's
_TorchExactBatchNorm folds the same unbiased n/(n-1) batch variance into
the running buffer that torch.nn.BatchNorm2d does (round 5 — flax's
nn.BatchNorm folds the biased one, a 1/n running-var skew these tests
used to carry as a verified "Bessel identity" and the driver A/B
measured in eval-mode forwards), so mean AND var are asserted equal at
f64 tolerance.
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
    _warm_bn,
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
    """Leaf-for-leaf, relative to each leaf's own scale FLOORED at 1e-3 of
    the global max |param| (the same convention as _assert_grads_match):
    near-zero-scale leaves (BN biases drifting around ~1e-4 after a few
    steps) accumulate ~1e-9 absolute f64 round-off through Adam's
    normalization, which a pure per-leaf relative comparison would amplify
    into spurious 1e-5 "mismatches"; any real wiring bug moves leaves at
    the global scale and still fails loudly."""
    want = _flatten(jax_tree)
    got = _flatten(torch_tree)
    assert set(want) == set(got)
    gmax = max(float(np.abs(np.asarray(b)).max()) for b in got.values())
    worst, worst_key = 0.0, None
    for k in want:
        a = np.asarray(want[k], np.float64)
        b = np.asarray(got[k], np.float64)
        abs_err = float(np.abs(a - b).max())
        if abs_err <= 1e-10:
            continue
        rel = abs_err / max(float(np.abs(b).max()), 1e-3 * gmax, 1e-12)
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
    # _TorchExactBatchNorm folds torch's unbiased batch var, so mean AND
    # var match directly (module docstring)
    tstats, fstats = _flatten(tvars["batch_stats"]), _flatten(stats)
    for k in fstats:
        np.testing.assert_allclose(
            np.asarray(fstats[k], np.float64),
            np.asarray(tstats[k], np.float64),
            rtol=1e-9, atol=1e-12, err_msg=str(k))


def _step_torch(tm, topt, loss_t, tsched=None):
    loss_t.backward()
    total = float(torch.nn.utils.clip_grad_norm_(
        [p for p in tm.parameters() if p.requires_grad], 1.0))
    topt.step()
    topt.zero_grad()
    if tsched is not None:
        tsched.step()
    return total > 1.0


def _bessel_check_stats(torch_stats, flax_stats, init_stats, decay_k,
                        spatial_sizes, batch=2):
    """BN running stats: mean AND var compared directly —
    _TorchExactBatchNorm matches torch's unbiased running-var fold
    (module docstring; the name survives from the pre-round-5 Bessel-
    identity era so call sites read unchanged). K-step trajectories
    accumulate ~1e-13/step param drift into the activations the stats
    average — looser than the unet's single-model bound but far below
    any momentum/decay/Bessel bug."""
    tstats, fstats = _flatten(torch_stats), _flatten(flax_stats)
    for k in fstats:
        np.testing.assert_allclose(
            np.asarray(fstats[k], np.float64),
            np.asarray(tstats[k], np.float64),
            rtol=1e-6, atol=1e-9, err_msg=str(k))


def test_binaural_trajectory_parity_with_remat(f64):
    """Binaural attention: K production AdamW steps with the flax model
    REMATERIALIZING its shared encoder (the production default — remat=True,
    models/binaural_attention.py:101). Pins that remat neither perturbs the
    gradient field nor double-folds BatchNorm running stats across steps
    (reference twin: train_binaural_attention.py's AdamW loop)."""
    ref = load_ref_models().binaural_attention_model
    tm = ref.BinauralAttentionDepthNet(base_channels=16, bilinear=True,
                                       output_size=32, max_depth=MAX_DEPTH,
                                       attention_levels=[2, 3, 4, 5]).double()
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "gamma" in name:
                p.fill_(0.7)
    sd0 = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    from audiodepth_tpu.models.binaural_attention import BinauralAttentionNet

    fm = BinauralAttentionNet(base_channels=16, max_depth=MAX_DEPTH,
                              attention_levels=(2, 3, 4, 5), output_size=32,
                              remat=True, dtype=jnp.float64)
    variables = it.import_binaural(sd0)
    params, stats = variables["params"], variables["batch_stats"]
    stats0 = stats

    mode = dataclasses.replace(
        load_config("batvisionv2").mode,
        optimizer="AdamW", learning_rate=LR, weight_decay=0.01,
        grad_clip_norm=1.0, lr_schedule="constant", epochs=K_STEPS,
    )
    tx = make_optimizer(mode, steps_per_epoch=1)
    opt_state = tx.init(params)
    topt = torch.optim.AdamW(tm.parameters(), lr=LR)

    def flax_loss(p, st, xj, gj):
        out, upd = fm.apply({"params": p, "batch_stats": st}, xj,
                            train=True, mutable=["batch_stats"])
        return _flax_combined(out, gj), upd["batch_stats"]

    grad_fn = jax.jit(jax.value_and_grad(flax_loss, has_aux=True))

    clipped_any = False
    tm.train()
    for step in range(K_STEPS):
        x = _rand(2, 2, 32, 32, seed=500 + step)
        gt = _depth_target((2, 1, 32, 32), seed=600 + step,
                           lo=0.5, hi=MAX_DEPTH)
        pred = tm(torch.from_numpy(x))
        loss_t = _torch_combined(pred, torch.from_numpy(gt))
        clipped_any |= _step_torch(tm, topt, loss_t)

        (loss_f, stats), grads = grad_fn(params, stats, _nhwc(x), _nhwc(gt))
        assert abs(float(loss_f) - float(loss_t.detach())) < 1e-8 * max(
            1.0, abs(float(loss_t.detach())))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    tol = 2e-6 if clipped_any else 1e-8
    tvars = it.import_binaural(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()})
    _assert_trees_match(tvars["params"], params, tol, "binaural param")
    _bessel_check_stats(tvars["batch_stats"], stats, stats0,
                        BN_DECAY ** K_STEPS,
                        spatial_sizes=(1, 2, 4, 8, 16, 32))


def test_adabins_frozen_teacher_trajectory_parity(f64):
    """AdaBins distillation: K AdamW steps with the RGB teacher frozen.

    The reference freezes by requires_grad=False + a filtered optimizer
    (model.freeze_rgb(), train_adabins_distillation.py:338-387); this
    framework zeroes the teacher subtree's updates inside the engine
    (engine.py:82-87). K steps prove the two mechanisms keep the teacher
    BIT-IDENTICAL (no decay, no momentum leakage) while the student
    trajectory matches leaf-for-leaf. Eval-mode BN on both sides (the bin
    predictor's dropout would inject framework-specific randomness)."""
    ref = load_ref_models().adabins_distillation_model
    tm = ref.AdaBinsDistillationModel(n_bins=16, base_channels=64,
                                      output_size=32,
                                      max_depth=MAX_DEPTH).double()
    audio_w = _rand(2, 2, 32, 32, seed=700)
    rgb_w = _rand(2, 3, 32, 32, seed=701)
    tm.train()
    with torch.no_grad():
        for _ in range(2):
            tm.forward_audio(torch.from_numpy(audio_w))
            tm.forward_rgb(torch.from_numpy(rgb_w))
    tm.eval()
    tm.freeze_rgb()
    sd0 = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    from audiodepth_tpu.losses.distillation import distillation_loss
    from audiodepth_tpu.models.adabins import AdaBinsDistillationModel

    fm = AdaBinsDistillationModel(n_bins=16, base_channels=64,
                                  output_size=32, max_depth=MAX_DEPTH,
                                  dtype=jnp.float64)
    variables = it.import_adabins(sd0)
    params, stats = variables["params"], variables["batch_stats"]
    rgb0 = jax.tree_util.tree_map(np.asarray, params["rgb"])

    mode = dataclasses.replace(
        load_config("batvisionv2").mode,
        optimizer="AdamW", learning_rate=LR, weight_decay=0.01,
        grad_clip_norm=1.0, lr_schedule="constant", epochs=K_STEPS,
    )
    tx = make_optimizer(mode, steps_per_epoch=1)
    opt_state = tx.init(params)
    # the reference's filtered optimizer (train_adabins_distillation.py:376)
    topt = torch.optim.AdamW(
        [p for p in tm.parameters() if p.requires_grad], lr=LR,
        weight_decay=0.01)

    crit_kw = dict(lambda_task=2.0, lambda_response=0.3, lambda_feature=0.2,
                   lambda_bin=0.05, lambda_sparse=0.1, temperature=4.0)
    from ref_torch import load_ref_file

    crit = load_ref_file("utils_distillation_loss").DistillationLoss(**crit_kw)

    def flax_loss(p, st, aj, rj, gj):
        out = fm.apply({"params": p, "batch_stats": st}, aj, rj,
                       train=False, mode="train")
        total, _ = distillation_loss(out, gj, gj > 0, **crit_kw)
        return total

    grad_fn = jax.jit(jax.value_and_grad(flax_loss))

    clipped_any = False
    for step in range(K_STEPS):
        audio = _rand(2, 2, 32, 32, seed=710 + step)
        rgb_x = _rand(2, 3, 32, 32, seed=720 + step)
        gt = _depth_target((2, 1, 32, 32), seed=730 + step,
                           lo=0.5, hi=MAX_DEPTH)
        tout = tm(torch.from_numpy(audio), rgb=torch.from_numpy(rgb_x),
                  mode="train")
        gt_t = torch.from_numpy(gt)
        loss_t, _ = crit(tout, gt_t, valid_mask=gt_t > 0)
        clipped_any |= _step_torch(tm, topt, loss_t)

        loss_f, grads = grad_fn(params, stats, _nhwc(audio), _nhwc(rgb_x),
                                _nhwc(gt))
        assert abs(float(loss_f) - float(loss_t.detach())) < 1e-8 * max(
            1.0, abs(float(loss_t.detach())))
        updates, opt_state = tx.update(grads, opt_state, params)
        # engine.py:82-87 frozen-subtree masking
        updates = dict(updates)
        updates["rgb"] = jax.tree_util.tree_map(jnp.zeros_like, updates["rgb"])
        params = optax.apply_updates(params, updates)

    # teacher bit-identical on both sides
    tvars = it.import_adabins(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()})
    for k, v in _flatten(params["rgb"]).items():
        np.testing.assert_array_equal(np.asarray(v), _flatten(rgb0)[k],
                                      err_msg=f"flax teacher moved at {k}")
    for k, v in _flatten(tvars["params"]["rgb"]).items():
        np.testing.assert_array_equal(
            np.asarray(v), _flatten(it.import_adabins(sd0)["params"]["rgb"])[k],
            err_msg=f"torch teacher moved at {k}")
    # student trajectory leaf-for-leaf
    tol = 2e-6 if clipped_any else 1e-8
    _assert_trees_match(tvars["params"], params, tol, "adabins param")


def test_coarse_warm_restart_trajectory_parity(f64):
    """Coarse family: Adam + CosineAnnealingWarmRestarts(T_0=20, T_mult=2,
    eta_min=1e-6) stepping across a restart boundary (21 steps at 1
    step/epoch), the exact scheduler of train_coarse_depth.py:363-365.
    Pins the restart indexing (lr back to peak at epoch 20) through the
    full optimizer trajectory, not just the lr sequence (test_optim)."""
    ref = load_ref_models().coarse_depth_model

    from audiodepth_tpu.models import coarse_depth as cd

    k_steps = 21
    centers = np.linspace(0.5, 29.5, 8)
    tm = ref.CoarseDepthUNet(n_bins=8, input_channels=2, base_channels=16,
                             output_size=32).double()
    tm.set_bin_centers(torch.from_numpy(centers))
    x0 = _rand(2, 2, 32, 32, seed=800)
    _warm_bn(tm, torch.from_numpy(x0))
    sd0 = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    fm = cd.CoarseDepthUNet(n_bins=8, input_channels=2, base_channels=16,
                            output_size=32, dtype=jnp.float64)
    variables = it.import_coarse_unet(sd0)
    params, stats = variables["params"], variables["batch_stats"]

    mode = dataclasses.replace(
        load_config("batvisionv2").mode,
        optimizer="Adam", learning_rate=LR, grad_clip_norm=1.0,
        lr_schedule="warm_restarts", epochs=k_steps,
    )
    tx = make_optimizer(mode, steps_per_epoch=1)
    opt_state = tx.init(params)
    topt = torch.optim.Adam(tm.parameters(), lr=LR)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        topt, T_0=20, T_mult=2, eta_min=1e-6)

    fc = jnp.asarray(centers)

    def flax_loss(p, st, xj, gj):
        outs, upd = fm.apply({"params": p, "batch_stats": st}, xj, fc,
                             train=True, mutable=["batch_stats"])
        final = outs[-1] if isinstance(outs, (tuple, list)) else outs
        return _flax_combined(final, gj), upd["batch_stats"]

    grad_fn = jax.jit(jax.value_and_grad(flax_loss, has_aux=True))

    clipped_any = False
    tm.train()
    for step in range(k_steps):
        x = _rand(2, 2, 32, 32, seed=810 + step)
        gt = _depth_target((2, 1, 32, 32), seed=840 + step,
                           lo=0.5, hi=MAX_DEPTH)
        touts = tm(torch.from_numpy(x))
        loss_t = _torch_combined(touts[-1], torch.from_numpy(gt))
        clipped_any |= _step_torch(tm, topt, loss_t, tsched)

        (loss_f, stats), grads = grad_fn(params, stats, _nhwc(x), _nhwc(gt))
        # 21 steps compound the clip-epsilon seam into the loss too
        assert abs(float(loss_f) - float(loss_t.detach())) < 1e-6 * max(
            1.0, abs(float(loss_t.detach())))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    # the clip-epsilon seam (~1e-6 relative per clipped step, see module
    # docstring) compounds over 21 steps — widen accordingly, still two
    # orders below wiring-bug scale
    tol = 1e-5 if clipped_any else 1e-8
    tvars = it.import_coarse_unet(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()})
    _assert_trees_match(tvars["params"], params, tol, "coarse param")


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
        assert abs(float(loss_f) - float(loss_t.detach())) < 1e-8 * max(
            1.0, abs(float(loss_t.detach())))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    tol = 2e-6 if clipped_any else 1e-8
    tvars = it.import_unet(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()},
        num_downs=5)
    _assert_trees_match(tvars["params"], params, tol, f"{optimizer} param")


def test_cvae_kl_trajectory_parity(f64, monkeypatch):
    """unet_cvae: K production AdamW+clip steps of the driver objective
    loss = Combined(masked, denormalized) + kl_weight·KL
    (train_cvae.py:444-473), deterministic posterior mean on both sides
    (eps = 0), compared by PER-STEP RESYNCHRONIZATION: each epoch the flax
    side restarts from torch's current weights, both take ONE production
    step, and the results must agree leaf-for-leaf at 1e-7.

    Why resync instead of the free-running comparison the other families
    use: the cVAE bottleneck BatchNorms normalize n = batch·1·1 = 2
    elements, whose 1/sigma curvature amplifies f64 round-off (and the
    known 1e-6 clip-epsilon seam) exponentially along a free trajectory —
    measured ~100x/step, i.e. 1e-13 noise reaches 1e-7 within 3 steps and
    any fixed tolerance becomes init-dependent. Per-step comparison is the
    standard way to verify an integrator against a chaotic system: the
    truncation error cannot compound, while every per-epoch quantity that
    matters — the KL assembly, the DataParallel gather reduction, the clip
    coefficient, Adam's bias-correction indexing at every step k, and the
    BN running-stat fold — is still pinned at every epoch. The optimizer
    STATE (m, v) is free-running (never resynced), so a wrong beta/eps
    still compounds and fails."""
    ref = load_ref_models().unet_cvae_model
    base = load_ref_models().unetbaseline_model
    torch.manual_seed(1234)  # reproducible init (and sd0 transplant)
    tm = ref.UnetGeneratorVAE(ref_cfg(depth_norm=True), 2, 1, 5, 8,
                              norm_layer=functools.partial(
                                  torch.nn.BatchNorm2d, affine=True,
                                  track_running_stats=True),
                              latent_dim=16).double()
    base.init_weights(tm, "normal", 0.02)
    sd0 = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))

    from audiodepth_tpu.models.unet_cvae import UNetCVAE

    fm = UNetCVAE(input_nc=2, output_nc=1, num_downs=5, ngf=8,
                  depth_norm=True, latent_dim=16, dtype=jnp.float64)

    def transplant(module):
        return it.import_unet_cvae(
            {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()},
            num_downs=5)

    variables = transplant(tm)
    stats = variables["batch_stats"]     # free-running (never resynced)
    stats0 = stats

    KL_W = 0.1
    mode = dataclasses.replace(
        load_config("batvisionv2").mode,
        optimizer="AdamW", learning_rate=LR, weight_decay=0.01,
        grad_clip_norm=1.0, lr_schedule="constant", epochs=K_STEPS,
    )
    tx = make_optimizer(mode, steps_per_epoch=1)
    opt_state = tx.init(variables["params"])  # free-running m/v
    topt = torch.optim.AdamW(tm.parameters(), lr=LR)

    def flax_loss(p, st, xj, gj):
        (out, kl), upd = fm.apply({"params": p, "batch_stats": st}, xj,
                                  train=True, sample=False,
                                  mutable=["batch_stats"])
        loss = _flax_combined(out * MAX_DEPTH, gj * MAX_DEPTH) + KL_W * kl
        return loss, upd["batch_stats"]

    grad_fn = jax.jit(jax.value_and_grad(flax_loss, has_aux=True))

    tm.train()
    for step in range(K_STEPS):
        x = _rand(2, 2, 32, 32, seed=900 + step)
        gt = _depth_target((2, 1, 32, 32), seed=930 + step, lo=0.02, hi=1.0)

        params = transplant(tm)["params"]  # resync to torch's current state

        out, kl_t = tm(torch.from_numpy(x))
        # the driver's DataParallel reduction line, applied verbatim
        if isinstance(kl_t, torch.Tensor) and kl_t.dim() > 0:
            kl_t = kl_t.mean()
        loss_t = _torch_combined(out * MAX_DEPTH,
                                 torch.from_numpy(gt) * MAX_DEPTH) + KL_W * kl_t
        _step_torch(tm, topt, loss_t)

        (loss_f, stats), grads = grad_fn(params, stats, _nhwc(x), _nhwc(gt))
        assert abs(float(loss_f) - float(loss_t.detach())) < 1e-10 * max(
            1.0, abs(float(loss_t.detach())))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        # one-step agreement: clip seam contributes <= ~1e-6 relative on
        # the UPDATE, i.e. ~lr*1e-6 = 1e-9 absolute on the params
        _assert_trees_match(transplant(tm)["params"], params, 1e-7,
                            f"cvae step-{step} param")

    _bessel_check_stats(transplant(tm)["batch_stats"], stats, stats0,
                        BN_DECAY ** K_STEPS, spatial_sizes=(1, 2, 4, 8, 16))

    # ---- DataParallel KL-gather identity (eval-mode BN) -------------------
    x = _rand(2, 2, 32, 32, seed=990)
    tm.eval()
    with torch.no_grad():
        _, kl_full = tm(torch.from_numpy(x))
        _, kl_a = tm(torch.from_numpy(x[:1]))
        _, kl_b = tm(torch.from_numpy(x[1:]))
    gathered = torch.stack([kl_a, kl_b])  # what DataParallel hands the driver
    assert gathered.dim() > 0
    red = gathered.mean()  # train_cvae.py:448-449
    assert abs(float(red) - float(kl_full)) < 1e-12 * max(1.0, abs(float(kl_full)))
    # and the flax KL obeys the same shard identity. Eval-mode BN uses the
    # RUNNING stats; the flax-evolved buffers differ from torch's by the
    # (already-asserted) Bessel variance-folding identity, so the
    # cross-framework equality below transplants torch's buffers — the
    # shard identity itself holds for any buffers.
    fv = transplant(tm)
    tstats = fv["batch_stats"]
    (_, f_full) = fm.apply({"params": fv["params"], "batch_stats": tstats},
                           _nhwc(x), train=False, sample=False)
    (_, f_a) = fm.apply({"params": fv["params"], "batch_stats": tstats},
                        _nhwc(x[:1]), train=False, sample=False)
    (_, f_b) = fm.apply({"params": fv["params"], "batch_stats": tstats},
                        _nhwc(x[1:]), train=False, sample=False)
    assert abs(0.5 * (float(f_a) + float(f_b)) - float(f_full)) < 1e-12 * max(
        1.0, abs(float(f_full)))
    assert abs(float(f_full) - float(kl_full)) < 1e-9 * max(1.0, abs(float(kl_full)))


def test_base_residual_adaptive_trajectory_crosses_warmup(f64):
    """base_residual with the GENUINE AdaptiveBaseResidualLoss, 5 epochs at
    warmup_epochs=2 — the trajectory CROSSES the curriculum boundary:
    epochs 1-2 train base+residual jointly, epochs 3-5 detach the base
    inside final (train_base_residual.py:368-378) while the annealed
    (lambda_recon, lambda_base) freeze at their final values. The flax side
    runs the production BaseResidualTask.loss_fn with the engine's 0-based
    epoch scalar (engine.py passes epoch-1), pinning the stop_gradient
    switch, the weight anneal, AND the epoch-indexing convention.

    Compared by PER-STEP RESYNCHRONIZATION (see the cvae test's docstring):
    final = clamp(base+residual, 0, 30) has gradient kinks at the clamp
    boundary, so a free-running f64 trajectory amplifies round-off
    discontinuously when a knife-edge pixel lands on different sides in the
    two frameworks (measured jumps to ~1e-4 by epoch 4-5, init-dependent).
    Resync makes every epoch's detach state, anneal weight, clip, and Adam
    index exactly comparable at 1e-7; the optimizer state free-runs."""
    ref = load_ref_models().base_residual_model
    from ref_torch import load_ref_file

    k_steps, warmup = 5, 2
    torch.manual_seed(7)  # reproducible ctor init (and sd0 transplant)
    tm = ref.BaseResidualDepthNet(input_channels=2, base_channels=64,
                                  bilinear=True, output_size=64,
                                  max_depth=MAX_DEPTH).double()
    _warm_bn(tm, torch.from_numpy(_rand(2, 2, 64, 64, seed=1000)))

    # the driver's criterion construction (train_base_residual.py:260-269)
    crit = load_ref_file("utils_base_residual_loss").AdaptiveBaseResidualLoss(
        lambda_recon_init=1.0 * 0.5, lambda_base_init=1.2 * 2.0,
        lambda_sparse=0.05, warmup_epochs=warmup, lowpass_kernel=16,
        use_silog=True, silog_lambda=0.5).double()

    from audiodepth_tpu.models import make_task

    cfg = load_config(
        "batvisionv2", "train", "traj_br", "base_residual",
        overrides={
            "model.base_channels": 64, "dataset.images_size": 64,
            "mode.batch_size": 2, "mode.optimizer": "Adam",
            "mode.learning_rate": LR, "mode.grad_clip_norm": 1.0,
            "mode.lr_schedule": "constant", "mode.epochs": k_steps,
            "model.extra.warmup_epochs": warmup,
        },
    )
    task = make_task(cfg)
    task.model = dataclasses.replace(task.model, dtype=jnp.float64)
    assert task.use_adaptive and task.warmup_epochs == warmup

    def transplant(module):
        return it.import_base_residual(
            {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()})

    variables = transplant(tm)
    stats = variables["batch_stats"]     # free-running
    stats0 = stats

    tx = make_optimizer(cfg.mode, steps_per_epoch=1)
    opt_state = tx.init(variables["params"])  # free-running m/v
    topt = torch.optim.Adam(tm.parameters(), lr=LR)

    def flax_loss(p, st, batch, epoch):
        loss, (new_stats, aux) = task.loss_fn(
            p, st, batch, jax.random.PRNGKey(0), epoch)
        return loss, new_stats

    grad_fn = jax.jit(jax.value_and_grad(flax_loss, has_aux=True))

    tm.train()
    for epoch in range(1, k_steps + 1):  # the driver's 1-based loop
        x = _rand(2, 2, 64, 64, seed=1010 + epoch)
        gt = _depth_target((2, 1, 64, 64), seed=1040 + epoch,
                           lo=0.5, hi=MAX_DEPTH)

        params = transplant(tm)["params"]  # resync to torch's current state

        crit.set_epoch(epoch - 1)  # train_base_residual.py:349
        base_t, residual_t, _ = tm(torch.from_numpy(x))
        if epoch > warmup:  # train_base_residual.py:370-374
            final_t = base_t.detach() + residual_t
        else:
            final_t = base_t + residual_t
        final_t = torch.clamp(final_t, 0, MAX_DEPTH)
        gt_t = torch.from_numpy(gt)
        loss_t, _ = crit(base_t, residual_t, final_t, gt_t,
                         valid_mask=gt_t > 0)
        _step_torch(tm, topt, loss_t)

        batch = {"input": _nhwc(x), "depth": _nhwc(gt)}
        (loss_f, stats), grads = grad_fn(
            params, stats, batch, jnp.float64(epoch - 1))
        assert abs(float(loss_f) - float(loss_t.detach())) < 1e-10 * max(
            1.0, abs(float(loss_t.detach()))), f"epoch {epoch} loss"
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        _assert_trees_match(transplant(tm)["params"], params, 1e-7,
                            f"base_residual epoch-{epoch} param")

    _bessel_check_stats(transplant(tm)["batch_stats"], stats, stats0,
                        BN_DECAY ** k_steps,
                        spatial_sizes=(1, 2, 4, 8, 16, 32, 64))




def test_rgb_depth_unmasked_trajectory_parity(f64):
    """rgb_depth teacher: K AdamW(wd=0.01) steps of the GENUINE DepthLoss
    from the driver (create_depth_loss — UNMASKED L1 + first-difference
    smoothness over gt WITH holes, train_rgb_depth.py:43-87), and NO
    gradient clipping — the one reference driver (with binaural) that
    never clips; mode.grad_clip_norm=0 reproduces it exactly. Flax side is
    the production RGBDepthTask.loss_fn."""
    ref = load_ref_models().rgb_depth_model
    from ref_torch import load_ref_driver

    tm = ref.RGBDepthNet(base_channels=16, bilinear=True, output_size=32,
                         max_depth=MAX_DEPTH).double()
    _warm_bn(tm, torch.from_numpy(_rand(2, 3, 32, 32, seed=1100)))
    sd0 = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    driver, _ = load_ref_driver("train_rgb_depth")
    crit = driver.create_depth_loss().double()

    from audiodepth_tpu.models import make_task

    cfg = load_config(
        "batvisionv2", "train", "traj_rgb", "rgb_depth",
        overrides={
            "model.base_channels": 16, "dataset.images_size": 32,
            "mode.batch_size": 2, "mode.optimizer": "AdamW",
            "mode.learning_rate": LR, "mode.grad_clip_norm": 0.0,
            "mode.lr_schedule": "constant", "mode.epochs": K_STEPS,
        },
    )
    task = make_task(cfg)
    task.model = dataclasses.replace(task.model, dtype=jnp.float64)
    variables = it.import_rgb_depth(sd0)
    params, stats = variables["params"], variables["batch_stats"]
    stats0 = stats

    tx = make_optimizer(cfg.mode, steps_per_epoch=1)
    opt_state = tx.init(params)
    topt = torch.optim.AdamW(tm.parameters(), lr=LR, weight_decay=0.01)

    def flax_loss(p, st, batch):
        loss, (new_stats, aux) = task.loss_fn(
            p, st, batch, jax.random.PRNGKey(0), jnp.float64(0.0))
        return loss, new_stats

    grad_fn = jax.jit(jax.value_and_grad(flax_loss, has_aux=True))

    tm.train()
    for step in range(K_STEPS):
        x = _rand(2, 3, 32, 32, seed=1110 + step)
        gt = _depth_target((2, 1, 32, 32), seed=1140 + step,
                           lo=0.5, hi=MAX_DEPTH)

        pred = tm(torch.from_numpy(x))
        loss_t, _ = crit(pred, torch.from_numpy(gt))
        loss_t.backward()
        topt.step()          # NO clip_grad_norm — driver has none
        topt.zero_grad()

        batch = {"image": _nhwc(x), "depth": _nhwc(gt)}
        (loss_f, stats), grads = grad_fn(params, stats, batch)
        assert abs(float(loss_f) - float(loss_t.detach())) < 1e-10 * max(
            1.0, abs(float(loss_t.detach())))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    tvars = it.import_rgb_depth(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()})
    _assert_trees_match(tvars["params"], params, 1e-8, "rgb_depth param")
    _bessel_check_stats(tvars["batch_stats"], stats, stats0,
                        BN_DECAY ** K_STEPS, spatial_sizes=(1, 2, 4, 8, 16, 32))
