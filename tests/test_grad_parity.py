"""One-step GRADIENT parity against the genuine reference, in float64.

test_torch_interop.py pins forward parity; these tests pin the BACKWARD
pass end-to-end: construct the reference torch module from /root/reference
in double precision, transplant its weights bit-exactly, compute the
reference training loss (the genuine ``utils_loss.SIlogLoss`` + torch L1
on gathered valid pixels in meters, train.py:646-669) on the SAME batch on
both sides with train-mode BatchNorm, and assert every parameter gradient
matches leaf-for-leaf at double-precision tolerance (observed ~1e-13;
asserted 1e-8).

Running in f64 is what makes this sharp: in fp32 the two frameworks'
different-but-equivalent reduction orders (single-pass vs two-pass BN
statistics, blockwise softmax) produce ~1% gradient noise through a deep
net, which would force a tolerance loose enough to hide real bugs.  At
f64 the math is identical to machine precision, so ANY architectural or
wiring divergence — a wrong scale, a swapped operand, a missing
stop_gradient — fails loudly.

Gradients of the torch side are mapped into the flax tree through the
same import specs as the weights (a gradient has the same shape/layout as
its parameter), so the comparison needs no hand-written correspondence.
"""

from __future__ import annotations

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodepth_tpu.losses.basic import combined_loss
from audiodepth_tpu.tools import import_torch as it

from ref_torch import load_ref_file, load_ref_models, ref_cfg, reference_available

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)

MAX_DEPTH = 30.0
W_L1, W_SI, LAM = 0.237, 0.637, 0.869  # conf/mode/train.yaml swept weights
TOL = 1e-8


@pytest.fixture
def f64():
    """Enable x64 and bit-exact f64 weight transplant; restore afterwards."""
    jax.config.update("jax_enable_x64", True)
    prev = it._Builder.param_dtype
    it._Builder.param_dtype = np.float64
    try:
        yield
    finally:
        it._Builder.param_dtype = prev
        jax.config.update("jax_enable_x64", False)


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape)


def _depth_target(shape, seed, lo, hi, holes=0.2):
    """Random depth map with ~holes fraction of invalid (0) pixels."""
    rng = np.random.RandomState(seed)
    gt = rng.uniform(lo, hi, size=shape)
    gt[rng.rand(*shape) < holes] = 0.0
    return gt


def _torch_combined(pred, gt):
    """The reference Combined criterion on gathered valid pixels."""
    silog = load_ref_file("utils_loss").SIlogLoss(lambda_scale=LAM)
    mask = gt != 0.0
    return W_L1 * torch.nn.L1Loss()(pred[mask], gt[mask]) + W_SI * silog(
        pred[mask], gt[mask]
    )


def _flax_combined(pred, gt):
    mask = gt != 0.0
    return combined_loss(pred, gt, mask, l1_weight=W_L1, silog_weight=W_SI,
                         silog_lambda=LAM)


def _grad_state_dict(tm):
    """state_dict with every parameter tensor replaced by its gradient
    (buffers keep their values so the import spec consumes all keys)."""
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
    for name, p in tm.named_parameters():
        assert p.grad is not None, f"no grad for {name}"
        sd[name] = p.grad.detach().cpu().numpy()
    return sd


def _assert_grads_match(torch_params, jax_params, tol=TOL):
    """Leaf-for-leaf, relative to each leaf's torch-grad scale, floored at
    1e-3 of the global max |grad| so leaves whose true gradient is
    mathematically zero (e.g. a conv bias feeding straight into train-mode
    BatchNorm) don't amplify numerical zeros into spurious ratios."""
    from flax.traverse_util import flatten_dict

    want = flatten_dict(jax_params)
    got = flatten_dict(torch_params)
    assert set(want) == set(got)
    gmax = max(float(np.abs(np.asarray(b)).max()) for b in got.values())
    worst, worst_key = 0.0, None
    for k in want:
        a = np.asarray(want[k], np.float64)
        b = np.asarray(got[k], np.float64)
        scale = max(float(np.abs(b).max()), 1e-3 * gmax, 1e-12)
        rel = float(np.abs(a - b).max()) / scale
        if rel > worst:
            worst, worst_key = rel, k
    assert worst < tol, f"worst grad mismatch {worst:.2e} at {worst_key}"


def _warm_bn(model, *inputs, passes=2):
    model.train()
    with torch.no_grad():
        for _ in range(passes):
            model(*inputs)


def _run_both(tm, fm_apply_loss, variables, x, gt, meters_scale=1.0):
    """Torch backward + flax grad on the same batch; returns both trees."""
    tm.train()
    tm.zero_grad()
    pred = tm(torch.from_numpy(x))
    if isinstance(pred, tuple):
        pred = pred[-1]  # base_residual returns (base, residual, final)
    loss_t = _torch_combined(pred * meters_scale,
                             torch.from_numpy(gt) * meters_scale)
    loss_t.backward()

    loss_f = float(fm_apply_loss(variables))
    assert abs(loss_f - float(loss_t)) < 1e-10 * max(1.0, abs(float(loss_t)))
    return loss_t


def test_unet_train_step_gradient_parity(f64):
    """UNet-128 (ngf=8): sigmoid head, loss in denormalized meters
    (train.py:646-660), train-mode BN."""
    ref = load_ref_models().unetbaseline_model
    tm = ref.UnetGenerator(ref_cfg(depth_norm=True), 2, 1, 7, 8,
                           norm_layer=functools.partial(
                               torch.nn.BatchNorm2d, affine=True,
                               track_running_stats=True)).double()
    ref.init_weights(tm, "normal", 0.02)
    x = _rand(2, 2, 128, 128, seed=10)
    gt = _depth_target((2, 1, 128, 128), seed=11, lo=0.02, hi=1.0)
    _warm_bn(tm, torch.from_numpy(x))

    from audiodepth_tpu.models.unet import UNetGenerator

    fm = UNetGenerator(input_nc=2, output_nc=1, num_downs=7, ngf=8,
                       depth_norm=True, dtype=jnp.float64)
    variables = it.import_unet(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()},
        num_downs=7)
    gtj = _nhwc(gt)

    def apply_loss(vs):
        out, _ = fm.apply(vs, _nhwc(x), train=True, mutable=["batch_stats"])
        return _flax_combined(out * MAX_DEPTH, gtj * MAX_DEPTH)

    _run_both(tm, apply_loss, variables, x, gt, meters_scale=MAX_DEPTH)
    grads = jax.grad(lambda p: apply_loss({"params": p,
                                           "batch_stats": variables["batch_stats"]})
                     )(variables["params"])
    tgrads = it.import_unet(_grad_state_dict(tm), num_downs=7)
    _assert_grads_match(tgrads["params"], grads)


def test_binaural_attention_gradient_parity(f64):
    """Binaural attention net: meters head; γ set to 0.7 so gradients flow
    THROUGH the attention internals (zero-init γ would gate them off and
    make the test vacuous for Q/K/V)."""
    ref = load_ref_models().binaural_attention_model
    tm = ref.BinauralAttentionDepthNet(base_channels=16, bilinear=True,
                                       output_size=32, max_depth=MAX_DEPTH,
                                       attention_levels=[2, 3, 4, 5]).double()
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "gamma" in name:
                p.fill_(0.7)
    x = _rand(2, 2, 32, 32, seed=20)
    gt = _depth_target((2, 1, 32, 32), seed=21, lo=0.5, hi=MAX_DEPTH)
    _warm_bn(tm, torch.from_numpy(x))

    from audiodepth_tpu.models.binaural_attention import BinauralAttentionNet

    fm = BinauralAttentionNet(base_channels=16, max_depth=MAX_DEPTH,
                              attention_levels=(2, 3, 4, 5), output_size=32,
                              dtype=jnp.float64)
    variables = it.import_binaural(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()})
    gtj = _nhwc(gt)

    def apply_loss(vs):
        out, _ = fm.apply(vs, _nhwc(x), train=True, mutable=["batch_stats"])
        return _flax_combined(out, gtj)

    _run_both(tm, apply_loss, variables, x, gt)
    grads = jax.grad(lambda p: apply_loss({"params": p,
                                           "batch_stats": variables["batch_stats"]})
                     )(variables["params"])
    tgrads = it.import_binaural(_grad_state_dict(tm))
    _assert_grads_match(tgrads["params"], grads)


def test_base_residual_gradient_parity(f64):
    """Base+residual decomposition: both decoders and the clamped combined
    output receive the reference training signal. (The reference decoder
    hardcodes 64-channel concat widths, so base_channels must be 64.)"""
    ref = load_ref_models().base_residual_model
    tm = ref.BaseResidualDepthNet(input_channels=2, base_channels=64,
                                  bilinear=True, output_size=64,
                                  max_depth=MAX_DEPTH).double()
    x = _rand(2, 2, 64, 64, seed=30)
    gt = _depth_target((2, 1, 64, 64), seed=31, lo=0.5, hi=MAX_DEPTH)
    _warm_bn(tm, torch.from_numpy(x))

    from audiodepth_tpu.models.base_residual import BaseResidualNet

    fm = BaseResidualNet(input_channels=2, base_channels=64,
                         max_depth=MAX_DEPTH, dtype=jnp.float64)
    variables = it.import_base_residual(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()})
    gtj = _nhwc(gt)

    def apply_loss(vs):
        (base, resid), _ = fm.apply(vs, _nhwc(x), train=True,
                                    mutable=["batch_stats"])
        final = jnp.clip(base + resid, 0.0, MAX_DEPTH)
        return _flax_combined(final, gtj)

    _run_both(tm, apply_loss, variables, x, gt)
    grads = jax.grad(lambda p: apply_loss({"params": p,
                                           "batch_stats": variables["batch_stats"]})
                     )(variables["params"])
    tgrads = it.import_base_residual(_grad_state_dict(tm))
    _assert_grads_match(tgrads["params"], grads)
