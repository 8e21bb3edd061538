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
    (buffers keep their values so the import spec consumes all keys).

    Parameters torch never ran (e.g. the cVAE's three registered-but-unused
    BN modules) have grad=None and become zeros; the import specs either
    discard those keys or — if the flax twin disagrees that the gradient is
    zero — the leaf-for-leaf comparison fails, so nothing is hidden."""
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}
    for name, p in tm.named_parameters():
        g = p.grad if p.grad is not None else torch.zeros_like(p)
        sd[name] = g.detach().cpu().numpy()
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


def test_rgb_depth_gradient_parity(f64):
    """RGB teacher net (rgb_depth_model.py:80-218): meters head, train-mode
    BN, reference Combined criterion."""
    ref = load_ref_models().rgb_depth_model
    tm = ref.RGBDepthNet(base_channels=16, bilinear=True, output_size=32,
                         max_depth=MAX_DEPTH).double()
    x = _rand(2, 3, 32, 32, seed=40)
    gt = _depth_target((2, 1, 32, 32), seed=41, lo=0.5, hi=MAX_DEPTH)
    _warm_bn(tm, torch.from_numpy(x))

    from audiodepth_tpu.models.rgb_depth import RGBDepthNet

    fm = RGBDepthNet(base_channels=16, max_depth=MAX_DEPTH, output_size=32,
                     dtype=jnp.float64)
    variables = it.import_rgb_depth(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()})
    gtj = _nhwc(gt)

    def apply_loss(vs):
        out, _ = fm.apply(vs, _nhwc(x), train=True, mutable=["batch_stats"])
        return _flax_combined(out, gtj)

    _run_both(tm, apply_loss, variables, x, gt)
    grads = jax.grad(lambda p: apply_loss({"params": p,
                                           "batch_stats": variables["batch_stats"]})
                     )(variables["params"])
    _assert_grads_match(it.import_rgb_depth(_grad_state_dict(tm))["params"], grads)


def test_unet_cvae_gradient_parity(f64, monkeypatch):
    """cVAE UNet (unet_cvae_model.py:8-294): recon + 0.1·KL objective,
    train-mode BN, deterministic posterior mean (eps = 0 on both sides) so
    the reparametrized latent path and both bottleneck Dense layers carry
    checked gradients (fc_logvar via the KL term)."""
    ref = load_ref_models().unet_cvae_model
    base = load_ref_models().unetbaseline_model
    tm = ref.UnetGeneratorVAE(ref_cfg(depth_norm=True), 2, 1, 7, 8,
                              norm_layer=functools.partial(
                                  torch.nn.BatchNorm2d, affine=True,
                                  track_running_stats=True),
                              latent_dim=16).double()
    base.init_weights(tm, "normal", 0.02)
    x = _rand(2, 2, 128, 128, seed=50)
    gt = _depth_target((2, 1, 128, 128), seed=51, lo=0.02, hi=1.0)
    _warm_bn(tm, torch.from_numpy(x))
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))
    tm.train()
    tm.zero_grad()
    out, kl_t = tm(torch.from_numpy(x))
    loss_t = _torch_combined(out * MAX_DEPTH,
                             torch.from_numpy(gt) * MAX_DEPTH) + 0.1 * kl_t
    loss_t.backward()

    from audiodepth_tpu.models.unet_cvae import UNetCVAE

    fm = UNetCVAE(input_nc=2, output_nc=1, num_downs=7, ngf=8,
                  depth_norm=True, latent_dim=16, dtype=jnp.float64)
    variables = it.import_unet_cvae(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()},
        num_downs=7)
    gtj = _nhwc(gt)

    def apply_loss(vs):
        (o, kl), _ = fm.apply(vs, _nhwc(x), train=True, sample=False,
                              mutable=["batch_stats"])
        return _flax_combined(o * MAX_DEPTH, gtj * MAX_DEPTH) + 0.1 * kl

    loss_f = float(apply_loss(variables))
    assert abs(loss_f - float(loss_t)) < 1e-10 * max(1.0, abs(float(loss_t)))
    grads = jax.grad(lambda p: apply_loss({"params": p,
                                           "batch_stats": variables["batch_stats"]})
                     )(variables["params"])
    tgrads = it.import_unet_cvae(_grad_state_dict(tm), num_downs=7)
    _assert_grads_match(tgrads["params"], grads)


def test_adabins_distillation_gradient_parity(f64):
    """The full 5-term distillation objective through BOTH twin nets, using
    the GENUINE reference criterion (utils_distillation_loss.py:149-230).

    This is the sharpest frozen-teacher check possible: the reference
    detaches every teacher quantity inside the loss, this framework
    stop_gradients the teacher subtree inside the model — the test proves
    the two mechanisms produce the identical gradient field (zero over the
    whole rgb branch, residual_head updated through the audio path only).
    Eval-mode BN/dropout on both sides (the bin predictor's Dropout(0.1)
    would otherwise inject framework-specific randomness)."""
    ref = load_ref_models().adabins_distillation_model
    tm = ref.AdaBinsDistillationModel(n_bins=16, base_channels=64,
                                      output_size=32,
                                      max_depth=MAX_DEPTH).double()
    audio = _rand(2, 2, 32, 32, seed=60)
    rgb_x = _rand(2, 3, 32, 32, seed=61)
    gt = _depth_target((2, 1, 32, 32), seed=62, lo=0.5, hi=MAX_DEPTH)
    tm.train()
    with torch.no_grad():
        for _ in range(2):
            tm.forward_audio(torch.from_numpy(audio))
            tm.forward_rgb(torch.from_numpy(rgb_x))
    tm.eval()
    tm.zero_grad()
    tout = tm(torch.from_numpy(audio), rgb=torch.from_numpy(rgb_x),
              mode="train")
    crit = load_ref_file("utils_distillation_loss").DistillationLoss(
        lambda_task=2.0, lambda_response=0.3, lambda_feature=0.2,
        lambda_bin=0.05, lambda_sparse=0.1, temperature=4.0)
    gt_t = torch.from_numpy(gt)
    loss_t, _ = crit(tout, gt_t, valid_mask=gt_t > 0)
    loss_t.backward()

    from audiodepth_tpu.losses.distillation import distillation_loss
    from audiodepth_tpu.models.adabins import AdaBinsDistillationModel

    fm = AdaBinsDistillationModel(n_bins=16, base_channels=64,
                                  output_size=32, max_depth=MAX_DEPTH,
                                  dtype=jnp.float64)
    variables = it.import_adabins(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()})
    gtj = _nhwc(gt)

    def apply_loss(vs):
        out = fm.apply(vs, _nhwc(audio), _nhwc(rgb_x), train=False,
                       mode="train")
        total, _ = distillation_loss(
            out, gtj, gtj > 0, lambda_task=2.0, lambda_response=0.3,
            lambda_feature=0.2, lambda_bin=0.05, lambda_sparse=0.1,
            temperature=4.0)
        return total

    loss_f = float(apply_loss(variables))
    assert abs(loss_f - float(loss_t)) < 1e-10 * max(1.0, abs(float(loss_t)))
    grads = jax.grad(lambda p: apply_loss({"params": p,
                                           "batch_stats": variables["batch_stats"]})
                     )(variables["params"])
    tgrads = it.import_adabins(_grad_state_dict(tm))
    _assert_grads_match(tgrads["params"], grads)


@pytest.mark.parametrize("variant", ["unet", "lite", "offset", "dual"])
def test_coarse_gradient_parity(f64, variant):
    """All four coarse variants (coarse_depth_model.py:86-287,591-994):
    soft-binning gradients to the bin logits, and — for offset/dual — the
    detach-gated offset fusion (the coarse branch must receive NO gradient
    through the fusion input on either side)."""
    ref = load_ref_models().coarse_depth_model

    from audiodepth_tpu.models import coarse_depth as cd

    x = _rand(2, 2, 32, 32, seed=70)
    gt = _depth_target((2, 1, 32, 32), seed=71, lo=0.5, hi=MAX_DEPTH)
    centers = np.linspace(0.5, 29.5, 8)
    kw = dict(input_channels=2, base_channels=16, output_size=32)
    if variant == "unet":
        tm = ref.CoarseDepthUNet(n_bins=8, **kw).double()
        fm = cd.CoarseDepthUNet(n_bins=8, dtype=jnp.float64, **kw)
        importer = it.import_coarse_unet
    elif variant == "lite":
        tm = ref.CoarseDepthLite(n_bins=8, **kw).double()
        fm = cd.CoarseDepthLite(n_bins=8, dtype=jnp.float64, **kw)
        importer = it.import_coarse_lite
    elif variant == "offset":
        tm = ref.CoarseWithOffsetModel(n_bins=8, **kw).double()
        fm = cd.CoarseWithOffsetModel(n_bins=8, dtype=jnp.float64, **kw)
        importer = it.import_coarse_offset
    else:
        tm = ref.DualRegressionModel(**kw).double()
        fm = cd.DualRegressionModel(dtype=jnp.float64, **kw)
        importer = it.import_dual_regression
    if variant != "dual":
        tm.set_bin_centers(torch.from_numpy(centers))
    _warm_bn(tm, torch.from_numpy(x))
    tm.train()
    tm.zero_grad()
    touts = tm(torch.from_numpy(x))
    loss_t = _torch_combined(touts[-1], torch.from_numpy(gt))
    loss_t.backward()

    variables = importer(
        {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()})
    gtj = _nhwc(gt)
    fc = jnp.asarray(centers)

    def apply_loss(vs):
        if variant == "dual":
            outs, _ = fm.apply(vs, _nhwc(x), train=True,
                               mutable=["batch_stats"])
        else:
            outs, _ = fm.apply(vs, _nhwc(x), fc, train=True,
                               mutable=["batch_stats"])
        return _flax_combined(outs[-1], gtj)

    loss_f = float(apply_loss(variables))
    assert abs(loss_f - float(loss_t)) < 1e-10 * max(1.0, abs(float(loss_t)))
    grads = jax.grad(lambda p: apply_loss({"params": p,
                                           "batch_stats": variables["batch_stats"]})
                     )(variables["params"])
    _assert_grads_match(importer(_grad_state_dict(tm))["params"], grads)
