"""Golden tests for core losses against independent torch formulas."""

import numpy as np
import pytest
import torch

from audiodepth_tpu.losses import l1_loss, silog_loss, combined_loss, make_criterion


def torch_silog(pred, target, lam=0.5, eps=1e-6):
    pred = torch.clamp(torch.as_tensor(pred), min=eps)
    target = torch.clamp(torch.as_tensor(target), min=eps)
    d = torch.log(pred) - torch.log(target)
    var = (d ** 2).mean() - lam * d.mean() ** 2
    return float(torch.sqrt(torch.clamp(var, min=0.0)))


@pytest.mark.parametrize("lam", [0.5, 0.869])
def test_silog_full(lam):
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.1, 30, size=(2, 1, 16, 16)).astype(np.float32)
    target = rng.uniform(0.1, 30, size=(2, 1, 16, 16)).astype(np.float32)
    got = float(silog_loss(pred, target, lambda_scale=lam))
    np.testing.assert_allclose(got, torch_silog(pred, target, lam), rtol=1e-5)


def test_silog_masked_equals_gathered():
    # weighted-mean formulation == applying the loss to gathered pixels
    rng = np.random.default_rng(1)
    pred = rng.uniform(0.1, 30, size=(512,)).astype(np.float32)
    target = rng.uniform(0.0, 30, size=(512,)).astype(np.float32)
    mask = target != 0
    got = float(silog_loss(pred, target, mask=mask))
    want = torch_silog(pred[mask], target[mask])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_l1_masked_equals_gathered():
    rng = np.random.default_rng(2)
    pred = rng.normal(size=(256,)).astype(np.float32)
    target = rng.normal(size=(256,)).astype(np.float32)
    mask = rng.random(256) < 0.5
    got = float(l1_loss(pred, target, mask=mask))
    want = float(np.abs(pred[mask] - target[mask]).mean())
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_combined_defaults():
    rng = np.random.default_rng(3)
    pred = rng.uniform(0.1, 30, size=(128,)).astype(np.float32)
    target = rng.uniform(0.1, 30, size=(128,)).astype(np.float32)
    got = float(combined_loss(pred, target))
    want = 0.237 * np.abs(pred - target).mean() + 0.637 * torch_silog(pred, target, 0.869)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_criterion_factory():
    fn = make_criterion("Combined")
    assert callable(fn)
    with pytest.raises(ValueError):
        make_criterion("nope")
