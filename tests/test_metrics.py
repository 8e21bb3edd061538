"""Golden-parity tests for depth metrics.

The numpy twin is checked against an independent torch implementation of the
metric formulas (torch is a test-only dependency), and the batched jnp fast
path is checked against the numpy twin.
"""

import numpy as np
import pytest
import torch

from audiodepth_tpu.metrics import METRIC_NAMES, compute_errors_np, compute_errors_batch


def torch_reference_errors(gt, pred):
    """Independent torch implementation of the metric formulas (common branch)."""
    gt = torch.as_tensor(gt, dtype=torch.float64).reshape(-1)
    pred = torch.as_tensor(pred, dtype=torch.float64).reshape(-1)
    mask = gt != 0
    gt, pred = gt[mask], pred[mask]
    eps = 1e-3 if gt.max() > 1.0 else 1e-6
    valid = (pred > eps) & (gt > eps)
    gt, pred = gt[valid], pred[valid]
    eps = 1e-3 if gt.max() > 1.0 else 1e-6
    thresh = torch.maximum(gt / torch.clamp(pred, min=eps), torch.clamp(pred, min=eps) / gt)
    a1 = (thresh < 1.25).double().mean()
    a2 = (thresh < 1.25 ** 2).double().mean()
    a3 = (thresh < 1.25 ** 3).double().mean()
    rmse = ((gt - pred) ** 2).mean().sqrt()
    abs_rel = ((gt - pred).abs() / gt).mean()
    log10 = (torch.log10(torch.clamp(gt, min=eps)) - torch.log10(torch.clamp(pred, min=eps))).abs().mean()
    mae = (gt - pred).abs().mean()
    return tuple(float(x) for x in (abs_rel, rmse, a1, a2, a3, log10, mae))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("scale", [30.0, 1.0])  # metric vs normalized depth
def test_numpy_twin_matches_torch_formulas(seed, scale):
    rng = np.random.default_rng(seed)
    gt = rng.uniform(0, scale, size=(64, 64)).astype(np.float32)
    gt[rng.random((64, 64)) < 0.3] = 0.0  # invalid pixels
    pred = np.clip(gt + rng.normal(0, 0.1 * scale, size=(64, 64)), 1e-3, scale).astype(np.float32)

    ours = compute_errors_np(gt, pred)
    ref = torch_reference_errors(gt, pred)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


def test_no_valid_gt_returns_zeros():
    out = compute_errors_np(np.zeros((8, 8)), np.ones((8, 8)))
    assert out == (0.0,) * 7


def test_all_negative_pred_failure_sentinel():
    gt = np.full((8, 8), 5.0)
    pred = np.full((8, 8), -1.0)
    abs_rel, rmse, a1, a2, a3, log10, mae = compute_errors_np(gt, pred)
    assert (abs_rel, a1, a2, a3, log10) == (1.0, 0.0, 0.0, 0.0, 1.0)
    assert rmse == 5.0 and mae == 5.0


def test_tiny_pred_fallback_keeps_positive_preds():
    # preds all <= eps but one positive: second fallback keeps gt-valid & pred>0
    gt = np.full((4,), 5.0)
    pred = np.array([1e-6, 5e-4, -1.0, 0.0])
    abs_rel, rmse, *_ = compute_errors_np(gt, pred)
    # valid pixels = first two (positive but <= 1e-3)
    expected_abs_rel = np.mean(np.abs(gt[:2] - pred[:2]) / gt[:2])
    np.testing.assert_allclose(abs_rel, expected_abs_rel, rtol=1e-6)


@pytest.mark.parametrize("metric_scale", [True, False])
def test_batched_jnp_matches_numpy_twin(metric_scale):
    rng = np.random.default_rng(7)
    scale = 30.0 if metric_scale else 1.0
    eps = 1e-3 if metric_scale else 1e-6
    gt = rng.uniform(0, scale, size=(4, 32, 32)).astype(np.float32)
    gt[rng.random(gt.shape) < 0.25] = 0.0
    pred = np.clip(
        gt + rng.normal(0, 0.05 * scale, size=gt.shape), eps * 2, scale
    ).astype(np.float32)

    batched = compute_errors_batch(gt, pred, metric_scale=metric_scale)
    for i in range(gt.shape[0]):
        expected = compute_errors_np(gt[i], pred[i])
        got = [float(batched[k][i]) for k in METRIC_NAMES]
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-6)


def test_batched_empty_sample_zeroes():
    gt = np.zeros((2, 8, 8), dtype=np.float32)
    gt[1] = 5.0
    pred = np.full((2, 8, 8), 4.0, dtype=np.float32)
    out = compute_errors_batch(gt, pred)
    assert float(out["rmse"][0]) == 0.0
    assert float(out["rmse"][1]) > 0.0
