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


# ---------------------------------------------------------------------------
# The eval-clip invariant (metrics/errors.py:10-16): compute_errors_batch
# implements only the non-degenerate branch of the np twin and is valid
# exactly when the prediction was pre-clipped to [eps, max_depth]. The clip
# lives in ONE place — Task.eval_metrics (train/tasks.py:134-141) — and the
# two tests below machine-check both halves of the contract: every family
# routes through that one clipping implementation, and the clipped jnp path
# lands exactly on the np twin even for degenerate raw predictions.
# ---------------------------------------------------------------------------
def test_every_registered_family_uses_the_clipping_eval_metrics():
    """No task may override eval_metrics without re-establishing the clip;
    this sweep fails the moment an override appears, forcing the author to
    prove the precondition again."""
    from audiodepth_tpu.train import tasks_extra
    from audiodepth_tpu.train.tasks import Task, UNetBaselineTask

    families = {"unet_baseline": UNetBaselineTask, **tasks_extra.REGISTRY}
    assert set(families) == {
        "unet_baseline", "unet_cvae", "base_residual", "binaural_attention",
        "rgb_depth", "adabins_distillation", "coarse_depth",
    }
    for name, cls in families.items():
        assert cls.eval_metrics is Task.eval_metrics, (
            f"{name} overrides eval_metrics — it must clip pred to "
            f"[EVAL_PRED_MIN, max_depth] before compute_errors_batch (the jnp twin's "
            f"documented precondition) and update this sweep")


@pytest.mark.parametrize("depth_norm", [False, True])
def test_eval_metrics_degenerate_pred_matches_np_twin_after_clip(depth_norm):
    """Degenerate raw predictions (negative, zero, sub-eps, > max_depth)
    through the REAL eval path: Task.eval_metrics's clip must make the jnp
    twin agree with the np twin evaluated on the same clipped prediction —
    per sample, every metric."""
    import jax.numpy as jnp

    from audiodepth_tpu.train.tasks import Task

    max_depth = 30.0
    rng = np.random.RandomState(7)
    gt_m = rng.uniform(0.5, max_depth, size=(4, 8, 8, 1)).astype(np.float32)
    gt_m[rng.rand(*gt_m.shape) < 0.25] = 0.0  # invalid holes
    # raw model-unit predictions spanning every degenerate regime
    pred = rng.uniform(1.0, 10.0, size=(4, 8, 8, 1)).astype(np.float32)
    pred[0] -= 20.0          # mostly negative
    pred[1] *= 0.0           # exactly zero everywhere
    pred[2] *= 1e-5          # positive but below the 1e-3 meter eps
    pred[3] *= 1e4           # far above max_depth
    if depth_norm:
        gt = gt_m / max_depth  # datasets store normalized depth (BV1)
    else:
        gt = gt_m

    class _StubTask(Task):
        pred_is_normalized = depth_norm  # UNet-style head under depth_norm

        def __init__(self):  # no model/config needed for the eval path
            self.max_depth = max_depth
            self.depth_norm = depth_norm

        def predict_raw(self, params, batch_stats, batch):
            return jnp.asarray(pred)

    from audiodepth_tpu.metrics import EVAL_PRED_MIN

    out = _StubTask().eval_metrics(None, None, {"depth": jnp.asarray(gt)})
    clipped_m = np.clip(
        pred * (max_depth if depth_norm else 1.0), EVAL_PRED_MIN, max_depth)
    for i in range(4):
        expected = compute_errors_np(gt_m[i], clipped_m[i])
        for name, val in zip(METRIC_NAMES, expected):
            np.testing.assert_allclose(
                float(out[name][i]), val, rtol=1e-5, atol=1e-6,
                err_msg=f"sample {i} metric {name}")
