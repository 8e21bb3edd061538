"""Coarse-depth family: bins, losses, all four model types."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.bins import (
    add_bins_to_batch,
    compute_bin_edges,
    depth_to_bins_np,
)
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.losses.coarse import (
    coarse_offset_loss,
    focal_loss,
    hard_cross_entropy_loss,
    ordinal_regression_loss,
    soft_cross_entropy_loss,
)
from audiodepth_tpu.models import make_task
from audiodepth_tpu.train import Engine


# ---------------- bins ----------------

@pytest.mark.parametrize("mode", ["linear", "log", "sid"])
def test_bin_edges_shapes_and_monotone(mode):
    edges, centers = compute_bin_edges(16, 0.1, 30.0, mode)
    assert edges.shape == (17,) and centers.shape == (16,)
    assert (np.diff(edges) > 0).all()
    np.testing.assert_allclose(edges[0], 0.1, rtol=1e-6)
    np.testing.assert_allclose(edges[-1], 30.0, rtol=1e-6)


def test_bucketize_matches_torch():
    edges, _ = compute_bin_edges(16, 0.1, 30.0, "sid")
    depth = np.random.default_rng(0).uniform(0, 31, size=(8, 8)).astype(np.float32)
    ours = depth_to_bins_np(depth, edges)
    ref = torch.bucketize(torch.as_tensor(depth), torch.as_tensor(edges[1:-1]))
    ref = torch.clamp(ref, 0, 15).numpy()
    np.testing.assert_array_equal(ours, ref)


# ---------------- losses (golden vs torch formulas) ----------------

def test_soft_ce_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    bins = rng.integers(0, 16, size=(2, 8, 8))
    ours = float(soft_cross_entropy_loss(logits, bins, sigma=2.0))

    lt = torch.as_tensor(logits).permute(0, 3, 1, 2)
    tb = torch.as_tensor(bins).unsqueeze(1).float()
    idx = torch.arange(16, dtype=torch.float32).view(1, 16, 1, 1)
    soft = torch.exp(-0.5 * ((idx - tb) / 2.0) ** 2)
    soft = soft / (soft.sum(1, keepdim=True) + 1e-8)
    want = float(-(soft * torch.log_softmax(lt, 1)).sum(1).mean())
    np.testing.assert_allclose(ours, want, rtol=1e-5)


def test_ordinal_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    bins = rng.integers(0, 8, size=(2, 4, 4))
    ours = float(ordinal_regression_loss(logits, bins))
    lt = torch.as_tensor(logits).permute(0, 3, 1, 2)
    tb = torch.as_tensor(bins).unsqueeze(1)
    idx = torch.arange(8).view(1, 8, 1, 1)
    labels = (idx <= tb).float()
    want = float(torch.nn.functional.binary_cross_entropy_with_logits(lt, labels))
    np.testing.assert_allclose(ours, want, rtol=1e-5)


def test_focal_matches_torch():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    bins = rng.integers(0, 8, size=(2, 4, 4))
    ours = float(focal_loss(logits, bins, gamma=2.0))
    lt = torch.as_tensor(logits).reshape(-1, 8)
    tb = torch.as_tensor(bins).reshape(-1).long()
    ce = torch.nn.functional.cross_entropy(lt, tb, reduction="none")
    want = float((((1 - torch.exp(-ce)) ** 2.0) * ce).mean())
    np.testing.assert_allclose(ours, want, rtol=1e-5)


# ---------------- model types end-to-end ----------------

def coarse_build(model_type):
    overrides = {
        "model.base_channels": 8,
        "model.n_bins": 8,
        "dataset.images_size": 64,
        "mode.batch_size": 2,
        "mode.compute_dtype": "float32",
        "model.model_type": model_type,
    }
    cfg = load_config("batvisionv2", "train", "t", "coarse_depth", overrides=overrides)
    ds = SyntheticEchoDataset(cfg, num_samples=2, seed=0)
    task = make_task(cfg)
    batch = next(ds.batches(2, shuffle=False))
    batch = add_bins_to_batch(batch, task.bin_edges, cfg.dataset.max_depth,
                              cfg.dataset.depth_norm)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    return eng, state, batch, task


@pytest.mark.parametrize("model_type", ["unet", "lite", "hybrid", "dual_reg"])
def test_coarse_types_train_and_predict(model_type):
    eng, state, batch, task = coarse_build(model_type)
    state, m = eng.train_step(state, batch, epoch=0.0)
    assert np.isfinite(float(m["loss"]))
    pred = task.predict_raw(state.params, state.batch_stats, eng.put_batch(batch))
    assert pred.shape == (2, 64, 64, 1)
    out = eng.eval_step(state, batch)
    assert np.isfinite(np.asarray(out["rmse"])).all()


def test_coarse_checkpoint_aux_contains_bins():
    eng, state, batch, task = coarse_build("unet")
    aux = task.checkpoint_aux()
    assert aux["bin_edges"].shape == (9,)
    assert aux["bin_centers"].shape == (8,)


def test_add_bins_handles_compact_uint16():
    from audiodepth_tpu.data.codec import encode_batch

    rng = np.random.default_rng(9)
    depth = rng.uniform(0, 30, size=(2, 8, 8, 1)).astype(np.float32)
    edges, _ = compute_bin_edges(16, 0.1, 30.0, "linear")
    raw = add_bins_to_batch({"depth": depth}, edges, 30.0, False)
    compact = encode_batch({"depth": depth}, 30.0)
    enc = add_bins_to_batch(compact, edges, 30.0, False)
    np.testing.assert_array_equal(raw["bins"], enc["bins"])


def test_hybrid_loss_driver_defaults_match_reference():
    """Our hybrid coarse loss with the TASK defaults equals the genuine
    reference CoarseOffsetLoss constructed exactly as the driver does
    (train_coarse_depth.py:337-343: ce=1.0, regression=0.5,
    offset_reg=0.01, l1, label_smoothing=0.1)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from ref_torch import load_ref_models, reference_available

    if not reference_available():
        import pytest

        pytest.skip("/root/reference not present")
    ref = load_ref_models()

    rng = np.random.default_rng(7)
    B, H, W, nb = 2, 8, 8, 16
    logits = rng.normal(size=(B, H, W, nb)).astype(np.float32)
    coarse = rng.uniform(0, 10, size=(B, H, W, 1)).astype(np.float32)
    offset = rng.normal(size=(B, H, W, 1)).astype(np.float32)
    final = np.clip(coarse + offset, 0, 30).astype(np.float32)
    gt = rng.uniform(0, 10, size=(B, H, W, 1)).astype(np.float32)
    bins = rng.integers(0, nb, size=(B, H, W))

    ours, parts = coarse_offset_loss(
        logits, coarse, offset, final, gt, bins,
        ce_weight=1.0, regression_weight=0.5, offset_reg_weight=0.01,
        label_smoothing=0.1,
    )

    crit = ref.coarse_depth_model.CoarseOffsetLoss(
        ce_weight=1.0, regression_weight=0.5, offset_reg_weight=0.01,
        regression_loss="l1", label_smoothing=0.1,
    )
    tl = torch.as_tensor(logits).permute(0, 3, 1, 2)
    tc = torch.as_tensor(coarse).permute(0, 3, 1, 2)
    to = torch.as_tensor(offset).permute(0, 3, 1, 2)
    tf = torch.as_tensor(final).permute(0, 3, 1, 2)
    tg = torch.as_tensor(gt).permute(0, 3, 1, 2)
    tb = torch.as_tensor(bins)
    want, want_parts = crit(tl, tc, to, tf, tg, tb)
    np.testing.assert_allclose(float(ours), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(parts["ce"]), float(want_parts["ce"]), rtol=1e-5)
    np.testing.assert_allclose(float(parts["offset_reg"]),
                               float(want_parts["offset_reg"]), rtol=1e-5)
