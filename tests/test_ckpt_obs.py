"""Checkpoint round-trip, best-tracking, logging, and visualization tests."""

import os

import jax
import numpy as np
import pytest

from audiodepth_tpu.ckpt import BestTracker, CheckpointManager
from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.models import make_task
from audiodepth_tpu.obs import MetricLogger, save_batch_visualization, save_depth_comparison
from audiodepth_tpu.obs.visualize import save_decomposition
from audiodepth_tpu.train import Engine


def small():
    cfg = load_config("batvisionv2", overrides={
        "model.generator": "unet_128", "model.ngf": 4,
        "dataset.images_size": 128, "mode.batch_size": 2,
        "mode.compute_dtype": "float32",
    })
    ds = SyntheticEchoDataset(cfg, num_samples=2)
    batch = next(ds.batches(2, shuffle=False))
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    return cfg, eng, state, batch


def test_checkpoint_roundtrip(tmp_path):
    cfg, eng, state, batch = small()
    mgr = CheckpointManager(str(tmp_path), "exp1")
    state, _ = eng.train_step(state, batch)
    mgr.save(1, state, aux={"bin_centers": np.arange(4.0)})
    state, _ = eng.train_step(state, batch)
    mgr.save(2, state)
    mgr.wait()
    assert mgr.latest_epoch() == 2

    restored, aux, epoch = mgr.restore(jax.tree_util.tree_map(np.zeros_like, state), epoch=1)
    assert epoch == 1
    assert int(restored.step) == 1
    assert aux is not None and np.allclose(aux["bin_centers"], np.arange(4.0))
    # optimizer state restored too (the reference's train.py forgot this)
    opt_leaves = jax.tree_util.tree_leaves(restored.opt_state)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in opt_leaves)
    mgr.close()


def test_best_tracker():
    bt = BestTracker("rmse")
    assert bt.update(1, {"rmse": 5.0})
    assert not bt.update(2, {"rmse": 6.0})
    assert bt.update(3, {"rmse": 4.0})
    assert bt.best_epoch == 3
    bt2 = BestTracker("delta1")
    assert bt2.update(1, {"delta1": 0.3})
    assert bt2.update(2, {"delta1": 0.5})
    assert not bt2.update(3, {"delta1": 0.4})


def test_metric_logger_jsonl(tmp_path):
    lg = MetricLogger(str(tmp_path), "expz")
    lg.log({"train/loss": 1.5, "val/rmse": 3.0}, step=1)
    lg.close()
    content = (tmp_path / "expz.jsonl").read_text()
    assert '"train/loss": 1.5' in content


def test_visualizations(tmp_path):
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 30, size=(2, 64, 64, 1)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 1, gt.shape), 0, 30).astype(np.float32)
    p1 = save_depth_comparison(gt[0], pred[0], str(tmp_path / "cmp.png"))
    p2 = save_batch_visualization(gt, pred, str(tmp_path / "batch.png"))
    p3 = save_decomposition(
        {"base": gt[0], "residual": pred[0] - gt[0], "final": pred[0], "GT": gt[0]},
        str(tmp_path / "decomp.png"),
    )
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_distillation_panel(tmp_path):
    from audiodepth_tpu.obs.visualize import save_distillation_panel

    rng = np.random.default_rng(1)
    gt = rng.uniform(0, 30, size=(64, 64, 1)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 1, gt.shape), 0, 30).astype(np.float32)
    centers = np.sort(rng.uniform(0, 30, size=16)).astype(np.float32)
    p = save_distillation_panel(gt, pred, pred, centers, centers,
                                str(tmp_path / "dist.png"))
    assert os.path.getsize(p) > 1000


def test_log_image_records_path(tmp_path):
    """log_image (wandb.Image parity, train.py:861-871) records the PNG
    path in the JSONL stream when wandb is offline/absent."""
    lg = MetricLogger(str(tmp_path), "imglog")
    png = tmp_path / "vis.png"
    png.write_bytes(b"\x89PNG")
    lg.log_image("val/visualization", str(png), step=3)
    lg.close()
    text = next(tmp_path.glob("*.jsonl")).read_text()
    assert "val/visualization" in text and "vis.png" in text
