"""End-to-end engine tests: overfit-one-batch and validation metrics."""

import jax
import numpy as np
import pytest

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.models import make_task
from audiodepth_tpu.train import Engine


def small_cfg(dataset="batvisionv2", **over):
    overrides = {
        "model.generator": "unet_128",
        "model.ngf": 8,
        "dataset.images_size": 128,
        "mode.batch_size": 4,
        "mode.learning_rate": 0.002,
        "mode.compute_dtype": "float32",
    }
    overrides.update(over)
    return load_config(dataset, "train", "t", "unet_baseline", overrides=overrides)


@pytest.mark.parametrize("dataset", ["batvisionv2", "batvisionv1"])
def test_overfit_one_batch(dataset):
    cfg = small_cfg(dataset)
    ds = SyntheticEchoDataset(cfg, num_samples=4, seed=1)
    batch = next(ds.batches(4, shuffle=False))
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), batch)

    first = None
    loss = None
    for i in range(30):
        state, m = eng.train_step(state, batch, epoch=0.0)
        loss = float(m["loss"])
        if first is None:
            first = loss
        assert np.isfinite(loss)
    assert loss < first * 0.7, (first, loss)


def test_eval_metrics_shapes_and_sanity():
    cfg = small_cfg()
    ds = SyntheticEchoDataset(cfg, num_samples=8, seed=2)
    batch = next(ds.batches(4, shuffle=False))
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    out = eng.eval_step(state, batch)
    for k in ("abs_rel", "rmse", "delta1", "mae", "loss"):
        assert out[k].shape == (4,)
        assert np.isfinite(np.asarray(out[k])).all()
    # rmse of an untrained net on 30m-range depth should be nonzero
    assert float(np.mean(out["rmse"])) > 0.0


def test_val_loss_batch_size_invariant():
    """The eval 'loss' is per-sample masked L1, so the split mean must not
    depend on batching (ragged drop_last=False tails included)."""
    cfg = small_cfg()
    ds = SyntheticEchoDataset(cfg, num_samples=3, seed=4)
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), next(ds.batches(1, shuffle=False)))
    m1 = eng.evaluate(state, ds.batches(1, shuffle=False, drop_last=False))
    m2 = eng.evaluate(state, ds.batches(2, shuffle=False, drop_last=False))
    assert m1["loss"] == pytest.approx(m2["loss"], rel=1e-4)


def test_evaluate_aggregates():
    cfg = small_cfg()
    ds = SyntheticEchoDataset(cfg, num_samples=8, seed=3)
    task = make_task(cfg)
    eng = Engine(cfg, task)
    batch = next(ds.batches(4, shuffle=False))
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    means = eng.evaluate(state, ds.batches(4, shuffle=False))
    assert set(means) >= {"abs_rel", "rmse", "delta1", "loss"}
