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


def test_eval_step_pred_matches_separate_paths():
    """eval_step_pred (one-graph metrics + pred/gt meters, used by the eval
    CLI for --visualize/--save_tensors) must agree with eval_step and the
    standalone predict_meters forward."""
    from audiodepth_tpu.data.codec import decode_batch

    cfg = small_cfg()
    ds = SyntheticEchoDataset(cfg, num_samples=8, seed=5)
    batch = next(ds.batches(4, shuffle=False))
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), batch)

    out, pred_m, gt_m = eng.eval_step_pred(state, batch)
    ref = eng.eval_step(state, batch)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)

    units = 1.0 if cfg.dataset.depth_norm else float(cfg.dataset.max_depth)
    dev = decode_batch(eng.put_batch(batch), units)
    np.testing.assert_allclose(np.asarray(pred_m),
                               np.asarray(eng.predict_meters(state, dev)),
                               rtol=1e-5, atol=1e-6)
    gt_ref = np.asarray(dev["depth"])
    if cfg.dataset.depth_norm:
        gt_ref = gt_ref * cfg.dataset.max_depth
    np.testing.assert_allclose(np.asarray(gt_m), gt_ref, rtol=1e-6, atol=1e-7)


def test_eval_step_pred_ragged_valid_mask():
    """A padded ragged tail returns a _valid mask whose False rows must be
    dropped from pred/gt before visualization/tensor artifacts."""
    from audiodepth_tpu.parallel.mesh import pad_batch_to

    cfg = small_cfg()
    ds = SyntheticEchoDataset(cfg, num_samples=3, seed=6)
    tail = next(ds.batches(3, shuffle=False))
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), next(ds.batches(3, shuffle=False)))

    padded = pad_batch_to(dict(tail), 4)
    out, pred_m, gt_m = eng.eval_step_pred(state, padded)
    valid = np.asarray(out["_valid"]).astype(bool)
    assert valid.tolist() == [True, True, True, False]
    assert pred_m.shape[0] == 4 and gt_m.shape[0] == 4
    # the real rows equal the unpadded forward
    _, pred_ref, gt_ref = eng.eval_step_pred(state, tail)
    np.testing.assert_allclose(np.asarray(pred_m)[valid], np.asarray(pred_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt_m)[valid], np.asarray(gt_ref),
                               rtol=1e-6, atol=1e-7)


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


def test_fit_checkpoints_final_epoch(tmp_path):
    """A completed run must serialize its final epoch even off the
    saving_checkpoints cadence (the reference leaves tail epochs unsaved,
    train.py:1005-1021) — otherwise epochs=1 with the default cadence of 10
    produces NO checkpoint at all."""
    from audiodepth_tpu.ckpt import CheckpointManager

    cfg = small_cfg("batvisionv2", **{"mode.saving_checkpoints": 10,
                                      "mode.validation": False})
    ds = SyntheticEchoDataset(cfg, num_samples=8, seed=7)
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), next(ds.batches(4, shuffle=False)))
    mgr = CheckpointManager(str(tmp_path / "ck"), "finalsave")
    out = eng.fit(state, lambda: ds.batches(4, shuffle=False, drop_last=True),
                  val_batches=None, epochs=3, ckpt_manager=mgr)
    mgr.wait()
    assert mgr.latest_epoch() == 3
    restored, _, epoch = mgr.restore(
        eng.init_state(jax.random.PRNGKey(0), next(ds.batches(4, shuffle=False))))
    assert epoch == 3 and int(restored.step) == int(out.step)
    mgr.close()


def test_preemption_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-epoch → fit stops at the step boundary, discards the
    partial epoch, checkpoints the last COMPLETED epoch, and restores the
    default handler. Resume continues from that epoch."""
    import os
    import signal

    from audiodepth_tpu.ckpt import CheckpointManager

    cfg = small_cfg("batvisionv2", **{"mode.saving_checkpoints": 100})
    ds = SyntheticEchoDataset(cfg, num_samples=8, seed=5)
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), next(ds.batches(4, shuffle=False)))
    mgr = CheckpointManager(str(tmp_path / "ck"), "preempt")

    calls = {"n": 0}

    def train_batches():
        calls["n"] += 1
        def gen():
            for i, b in enumerate(ds.batches(4, shuffle=False, drop_last=True)):
                if calls["n"] == 4 and i == 1:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b
        return gen()

    prev = signal.getsignal(signal.SIGTERM)
    out = eng.fit(state, train_batches, val_batches=None, epochs=6,
                  ckpt_manager=mgr)
    assert eng.preempted
    # the partial epoch 4 was discarded: 3 epochs x 2 steps
    assert int(out.step) == 6
    assert mgr.latest_epoch() == 3
    # the handler was restored (not left pointing into the finished fit)
    assert signal.getsignal(signal.SIGTERM) is not prev or prev in (
        signal.SIG_DFL, signal.default_int_handler)
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, prev)

    # resume: restore template → epoch 3, so training restarts at epoch 4
    template = eng.init_state(jax.random.PRNGKey(0), next(ds.batches(4, shuffle=False)))
    restored, _, epoch = mgr.restore(template)
    assert epoch == 3 and int(restored.step) == 6
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(out.params)[0]))
    mgr.close()


def test_preemption_after_partial_epoch_step(tmp_path):
    """SIGTERM landing AFTER >=1 train_step of the partial epoch — the
    realistic preemption. train_step donates its input buffers, so the
    retained epoch-boundary state must be a snapshot (engine._snapshot_state)
    or the save reads deleted arrays and nothing is checkpointed."""
    import os
    import signal

    from audiodepth_tpu.ckpt import CheckpointManager

    cfg = small_cfg("batvisionv2", **{"mode.saving_checkpoints": 100})
    ds = SyntheticEchoDataset(cfg, num_samples=8, seed=5)
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), next(ds.batches(4, shuffle=False)))
    mgr = CheckpointManager(str(tmp_path / "ck"), "preempt2")

    # fire the signal only once the first step of epoch 3 (epoch arg 2.0)
    # has COMPLETED, guaranteeing the epoch-2 boundary state was already
    # donated back into the jitted step before the save runs
    orig_step = eng.train_step
    fired = {"done": False}

    def stepped(st, batch, epoch=0.0):
        out = orig_step(st, batch, epoch=epoch)
        if epoch >= 2.0 and not fired["done"]:
            fired["done"] = True
            os.kill(os.getpid(), signal.SIGTERM)
        return out

    eng.train_step = stepped
    try:
        out = eng.fit(state, lambda: ds.batches(4, shuffle=False, drop_last=True),
                      val_batches=None, epochs=6, ckpt_manager=mgr)
    finally:
        eng.train_step = orig_step
    assert eng.preempted
    assert fired["done"]
    # partial epoch 3 discarded; epochs 1-2 completed = 4 steps
    assert int(out.step) == 4
    assert mgr.latest_epoch() == 2
    template = eng.init_state(jax.random.PRNGKey(0), next(ds.batches(4, shuffle=False)))
    restored, _, epoch = mgr.restore(template)
    assert epoch == 2 and int(restored.step) == 4
    mgr.close()


def test_preemption_inside_first_epoch_returns_live_state(tmp_path):
    """SIGTERM after >=1 step of the FIRST epoch: no epoch completed, so
    nothing is checkpointed — but fit must return the initial state as a
    live snapshot, not the caller's buffers that the first train_step
    donated (reading those raises a deleted-array error)."""
    import os
    import signal

    from audiodepth_tpu.ckpt import CheckpointManager

    cfg = small_cfg("batvisionv2", **{"mode.saving_checkpoints": 100})
    ds = SyntheticEchoDataset(cfg, num_samples=8, seed=5)
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), next(ds.batches(4, shuffle=False)))
    mgr = CheckpointManager(str(tmp_path / "ck"), "preempt3")

    orig_step = eng.train_step
    fired = {"done": False}

    def stepped(st, batch, epoch=0.0):
        out = orig_step(st, batch, epoch=epoch)
        if not fired["done"]:
            fired["done"] = True
            os.kill(os.getpid(), signal.SIGTERM)
        return out

    eng.train_step = stepped
    try:
        out = eng.fit(state, lambda: ds.batches(4, shuffle=False, drop_last=True),
                      val_batches=None, epochs=6, ckpt_manager=mgr)
    finally:
        eng.train_step = orig_step
    assert eng.preempted and fired["done"]
    assert mgr.latest_epoch() is None  # nothing completed, nothing saved
    # the returned state is the pre-training snapshot, with READABLE buffers
    assert int(out.step) == 0
    leaf = np.asarray(jax.tree_util.tree_leaves(out.params)[0])
    assert np.isfinite(leaf).all()
    mgr.close()
