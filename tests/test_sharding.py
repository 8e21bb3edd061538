"""Data-parallel sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.models import make_task
from audiodepth_tpu.parallel.mesh import make_mesh, shard_batch, batch_sharding
from audiodepth_tpu.train import Engine


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_dp_train_step_sharded_runs_and_matches_single():
    over = {
        "model.generator": "unet_128",
        "model.ngf": 4,
        "dataset.images_size": 128,
        "mode.batch_size": 8,
        "mode.compute_dtype": "float32",
    }
    cfg = load_config("batvisionv2", "train", "t", "unet_baseline", overrides=over)
    ds = SyntheticEchoDataset(cfg, num_samples=8, seed=0)
    batch = next(ds.batches(8, shuffle=False))
    task = make_task(cfg)

    # single-device
    eng1 = Engine(cfg, task)
    s1 = eng1.init_state(jax.random.PRNGKey(0), batch)
    s1, m1 = eng1.train_step(s1, batch)

    # 8-way data parallel
    mesh = make_mesh()
    eng8 = Engine(cfg, task, mesh=mesh)
    s8 = eng8.init_state(jax.random.PRNGKey(0), batch)
    s8, m8 = eng8.train_step(s8, batch)

    # same global computation → same loss (fp32 tolerance; BN stats are
    # global-batch on both paths because the reduction spans the whole batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    # params should agree after one step
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), rtol=1e-3, atol=1e-5)


def test_batch_sharding_layout():
    mesh = make_mesh()
    x = np.zeros((16, 4), np.float32)
    sharded = jax.device_put(x, batch_sharding(mesh))
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (2, 4)


def test_device_cache_sharded_over_mesh():
    """--device_cache under a mesh shards the cached split row-wise over the
    data axis (it used to pin everything to device 0); gathers stay exact,
    including a row count that does not divide the axis."""
    from audiodepth_tpu.data.codec import decode_batch
    from audiodepth_tpu.data.device_cache import DeviceDatasetCache
    from audiodepth_tpu.parallel.mesh import batch_sharding

    cfg = load_config("batvisionv2", "train", "t", "unet_baseline",
                      overrides={"dataset.images_size": 64})
    ds = SyntheticEchoDataset(cfg, num_samples=13, seed=9)  # 13 % 8 != 0
    mesh = make_mesh()
    cache = DeviceDatasetCache(ds, max_depth_units=30.0,
                               sharding=batch_sharding(mesh))
    assert len(cache.arrays["depth"].sharding.device_set) == 8
    batches = list(cache.batches(4, shuffle=False, drop_last=False))
    assert sum(next(iter(b.values())).shape[0] for b in batches) == 13
    dec = decode_batch({k: np.asarray(v) for k, v in batches[0].items()}, 30.0)
    ref = ds.sample(0)
    np.testing.assert_allclose(dec["depth"][0], ref["depth"],
                               atol=30.0 / 65535 * 1.01)
    np.testing.assert_allclose(dec["waveform"][0], ref["waveform"], atol=2e-4)


def test_vis_callback_pred_row_aligned_with_ragged_val_batch():
    """fit()'s first-val-batch diagnostics run through put_batch, which pads
    ragged batches on a mesh; the callback must still receive a pred
    row-aligned with the UNPADDED batch it is handed."""
    over = {
        "model.generator": "unet_128",
        "model.ngf": 4,
        "dataset.images_size": 128,
        "mode.batch_size": 8,
        "mode.compute_dtype": "float32",
        "mode.validation_iter": 1,
    }
    cfg = load_config("batvisionv2", "train", "t", "unet_baseline", overrides=over)
    train_ds = SyntheticEchoDataset(cfg, num_samples=8, seed=0)
    val_ds = SyntheticEchoDataset(cfg, num_samples=5, seed=1)  # ragged vs axis 8
    task = make_task(cfg)
    eng = Engine(cfg, task, mesh=make_mesh())
    state = eng.init_state(jax.random.PRNGKey(0), next(train_ds.batches(8, shuffle=False)))

    seen = []

    def vis(epoch, first, pred):
        seen.append((next(iter(first.values())).shape[0], pred.shape[0]))

    eng.fit(state, lambda: train_ds.batches(8, shuffle=False, drop_last=True),
            val_batches=lambda: val_ds.batches(8, shuffle=False, drop_last=False),
            epochs=1, vis_callback=vis)
    assert seen == [(5, 5)]


def test_pad_batch_to_preserves_existing_valid_mask():
    """Re-padding an already-padded batch must keep its pad rows invalid
    (repeating row 0's mask value would mark them real)."""
    from audiodepth_tpu.parallel.mesh import pad_batch_to

    batch = {"x": np.arange(3, dtype=np.float32).reshape(3, 1)}
    once = pad_batch_to(batch, 4)
    assert once["_valid"].tolist() == [1.0, 1.0, 1.0, 0.0]
    twice = pad_batch_to(once, 8)
    assert twice["_valid"].tolist() == [1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    # no-op pad keeps the mask too
    same = pad_batch_to(once, 4)
    assert same["_valid"].tolist() == [1.0, 1.0, 1.0, 0.0]


def test_ragged_eval_tail_padded_and_masked():
    """drop_last=False tails smaller than the data axis are padded with a
    _valid mask and sharded; evaluate() means match the unsharded engine
    exactly (pad rows contribute nothing)."""
    over = {
        "model.generator": "unet_128",
        "model.ngf": 4,
        "dataset.images_size": 128,
        "mode.batch_size": 8,
        "mode.compute_dtype": "float32",
    }
    cfg = load_config("batvisionv2", "train", "t", "unet_baseline", overrides=over)
    ds = SyntheticEchoDataset(cfg, num_samples=13, seed=0)  # 8 + ragged 5
    batch = next(ds.batches(8, shuffle=False))
    task = make_task(cfg)

    eng1 = Engine(cfg, task)
    s1 = eng1.init_state(jax.random.PRNGKey(0), batch)
    ref = eng1.evaluate(s1, ds.batches(8, shuffle=False, drop_last=False))

    mesh = make_mesh()
    eng8 = Engine(cfg, task, mesh=mesh)
    s8 = eng8.init_state(jax.random.PRNGKey(0), batch)
    got = eng8.evaluate(s8, ds.batches(8, shuffle=False, drop_last=False))

    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)


def test_train_step_rejects_padded_batch():
    over = {
        "model.generator": "unet_128",
        "model.ngf": 4,
        "dataset.images_size": 128,
        "mode.batch_size": 8,
        "mode.compute_dtype": "float32",
    }
    cfg = load_config("batvisionv2", "train", "t", "unet_baseline", overrides=over)
    ds = SyntheticEchoDataset(cfg, num_samples=8, seed=0)
    batch = dict(next(ds.batches(8, shuffle=False)))
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    batch["_valid"] = np.ones(8, np.float32)
    with pytest.raises(ValueError, match="eval-only"):
        eng.train_step(state, batch)
