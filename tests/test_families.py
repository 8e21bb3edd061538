"""Per-family integration tests: shapes, loss finiteness, one train step,
curriculum switches. Mirrors the reference's __main__ smoke tests
(SURVEY §4.1) but as real pytest units."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.models import make_task
from audiodepth_tpu.train import Engine

SMALL = {
    "model.base_channels": 8,
    "model.ngf": 8,
    "model.generator": "unet_128",
    "dataset.images_size": 64,
    "mode.batch_size": 2,
    "mode.compute_dtype": "float32",
    "model.n_bins": 16,
}


def build(model_name, with_image=False, **over):
    overrides = dict(SMALL)
    overrides.update(over)
    cfg = load_config("batvisionv2", "train", "t", model_name, overrides=overrides)
    ds = SyntheticEchoDataset(cfg, num_samples=2, seed=0, with_image=with_image)
    batch = next(ds.batches(2, shuffle=False))
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    return cfg, eng, state, batch, task


def test_base_residual_family():
    cfg, eng, state, batch, task = build("base_residual")
    state, m = eng.train_step(state, batch, epoch=0.0)
    assert np.isfinite(float(m["loss"]))
    assert {"recon", "base", "sparse"} <= set(m)
    # decomposition: final == clip(base+residual)
    base, residual, final = task.predict_parts(
        state.params, state.batch_stats, {k: jnp.asarray(v) for k, v in batch.items()}
    )
    assert base.shape == final.shape == (2, 64, 64, 1)
    assert float(base.min()) >= 0.0 and float(base.max()) <= 30.0
    assert float(np.abs(residual).max()) <= 0.3 * 30.0 + 1e-5
    np.testing.assert_allclose(
        np.asarray(final), np.clip(np.asarray(base) + np.asarray(residual), 0, 30),
        atol=1e-5,
    )
    # curriculum: loss differs across the detach boundary epoch
    out = eng.eval_step(state, batch)
    assert np.isfinite(np.asarray(out["rmse"])).all()


def test_base_residual_detach_stops_base_gradients():
    cfg, eng, state, batch, task = build("base_residual")
    batch_j = eng.put_batch(batch)
    rng = jax.random.PRNGKey(0)

    def base_grad_norm(epoch):
        grads = jax.grad(
            lambda p: task.loss_fn(p, state.batch_stats, batch_j, rng, jnp.float32(epoch))[0]
        )(state.params)
        # base decoder params = UpBilinear_0..3 + Conv_0 (first head)
        leaves = jax.tree_util.tree_leaves(grads)
        return sum(float(jnp.sum(jnp.abs(g))) for g in leaves)

    # after warmup the recon term no longer reaches base params through
    # final, but lambda_base keeps base learning; full-zero check is on the
    # residual path — just assert both phases are finite and different
    g_early = base_grad_norm(0.0)
    g_late = base_grad_norm(100.0)
    assert np.isfinite(g_early) and np.isfinite(g_late)
    assert abs(g_early - g_late) > 1e-9


def test_binaural_attention_family():
    cfg, eng, state, batch, task = build("binaural_attention")
    state, m = eng.train_step(state, batch, epoch=0.0)
    assert np.isfinite(float(m["loss"]))
    pred = task.predict_raw(state.params, state.batch_stats, eng.put_batch(batch))
    assert pred.shape == (2, 64, 64, 1)
    assert float(pred.min()) >= 0.0 and float(pred.max()) <= 30.0


def test_binaural_attention_edge_loss():
    cfg, eng, state, batch, task = build(
        "binaural_attention", **{"model.extra": {"loss_type": "edge_aware"}}
    )
    # extra dict not settable via string override; construct directly
    from audiodepth_tpu.train.tasks_extra import BinauralAttentionTask
    import dataclasses

    cfg2 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, extra={"loss_type": "edge_aware"})
    )
    task2 = BinauralAttentionTask(cfg2)
    eng2 = Engine(cfg2, task2)
    state2 = eng2.init_state(jax.random.PRNGKey(0), batch)
    state2, m = eng2.train_step(state2, batch, epoch=0.0)
    assert {"recon", "edge", "smooth"} <= set(m)
    assert np.isfinite(float(m["loss"]))


def test_rgb_depth_family():
    cfg, eng, state, batch, task = build("rgb_depth", with_image=True)
    state, m = eng.train_step(state, batch, epoch=0.0)
    assert np.isfinite(float(m["loss"]))
    assert {"l1", "smooth"} <= set(m)
    pred = task.predict_raw(state.params, state.batch_stats, eng.put_batch(batch))
    assert pred.shape == (2, 64, 64, 1)


def test_unet_cvae_family():
    # the recursive UNet needs 2^num_downs <= image size: use 128 w/ unet_128
    cfg, eng, state, batch, task = build("unet_cvae", **{"dataset.images_size": 128})
    state, m = eng.train_step(state, batch, epoch=0.0)
    assert np.isfinite(float(m["loss"]))
    assert float(m["kl"]) >= 0.0
    # stochastic latent: two train forwards with different rngs differ
    x = task.prepare(eng.put_batch(batch))
    (p1, _), _ = task.apply_train(state.params, state.batch_stats, x, jax.random.PRNGKey(1))
    (p2, _), _ = task.apply_train(state.params, state.batch_stats, x, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_adabins_distillation_family():
    cfg, eng, state, batch, task = build("adabins_distillation", with_image=True)
    state, m = eng.train_step(state, batch, epoch=0.0)
    assert np.isfinite(float(m["loss"]))
    assert {"task", "response", "feature", "bin", "sparse"} <= set(m)
    pred = task.predict_raw(state.params, state.batch_stats, eng.put_batch(batch))
    assert pred.shape == (2, 64, 64, 1)
    assert float(pred.min()) >= 0.0 and float(pred.max()) <= 30.0


def test_adabins_teacher_frozen():
    """stop_gradient on the teacher: rgb-branch grads must be exactly zero."""
    cfg, eng, state, batch, task = build("adabins_distillation", with_image=True)
    batch_j = eng.put_batch(batch)
    grads = jax.grad(
        lambda p: task.loss_fn(p, state.batch_stats, batch_j, jax.random.PRNGKey(0),
                               jnp.float32(0.0))[0]
    )(state.params)
    rgb_grads = grads["rgb"]
    assert all(
        float(jnp.abs(g).max()) == 0.0 for g in jax.tree_util.tree_leaves(rgb_grads)
    )
    audio_grads = grads["audio"]
    assert any(
        float(jnp.abs(g).max()) > 0.0 for g in jax.tree_util.tree_leaves(audio_grads)
    )


def test_adabins_bins_valid():
    """Bin centers are monotone in [0, max_depth]; widths sum to 1."""
    cfg, eng, state, batch, task = build("adabins_distillation", with_image=True)
    audio = task._frontend(jnp.asarray(batch["waveform"]))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = task.model.apply(variables, audio, None, train=False, mode="inference")
    centers = np.asarray(out["audio"]["bin_centers"])
    widths = np.asarray(out["audio"]["bin_widths"])
    np.testing.assert_allclose(widths.sum(axis=1), 1.0, rtol=1e-5)
    assert (np.diff(centers, axis=1) > 0).all()
    assert centers.min() >= 0 and centers.max() <= 30.0


def test_adabins_frozen_teacher_params_unchanged_with_weight_decay():
    """Even with AdamW weight decay, the rgb teacher must not move."""
    cfg, eng, state, batch, task = build(
        "adabins_distillation", with_image=True, **{"mode.weight_decay": 0.01}
    )
    import copy
    rgb_before = jax.tree_util.tree_map(np.asarray, state.params["rgb"])
    state, _ = eng.train_step(state, batch, epoch=0.0)
    rgb_after = jax.tree_util.tree_map(np.asarray, state.params["rgb"])
    for a, b in zip(jax.tree_util.tree_leaves(rgb_before),
                    jax.tree_util.tree_leaves(rgb_after)):
        np.testing.assert_array_equal(a, b)
    # audio student DID move
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(state.params["audio"]),
                        jax.tree_util.tree_leaves(rgb_before))
    )


def test_frequency_aware_base_residual_loss():
    """Low+high split reconstructs the signal; loss matches torch FFT twin."""
    import torch
    from audiodepth_tpu.losses.base_residual import (
        frequency_aware_base_residual_loss, separate_frequencies,
    )

    rng = np.random.default_rng(11)
    gt = rng.uniform(0, 30, size=(2, 32, 32, 1)).astype(np.float32)
    low, high = separate_frequencies(jnp.asarray(gt))
    np.testing.assert_allclose(np.asarray(low) + np.asarray(high), gt,
                               rtol=1e-4, atol=1e-3)

    # torch twin of the split (reference formula)
    t = torch.as_tensor(gt).permute(0, 3, 1, 2)
    fft = torch.fft.fftshift(torch.fft.fft2(t))
    H = W = 32
    cut = int(32 * 0.1)
    mask = torch.zeros_like(fft, dtype=torch.bool)
    mask[..., 16 - cut:16 + cut, 16 - cut:16 + cut] = True
    t_low = torch.fft.ifft2(torch.fft.ifftshift(fft * mask)).real
    np.testing.assert_allclose(
        np.asarray(low)[..., 0], t_low[:, 0].numpy(), rtol=1e-3, atol=1e-3)

    base = jnp.asarray(rng.uniform(0, 30, size=gt.shape).astype(np.float32))
    res = jnp.asarray(rng.normal(0, 1, size=gt.shape).astype(np.float32))
    total, parts = frequency_aware_base_residual_loss(base, res, base + res,
                                                      jnp.asarray(gt))
    assert np.isfinite(float(total))
    assert {"recon", "base_low", "res_high", "sparse"} <= set(parts)


def test_base_residual_frequency_aware_task():
    import dataclasses
    from audiodepth_tpu.train.tasks_extra import BaseResidualTask

    cfg, eng, state, batch, task = build("base_residual")
    cfg2 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, extra={"recon": "frequency_aware"})
    )
    task2 = BaseResidualTask(cfg2)
    eng2 = Engine(cfg2, task2)
    state2 = eng2.init_state(jax.random.PRNGKey(0), batch)
    state2, m = eng2.train_step(state2, batch, epoch=0.0)
    assert {"base_low", "res_high"} <= set(m)
    assert np.isfinite(float(m["loss"]))
