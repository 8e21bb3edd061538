"""Halo-exchange sharded STFT vs the single-device op on the 8-dev CPU mesh."""

import numpy as np
import pytest

from audiodepth_tpu.ops.stft import magnitude_stft
from audiodepth_tpu.parallel.mesh import make_mesh
from audiodepth_tpu.parallel.sharded_stft import sharded_magnitude_stft


@pytest.mark.parametrize("length", [7782, 4096, 2048])
def test_sharded_matches_single_device(length):
    rng = np.random.default_rng(0)
    wave = rng.normal(size=(2, 2, length)).astype(np.float32)
    mesh = make_mesh()
    ref = np.asarray(magnitude_stft(wave, 512, 64, 16))
    out = np.asarray(sharded_magnitude_stft(wave, mesh, "data", 512, 64, 16))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sharded_small_mesh():
    rng = np.random.default_rng(1)
    wave = rng.normal(size=(1, 2, 3000)).astype(np.float32)
    mesh = make_mesh(4)
    ref = np.asarray(magnitude_stft(wave, 512, 64, 16))
    out = np.asarray(sharded_magnitude_stft(wave, mesh, "data", 512, 64, 16))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sharded_stft_rejects_chunks_shorter_than_halo():
    """A shard chunk shorter than the win-hop halo would clamp-gather
    duplicated edge samples; the op must refuse loudly instead."""
    wave = np.zeros((1, 2, 300), np.float32)  # 19 frames over 8 shards → 3
    # frames/shard = 48 samples = halo: OK at exactly the boundary
    mesh = make_mesh()
    sharded_magnitude_stft(wave, mesh, "data", 512, 64, 16)
    with pytest.raises(ValueError, match="win-hop"):
        # 150 samples → 10 frames → 2/shard → 32 < 48
        sharded_magnitude_stft(np.zeros((1, 2, 150), np.float32),
                               mesh, "data", 512, 64, 16)


def test_sharded_stft_wired_through_engine():
    """Production wiring (SURVEY §2.6 SP row): under a DP×SP mesh, the
    plain-STFT front end runs through the halo-exchange sharded STFT
    inside the jitted train step — same loss as the mesh-free engine."""
    import jax
    from audiodepth_tpu.configs import load_config
    from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
    from audiodepth_tpu.models import make_task
    from audiodepth_tpu.parallel.mesh import make_mesh
    from audiodepth_tpu.train import Engine

    over = {
        # plain (non-mel) spectrogram → the sharded-STFT dispatch condition
        "dataset.audio_format": "spectrogram",
        "model.model_type": "lite", "model.n_bins": 8,
        "model.base_channels": 8, "dataset.images_size": 64,
        "mode.batch_size": 4, "mode.compute_dtype": "float32",
    }
    cfg = load_config("batvisionv2", "train", "spstft", "coarse_depth",
                      overrides=over)
    ds = SyntheticEchoDataset(cfg, num_samples=4, seed=0)
    from audiodepth_tpu.data.bins import add_bins_to_batch

    batch = next(ds.batches(4, shuffle=False))

    task1 = make_task(cfg)
    batch = add_bins_to_batch(batch, task1.bin_edges, cfg.dataset.max_depth,
                              cfg.dataset.depth_norm)
    eng1 = Engine(cfg, task1)
    s1 = eng1.init_state(jax.random.PRNGKey(0), batch)
    s1, m1 = eng1.train_step(s1, batch)

    mesh = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    task2 = make_task(cfg)
    eng2 = Engine(cfg, task2, mesh=mesh)
    # Engine must have swapped the front end to the sharded one
    assert task2._frontend is not task1._frontend
    s2 = eng2.init_state(jax.random.PRNGKey(0), batch)
    s2, m2 = eng2.train_step(s2, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
