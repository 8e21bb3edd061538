"""Transport codec round-trip + prefetch + engine integration."""

import jax
import numpy as np

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.codec import batch_is_compact, decode_batch, encode_batch
from audiodepth_tpu.data.prefetch import device_prefetch
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.models import make_task
from audiodepth_tpu.train import Engine


def test_waveform_roundtrip_is_pcm_exact():
    # int16 PCM values survive encode/decode exactly
    pcm = np.arange(-32768, 32768, 7, dtype=np.int16)
    wave = pcm.astype(np.float32) / 32768.0
    batch = {"waveform": wave[None, None, :]}
    enc = encode_batch(batch, 30.0)
    assert enc["waveform"].dtype == np.int16
    np.testing.assert_array_equal(enc["waveform"][0, 0], pcm)
    dec = decode_batch({k: np.asarray(v) for k, v in enc.items()}, 30.0)
    np.testing.assert_array_equal(np.asarray(dec["waveform"])[0, 0], wave)


def test_waveform_above_unit_range_not_clipped():
    """Raw .npy waveforms (BV1) can exceed [-1,1]; the per-sample scale
    factor must preserve them instead of hard-clipping to +/-1."""
    rng = np.random.default_rng(3)
    wave = (rng.normal(size=(2, 2, 4000)) * 5.0).astype(np.float32)
    enc = encode_batch({"waveform": wave}, 30.0)
    assert enc["waveform"].dtype == np.int16
    assert enc["waveform_scale"].shape == (2,)
    dec = decode_batch({k: np.asarray(v) for k, v in enc.items()}, 30.0)
    assert "waveform_scale" not in dec
    got = np.asarray(dec["waveform"])
    peak = np.abs(wave).max()
    assert np.abs(got - wave).max() < peak / 32768 * 1.01  # 1 LSB at scale
    # in-range audio keeps scale 1.0 (PCM-exact path unchanged)
    pcm = np.clip(rng.normal(size=(1, 2, 100)), -0.99, 0.99).astype(np.float32)
    assert encode_batch({"waveform": pcm}, 30.0)["waveform_scale"].tolist() == [1.0]


def test_nonfinite_depth_encodes_to_invalid_zero():
    """NaN/Inf depth pixels map to 0 (the invalid-mask value), matching the
    native loader's scrub and the reference's BV1 scrub — never an
    undefined float→uint16 cast."""
    depth = np.array([[np.nan, np.inf], [-np.inf, 3.0]],
                     np.float32).reshape(1, 2, 2, 1)
    enc = encode_batch({"depth": depth}, 30.0)
    dec = np.asarray(decode_batch({k: np.asarray(v) for k, v in enc.items()}, 30.0)["depth"])
    assert dec[0, 0, 0, 0] == 0.0 and dec[0, 0, 1, 0] == 0.0 and dec[0, 1, 0, 0] == 0.0
    assert abs(dec[0, 1, 1, 0] - 3.0) < 30.0 / 65535.0


def test_depth_roundtrip_submillimeter():
    rng = np.random.default_rng(0)
    depth = rng.uniform(0, 30, size=(1, 16, 16, 1)).astype(np.float32)
    enc = encode_batch({"depth": depth}, 30.0)
    assert enc["depth"].dtype == np.uint16
    dec = decode_batch({k: np.asarray(v) for k, v in enc.items()}, 30.0)
    err = np.abs(np.asarray(dec["depth"]) - depth).max()
    assert err < 30.0 / 65535.0  # sub-quantum
    # zeros stay exactly zero (valid-mask semantics preserved)
    enc0 = encode_batch({"depth": np.zeros((1, 4, 4, 1), np.float32)}, 30.0)
    dec0 = decode_batch({k: np.asarray(v) for k, v in enc0.items()}, 30.0)
    assert np.asarray(dec0["depth"]).max() == 0.0


def test_compact_batch_size_reduction():
    cfg = load_config("batvisionv2", overrides={"dataset.images_size": 64})
    ds = SyntheticEchoDataset(cfg, num_samples=2)
    batch = next(ds.batches(2, shuffle=False))
    enc = encode_batch(batch, 30.0)
    raw = sum(v.nbytes for v in batch.values())
    packed = sum(v.nbytes for v in enc.values())
    assert packed < raw / 1.9
    assert batch_is_compact(enc) and not batch_is_compact(batch)


def test_prefetch_yields_all_batches_on_device():
    cfg = load_config("batvisionv2", overrides={"dataset.images_size": 64})
    ds = SyntheticEchoDataset(cfg, num_samples=8)
    batches = list(device_prefetch(ds.batches(2, shuffle=False), encode_units=30.0))
    assert len(batches) == 4
    for b in batches:
        assert all(isinstance(v, jax.Array) for v in b.values())
        assert b["waveform"].dtype == np.int16


def test_engine_trains_on_compact_batches():
    cfg = load_config("batvisionv2", overrides={
        "model.generator": "unet_128", "model.ngf": 4,
        "dataset.images_size": 128, "mode.batch_size": 2,
        "mode.compute_dtype": "float32",
    })
    ds = SyntheticEchoDataset(cfg, num_samples=2)
    raw = next(ds.batches(2, shuffle=False))
    task = make_task(cfg)
    eng = Engine(cfg, task)

    # raw and compact batches must give (nearly) the same loss
    # (fresh state each time: the step donates its input state)
    state = eng.init_state(jax.random.PRNGKey(0), raw)
    _, m_raw = eng.train_step(state, raw)
    state = eng.init_state(jax.random.PRNGKey(0), raw)
    compact = next(device_prefetch(iter([raw]), encode_units=30.0))
    _, m_c = eng.train_step(state, compact)
    np.testing.assert_allclose(float(m_raw["loss"]), float(m_c["loss"]), rtol=1e-3)


def test_device_cache_batches_match_host_path():
    from audiodepth_tpu.data.device_cache import DeviceDatasetCache

    cfg = load_config("batvisionv2", overrides={
        "model.generator": "unet_128", "model.ngf": 4,
        "dataset.images_size": 128, "mode.batch_size": 2,
        "mode.compute_dtype": "float32",
    })
    ds = SyntheticEchoDataset(cfg, num_samples=4)
    cache = DeviceDatasetCache(ds, max_depth_units=30.0)
    assert cache.n == 4 and cache.nbytes() > 0

    dev_batches = list(cache.batches(2, shuffle=False))
    host_batches = list(ds.batches(2, shuffle=False))
    assert len(dev_batches) == 2
    for db, hb in zip(dev_batches, host_batches):
        enc = encode_batch(hb, 30.0)
        np.testing.assert_array_equal(np.asarray(db["waveform"]), enc["waveform"])
        np.testing.assert_array_equal(np.asarray(db["depth"]), enc["depth"])

    # engine trains on cached batches (decode happens in the jitted step)
    task = make_task(cfg)
    eng = Engine(cfg, task)
    state = eng.init_state(jax.random.PRNGKey(0), host_batches[0])
    state, m = eng.train_step(state, dev_batches[0])
    assert np.isfinite(float(m["loss"]))
