"""Serving surface: micro-batcher correctness + the HTTP protocol.

Runs the real ThreadingHTTPServer + collector thread on the virtual CPU
mesh with a tiny random-init model; asserts the served depth equals a
direct predict_meters call (pad rows never leak into results), the ragged
micro-batch path pads to the ladder, and the stats/health endpoints work.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from audiodepth_tpu.cli import serve as serve_mod
from audiodepth_tpu.configs import load_config
from audiodepth_tpu.models import make_task


def _tiny_runner(ladder=(1, 4)):
    cfg = load_config(
        "batvisionv2", "test", "serve_test", "unet_baseline",
        overrides={
            "model.generator": "unet_128",
            "model.ngf": 4,
            "dataset.images_size": 128,
            "mode.compute_dtype": "float32",
        },
    )
    task = make_task(cfg)
    from audiodepth_tpu.data.frontend import tof_cut_samples

    length = tof_cut_samples(cfg.dataset.max_depth, cfg.dataset.sample_rate)
    batch = {
        "waveform": np.zeros((1, 2, length), np.float32),
        "depth": np.zeros((1, 128, 128, 1), np.float32),
    }
    variables = task.init(jax.random.PRNGKey(0), batch)
    runner = serve_mod.InferenceRunner(
        cfg, task, variables["params"], variables.get("batch_stats"),
        ladder=ladder,
    )
    runner.warmup()
    return cfg, task, variables, runner


@pytest.fixture(scope="module")
def served():
    cfg, task, variables, runner = _tiny_runner()
    batcher = serve_mod.MicroBatcher(runner, wait_ms=5.0)
    server = serve_mod.make_server(batcher, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    yield cfg, task, variables, runner, batcher, port
    server.shutdown()
    batcher.stop()


def _post_predict(port: int, wave: np.ndarray):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=wave.astype(np.float32).tobytes(), method="POST")
    with urllib.request.urlopen(req) as resp:
        shape = tuple(int(s) for s in resp.headers["X-Shape"].split(","))
        return np.frombuffer(resp.read(), np.float32).reshape(shape)


def test_served_depth_matches_direct_predict(served):
    cfg, task, variables, runner, batcher, port = served
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((2, runner.wave_len)) * 0.1).astype(np.float32)

    got = _post_predict(port, wave)
    assert got.shape == (128, 128)

    import jax.numpy as jnp

    direct = task.predict_meters(
        variables["params"], variables.get("batch_stats"),
        {"waveform": wave[None]})
    direct = np.asarray(jnp.clip(direct, 0, cfg.dataset.max_depth))[0, ..., 0]
    np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-5)
    assert np.all(got >= 0) and np.all(got <= cfg.dataset.max_depth)


def test_short_waveform_padded_like_dataset(served):
    cfg, task, variables, runner, batcher, port = served
    rng = np.random.default_rng(1)
    short = (rng.standard_normal((2, runner.wave_len // 2)) * 0.1
             ).astype(np.float32)
    got = _post_predict(port, short)

    fixed = np.zeros((1, 2, runner.wave_len), np.float32)
    fixed[0, :, : short.shape[1]] = short
    import jax.numpy as jnp

    direct = task.predict_meters(
        variables["params"], variables.get("batch_stats"),
        {"waveform": fixed})
    direct = np.asarray(jnp.clip(direct, 0, cfg.dataset.max_depth))[0, ..., 0]
    np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-5)


def test_concurrent_requests_microbatch_and_match(served):
    cfg, task, variables, runner, batcher, port = served
    rng = np.random.default_rng(2)
    # 3 concurrent requests with ladder (1,4): the collector pads 3 → 4;
    # every caller must get ITS OWN depth back (no pad-row leakage)
    waves = [(rng.standard_normal((2, runner.wave_len)) * 0.1
              ).astype(np.float32) for _ in range(3)]
    results = [None] * 3

    def call(i):
        results[i] = _post_predict(port, waves[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    import jax.numpy as jnp

    direct = task.predict_meters(
        variables["params"], variables.get("batch_stats"),
        {"waveform": np.stack(waves)})
    direct = np.asarray(jnp.clip(direct, 0, cfg.dataset.max_depth))[..., 0]
    for i in range(3):
        np.testing.assert_allclose(results[i], direct[i],
                                   rtol=1e-5, atol=1e-5)


def test_health_stats_and_bad_request(served):
    cfg, task, variables, runner, batcher, port = served
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
        assert r.read() == b"ok"
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
        stats = json.loads(r.read())
    assert stats["served"] >= 1
    assert stats["ladder"] == list(runner.ladder)
    assert stats["p50_ms"] > 0
    # non-multiple-of-8 body → 400, not a server crash
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=b"abc", method="POST")
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # the server still answers afterwards
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
        assert r.read() == b"ok"


def test_loadtest_inprocess(served):
    cfg, task, variables, runner, batcher, port = served
    res = serve_mod.run_loadtest(port, runner, n_requests=12, concurrency=4)
    assert res["requests"] == 12
    assert res["throughput_rps"] > 0
    assert res["p99_ms"] >= res["p50_ms"] > 0


def test_run_rejects_non_ladder_batch():
    _, _, _, runner = _tiny_runner(ladder=(1, 4))
    with pytest.raises(ValueError):
        runner.run(np.zeros((3, 2, runner.wave_len), np.float32))
