"""Export round-trip: serialize the fused inference graph, reload, run."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.data.synthetic import SyntheticEchoDataset
from audiodepth_tpu.models import make_task
from audiodepth_tpu.tools.export import build_inference_fn, export_inference


def test_export_roundtrip(tmp_path):
    cfg = load_config("batvisionv2", "test", "exp", "unet_baseline", overrides={
        "model.generator": "unet_128", "model.ngf": 4,
        "dataset.images_size": 128, "mode.compute_dtype": "float32",
    })
    task = make_task(cfg)
    ds = SyntheticEchoDataset(cfg, num_samples=1)
    batch = next(ds.batches(1, shuffle=False))
    variables = task.init(jax.random.PRNGKey(0), batch)

    out = str(tmp_path / "g.stablehlo")
    exported, path = export_inference(cfg, task, variables, batch_size=1, out_path=out)
    blob = open(path, "rb").read()
    assert len(blob) > 10_000

    from jax import export as jexport

    reloaded = jexport.deserialize(bytearray(blob))
    wave = jnp.asarray(batch["waveform"])
    got = reloaded.call(variables["params"], variables.get("batch_stats"), wave)
    want = build_inference_fn(cfg, task)(
        variables["params"], variables.get("batch_stats"), wave
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    assert got.shape == (1, 128, 128, 1)


def test_export_binaural_roundtrip(tmp_path):
    cfg = load_config("batvisionv2", "test", "exp", "binaural_attention", overrides={
        "model.base_channels": 8, "dataset.images_size": 64,
        "mode.compute_dtype": "float32",
    })
    task = make_task(cfg)
    ds = SyntheticEchoDataset(cfg, num_samples=1)
    batch = next(ds.batches(1, shuffle=False))
    variables = task.init(jax.random.PRNGKey(0), batch)
    out = str(tmp_path / "b.stablehlo")
    _, path = export_inference(cfg, task, variables, batch_size=1, out_path=out)
    from jax import export as jexport

    reloaded = jexport.deserialize(bytearray(open(path, "rb").read()))
    got = reloaded.call(variables["params"], variables.get("batch_stats"),
                        jnp.asarray(batch["waveform"]))
    assert got.shape == (1, 64, 64, 1)
    assert float(jnp.max(got)) <= 30.0 and float(jnp.min(got)) >= 0.0
