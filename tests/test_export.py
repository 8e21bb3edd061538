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


def test_export_from_trained_checkpoint(tmp_path):
    """Train 1 epoch via the CLI, export via --ckpt_dir (restore_eval builds
    the opt_state template from checkpoint metadata), execute the
    deserialized graph, and compare against predict_meters on the restored
    params — the full deployment path over a REAL training checkpoint."""
    from audiodepth_tpu.cli.train import main as train_main

    ck = str(tmp_path / "ck")
    train_main([
        "--dataset", "synthetic", "--model", "unet_baseline",
        "--experiment_name", "exptrained",
        "--generator", "unet_128", "--ngf", "4",
        "--epochs", "1", "--batch_size", "4", "--num_samples", "4",
        "--compute_dtype", "float32", "--saving_checkpoints", "1",
        "--ckpt_dir", ck, "--log_dir", str(tmp_path / "lg"),
        "--no_visualize",
    ])
    import os

    exp = os.listdir(ck)[0]

    from audiodepth_tpu.ckpt import CheckpointManager
    from audiodepth_tpu.tools.export import main as export_main

    out = str(tmp_path / "trained.stablehlo")
    export_main([
        "--dataset", "batvisionv2", "--model", "unet_baseline",
        "--generator", "unet_128", "--ngf", "4",
        "--out", out, "--ckpt_dir", ck, "--experiment_name", exp,
    ])

    # the graph must compute exactly what predict_meters computes on the
    # RESTORED (trained) params — not on a fresh init
    cfg = load_config("batvisionv2", "test", "exp2", "unet_baseline", overrides={
        "model.generator": "unet_128", "model.ngf": 4,
    })
    task = make_task(cfg)
    params, batch_stats, _aux, _epoch = CheckpointManager(ck, exp).restore_eval()
    ds = SyntheticEchoDataset(cfg, num_samples=1)
    batch = next(ds.batches(1, shuffle=False))
    from jax import export as jexport

    reloaded = jexport.deserialize(bytearray(open(out, "rb").read()))
    wave = jnp.asarray(batch["waveform"])
    got = reloaded.call(params, batch_stats, wave)
    want = build_inference_fn(cfg, task)(params, batch_stats, wave)
    # fp32 fusion-order noise between the exported graph and the live jit
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=5e-5)

    # the torch-export CLI ships the same checkpoint as a reference-format
    # .pth that imports back to the identical param tree
    import torch

    from audiodepth_tpu.tools.export_torch import main as export_torch_main
    from audiodepth_tpu.tools import import_torch as it

    pth = str(tmp_path / "model.pth")
    export_torch_main([
        "--dataset", "batvisionv2", "--model", "unet_baseline",
        "--generator", "unet_128", "--ngf", "4",
        "--ckpt_dir", ck, "--experiment_name", exp, "--out", pth,
    ])
    sd = it.load_torch_state_dict(pth)
    back = it.import_for_config(cfg, sd)
    it.check_structure(back, {"params": params, "batch_stats": batch_stats})
    flat_want = jax.tree_util.tree_leaves(params)
    flat_got = jax.tree_util.tree_leaves(back["params"])
    for a, b in zip(flat_want, flat_got):
        np.testing.assert_array_equal(np.asarray(a, np.float32), b)

    # and the .pth itself exports straight to a StableHLO artifact
    # (--torch_checkpoint): the one-command migration path from a reference
    # training run to TPU serving
    out2 = str(tmp_path / "from_torch.stablehlo")
    export_main([
        "--dataset", "batvisionv2", "--model", "unet_baseline",
        "--generator", "unet_128", "--ngf", "4",
        "--out", out2, "--torch_checkpoint", pth,
    ])
    reloaded2 = jexport.deserialize(bytearray(open(out2, "rb").read()))
    got2 = reloaded2.call(back["params"], back.get("batch_stats"), wave)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                               rtol=1e-4, atol=5e-5)
