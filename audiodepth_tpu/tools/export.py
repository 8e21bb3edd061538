"""Export the fused waveform→depth inference graph (jax.export).

The deployment artifact of the framework: ONE serialized StableHLO program
containing the entire audio→depth path — TOF cut, STFT/Mel front end, model
forward, unit conversion and clipping — loadable without any of this
package's Python (SURVEY §7 step 8 / BASELINE.json p50 target).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp


def build_inference_fn(cfg, task):
    """waveform [B, 2, L] → depth meters [B, S, S, 1], clipped."""

    def infer(params, batch_stats, waveform):
        pred = task.predict_meters(params, batch_stats, {"waveform": waveform})
        return jnp.clip(pred, 0.0, cfg.dataset.max_depth)

    return infer


def export_inference(cfg, task, variables, batch_size: int = 1,
                     out_path: Optional[str] = None):
    """Serialize the jitted inference graph; returns (exported, path)."""
    from jax import export as jexport

    from ..data.frontend import tof_cut_samples

    length = tof_cut_samples(cfg.dataset.max_depth, cfg.dataset.sample_rate) + 256
    wave_spec = jax.ShapeDtypeStruct((batch_size, 2, length), jnp.float32)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    infer = build_inference_fn(cfg, task)

    exported = jexport.export(jax.jit(infer))(
        jax.tree_util.tree_map(lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), params),
        jax.tree_util.tree_map(lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), batch_stats)
        if batch_stats is not None else None,
        wave_spec,
    )
    blob = exported.serialize()
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "wb") as f:
            f.write(blob)
    return exported, out_path


def main(argv=None):
    p = argparse.ArgumentParser(description="Export fused inference graph")
    p.add_argument("--dataset", default="batvisionv2")
    p.add_argument("--model", default="unet_baseline")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--out", default="./export/inference.stablehlo")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--experiment_name", default=None)
    p.add_argument("--checkpoints", type=int, default=None,
                   help="epoch to export (default latest)")
    p.add_argument("--use_best", action="store_true",
                   help="export the best-validation checkpoint (best.json)")
    p.add_argument("--torch_checkpoint", default=None,
                   help="reference .pth checkpoint (train.py:1005-1021 "
                        "format) to export directly — the migration path "
                        "from a reference training run to a TPU-servable "
                        "StableHLO artifact")
    # model hyperparameters must match the checkpoint being exported
    from ..cli.common import add_model_shape_args, model_shape_overrides

    add_model_shape_args(p)
    args = p.parse_args(argv)

    from ..configs import load_config
    from ..data.synthetic import SyntheticEchoDataset
    from ..models import make_task

    cfg = load_config(args.dataset, "test", "export", args.model,
                      overrides=model_shape_overrides(args))
    task = make_task(cfg)
    ds = SyntheticEchoDataset(cfg, num_samples=1)
    batch = next(ds.batches(1, shuffle=False))
    variables = task.init(jax.random.PRNGKey(0), batch)
    if args.torch_checkpoint:
        # reference .pth → flax params (tools/import_torch); unused subtrees
        # (e.g. the adabins frozen teacher) ride along harmlessly — the
        # inference graph only reads the student path
        from . import import_torch as itorch

        sd = itorch.load_torch_state_dict(args.torch_checkpoint)
        variables = itorch.import_for_config(cfg, sd)
        # coarse checkpoints embed the trained bin parameterization
        # (train_coarse_depth.py:632-640) — bake it into the graph
        task.restore_aux(itorch.load_torch_aux(args.torch_checkpoint))
        print(f"imported torch checkpoint {args.torch_checkpoint} "
              f"({len(sd)} tensors)")
    elif args.ckpt_dir and args.experiment_name:
        from ..ckpt import CheckpointManager

        # load trained params into the export: restore_eval builds the full
        # template (incl. opt_state) from on-disk metadata and discards the
        # optimizer, so any real training checkpoint loads here
        mgr = CheckpointManager(args.ckpt_dir, args.experiment_name)
        epoch_req = "best" if (args.use_best and args.checkpoints is None) \
            else args.checkpoints
        params, batch_stats, aux, epoch = mgr.restore_eval(epoch=epoch_req)
        print(f"restored epoch {epoch} from {mgr.directory}")
        task.restore_aux(aux)  # e.g. coarse bin centers baked into the graph
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats

    _, path = export_inference(cfg, task, variables, args.batch_size, args.out)
    print(f"exported fused inference graph → {path}")


if __name__ == "__main__":
    main()
