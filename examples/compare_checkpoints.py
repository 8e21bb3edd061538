"""Side-by-side model comparison CSV (depth_model_comparison.ipynb twin).

The reference's only measured baseline artifact is
depth_model_comparison_results.csv: N models evaluated over the same
val slice with columns Model,ABS_REL,RMSE,MAE,Delta1.  This script is the
framework twin: evaluate any number of checkpoints (orbax experiment dirs
and/or reference-format .pth files) over one shared val slice and emit the
same CSV schema.

Usage:
    python examples/compare_checkpoints.py \
        --dataset synthetic --out comparison.csv \
        --entry "UNet (ours)":unet_baseline:./checkpoints/exp1 \
        --entry "UNet (torch ckpt)":unet_baseline:./ckpt.pth \
        [--num_samples 100] [--batch_size 16]

Each --entry is LABEL:FAMILY:PATH[:OVERRIDE=V,OVERRIDE=V].  PATH ending in
.pth goes through tools/import_torch; otherwise it is an orbax checkpoint
directory ({ckpt_dir}/{experiment}) restored at the latest epoch.
"""

from __future__ import annotations

import argparse
import csv

import jax
import numpy as np


def evaluate_entry(label, family, path, dataset, overrides, num_samples, bs):
    from audiodepth_tpu.configs import load_config
    from audiodepth_tpu.data.batvision import make_dataset
    from audiodepth_tpu.models import make_task
    from audiodepth_tpu.train import Engine

    ov = {"mode.compute_dtype": "float32"}
    ov.update(overrides)
    cfg = load_config(dataset, "test", label, family, overrides=ov)
    task = make_task(cfg)
    kwargs = {"num_samples": num_samples} if dataset == "synthetic" else {}
    ds = make_dataset(cfg, "val", **kwargs)
    eng = Engine(cfg, task)
    sample = next(ds.batches(bs, shuffle=False, drop_last=False))
    state = eng.init_state(jax.random.PRNGKey(0), sample)

    if path.endswith(".pth"):
        from audiodepth_tpu.tools import import_torch as itorch

        variables = itorch.import_for_config(cfg, itorch.load_torch_state_dict(path))
        itorch.check_structure(
            variables, {"params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=variables["params"],
                              batch_stats=variables.get("batch_stats"))
    else:
        import os

        from audiodepth_tpu.ckpt import CheckpointManager

        mgr = CheckpointManager(os.path.dirname(path) or ".", os.path.basename(path))
        state, _aux, epoch = mgr.restore(state)
        print(f"{label}: restored epoch {epoch}")

    means = eng.evaluate(state, ds.batches(bs, shuffle=False, drop_last=False))
    return {"Model": label, "ABS_REL": means["abs_rel"], "RMSE": means["rmse"],
            "MAE": means["mae"], "Delta1": means["delta1"]}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--entry", action="append", required=True,
                   help="LABEL:FAMILY:PATH[:k=v,k=v]")
    p.add_argument("--out", default="depth_model_comparison_results.csv")
    p.add_argument("--num_samples", type=int, default=100,
                   help="val slice size (synthetic)")
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args(argv)

    rows = []
    for spec in args.entry:
        parts = spec.split(":")
        label, family, path = parts[0], parts[1], parts[2]
        # same scalar coercion (bool/int/float/null) as `--override` in
        # cli/train.py, instead of a drifting int/float-only copy
        from audiodepth_tpu.cli.train import _parse_override

        overrides = {}
        if len(parts) > 3:
            for kv in parts[3].split(","):
                k, v = _parse_override(kv)
                overrides[k] = v
        rows.append(evaluate_entry(label, family, path, args.dataset,
                                   overrides, args.num_samples,
                                   args.batch_size))
        print(rows[-1])

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Model", "ABS_REL", "RMSE", "MAE", "Delta1"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out} ({len(rows)} models)")
    return rows


if __name__ == "__main__":
    main()
