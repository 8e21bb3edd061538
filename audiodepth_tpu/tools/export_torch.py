"""Export a trained flax checkpoint as a reference-format torch ``.pth``.

The inverse of ``cli.evaluate --torch_checkpoint``: models trained in this
framework load straight into the reference ecosystem
(``model.load_state_dict(checkpoint["state_dict"])``, reference
test.py:120-203). Mapping specs are shared with the importer
(tools/import_torch.py), so the two directions cannot drift apart.

Usage:
    python -m audiodepth_tpu.tools.export_torch \
        --dataset batvisionv2 --model unet_baseline \
        --ckpt_dir ./checkpoints --experiment_name <exp> \
        --out model.pth [--checkpoints N | --use_best]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Export flax checkpoint to torch .pth")
    p.add_argument("--dataset", default="batvisionv2")
    p.add_argument("--model", default="unet_baseline")
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--experiment_name", required=True)
    p.add_argument("--checkpoints", type=int, default=None, help="epoch (default latest)")
    p.add_argument("--use_best", action="store_true")
    p.add_argument("--out", default="./export/model.pth")
    from ..cli.common import add_model_shape_args, model_shape_overrides

    add_model_shape_args(p)
    args = p.parse_args(argv)

    import os

    import numpy as np
    import torch

    from ..ckpt import CheckpointManager
    from ..configs import load_config
    from .import_torch import export_for_config

    cfg = load_config(args.dataset, "test", "export", args.model,
                      overrides=model_shape_overrides(args))

    mgr = CheckpointManager(args.ckpt_dir, args.experiment_name)
    epoch_req = "best" if (args.use_best and args.checkpoints is None) else args.checkpoints
    params, batch_stats, aux, epoch = mgr.restore_eval(epoch=epoch_req)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    sd = export_for_config(cfg, variables)
    payload = {"state_dict": {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
               "epoch": int(epoch)}
    if aux:
        # coarse checkpoints embed bins next to the weights in the
        # reference format (train_coarse_depth.py:632-640)
        for key in ("bin_centers", "bin_edges"):
            if aux.get(key) is not None:
                payload[key] = torch.from_numpy(np.asarray(aux[key]).copy())
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    torch.save(payload, args.out)
    print(f"exported epoch {epoch} ({len(sd)} tensors) → {args.out}")
    return args.out


if __name__ == "__main__":
    main()
