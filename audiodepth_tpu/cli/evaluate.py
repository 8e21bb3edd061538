"""Evaluation CLI (the reference's test.py twin).

`python -m audiodepth_tpu.cli.evaluate --experiment_name ... [--checkpoints N]`

Reference semantics carried over (test.py):
  * checkpoint resolution by experiment name + epoch, with a helpful
    available-epochs error (test.py:44-203);
  * eval split selection val/test (conf/mode/test.yaml eval_on);
  * per-sample compute_errors with denorm + clip (test.py:243-285);
  * prints mean abs_rel/RMSE/δ1-3/log10/MAE (test.py:322-332);
  * saves a stats artifact with per-sample metric vectors AND the full
    gt/pred tensors (test.py:339-366) — here an .npz under
    {stat_dir}/{dataset}/{split}/.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU-native audio-depth evaluation")
    p.add_argument("--dataset", default="batvisionv2",
                   choices=["batvisionv1", "batvisionv2", "synthetic"])
    p.add_argument("--model", default="unet_baseline")
    p.add_argument("--experiment_name", default="default")
    p.add_argument("--dataset_dir", default=None)
    p.add_argument("--eval_on", default="test", choices=["test", "val"])
    p.add_argument("--checkpoints", type=int, default=None, help="epoch (default latest)")
    p.add_argument("--checkpoint_path", default=None,
                   help="direct path to {ckpt_dir}/{experiment}[/{epoch}]; the "
                        "experiment name (and epoch, if present) are "
                        "auto-extracted (test.py:30-62)")
    p.add_argument("--use_best", action="store_true",
                   help="evaluate the best-validation checkpoint (best.json "
                        "written during training) instead of the latest")
    p.add_argument("--torch_checkpoint", default=None,
                   help="path to a reference PyTorch .pth checkpoint "
                        "(checkpoint['state_dict'], test.py:120-203); weights "
                        "are transplanted into the flax model via "
                        "tools/import_torch.py")
    p.add_argument("--eval_img", action="store_true",
                   help="the checkpoint was trained on camera images "
                        "(--eval_img baseline): evaluate with image inputs")
    p.add_argument("--ckpt_dir", default="./checkpoints")
    p.add_argument("--stat_dir", default="./eval/")
    p.add_argument("--batch_size", type=int, default=None)
    # model hyperparameters must match the trained checkpoint
    from .common import add_model_shape_args

    add_model_shape_args(p)
    p.add_argument("--compute_dtype", default=None, choices=[None, "bfloat16", "float32", "float64"])
    p.add_argument("--visualize", action="store_true",
                   help="dump GT/pred/error PNG grids over the WHOLE eval set, "
                        "one file per --vis_batch_size samples (test.py:288-320)")
    p.add_argument("--vis_batch_size", type=int, default=4,
                   help="samples per visualization PNG (test.py:40)")
    p.add_argument("--results_dir", default="./results",
                   help="visualizations land under "
                        "{results_dir}/{experiment}/{eval_on}/ (test.py:223)")
    p.add_argument("--save_tensors", action="store_true",
                   help="include full gt/pred tensors in the stats artifact")
    p.add_argument("--override", action="append", default=[],
                   metavar="SECTION.KEY=VALUE",
                   help="dotted config override, same grammar as cli.train "
                        "(applied after every named flag)")
    args = p.parse_args(argv)

    from ..compilation_cache import enable as _enable_compile_cache

    _enable_compile_cache()
    from ..configs import experiment_name, load_config
    from ..ckpt import CheckpointManager
    from ..data.batvision import make_dataset
    from ..models import make_task
    from ..train import Engine

    from .common import model_shape_overrides

    overrides = {"mode.eval_on": args.eval_on}
    overrides.update(model_shape_overrides(args))
    for key, val in {
        "dataset.dataset_dir": args.dataset_dir,
        "mode.batch_size": args.batch_size,
        "mode.compute_dtype": args.compute_dtype,
    }.items():
        if val is not None:
            overrides[key] = val
    if args.eval_img:
        overrides["model.input_nc"] = 3
    cfg = load_config(args.dataset, "test", args.experiment_name, args.model,
                      overrides=overrides)
    if args.override:
        from ..configs import apply_overrides
        from .train import _parse_override

        cfg = apply_overrides(
            cfg, dict(_parse_override(spec) for spec in args.override))
    # eval batching: test.yaml default is 1; larger is fine on TPU
    bs = args.batch_size or 16

    task = make_task(cfg)
    # image-input families need image batches: rgb_depth and --eval_img
    # baselines evaluate on camera images; adabins validates student-only
    # on audio (train_adabins_distillation.py:481-522), so no image needed
    with_image = args.eval_img or cfg.model.name == "rgb_depth"
    ds_kwargs = {}
    if cfg.dataset.name == "synthetic":
        ds_kwargs["with_image"] = with_image
    elif with_image:
        if cfg.dataset.name == "batvisionv1":
            raise SystemExit("image-input evaluation is not supported on "
                             "batvisionv1 (no camera images)")
        ds_kwargs["use_image"] = True
    ds = make_dataset(cfg, args.eval_on, **ds_kwargs)
    eng = Engine(cfg, task)
    sample = next(ds.batches(bs, shuffle=False, drop_last=False))
    if cfg.model.name == "adabins_distillation" and "image" not in sample:
        # training checkpoints contain the frozen RGB teacher subtree, so
        # the restore template must too — init with a dummy image (eval
        # itself stays student-only on audio,
        # train_adabins_distillation.py:481-522)
        n = next(iter(sample.values())).shape[0]
        sz = cfg.dataset.images_size
        sample = dict(sample)
        sample["image"] = np.zeros((n, sz, sz, 3), np.float32)
    state = eng.init_state(jax.random.PRNGKey(0), sample)

    if args.torch_checkpoint:
        from ..tools import import_torch as itorch

        sd = itorch.load_torch_state_dict(args.torch_checkpoint)
        variables = itorch.import_for_config(cfg, sd)
        itorch.check_structure(
            variables,
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        state = state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", state.batch_stats),
        )
        # reference coarse checkpoints embed the trained bin parameters
        # (train_coarse_depth.py:632-640)
        task.restore_aux(itorch.load_torch_aux(args.torch_checkpoint))
        exp = (experiment_name(cfg) if args.experiment_name == "default"
               else args.experiment_name)
        epoch = "torch"
        print(f"transplanted torch checkpoint {args.torch_checkpoint}")
        return _run_eval(args, cfg, task, ds, eng, state, exp, epoch, bs)

    # checkpoint resolution (test.py:30-62): --checkpoint_path beats
    # experiment-name assembly; a trailing integer component is the epoch
    epoch_req = args.checkpoints
    if args.checkpoint_path:
        path = os.path.abspath(args.checkpoint_path).rstrip("/")
        base = os.path.basename(path)
        if base.isdigit():
            epoch_req = int(base)
            path = os.path.dirname(path)
        args.ckpt_dir = os.path.dirname(path)
        exp = os.path.basename(path)
        print(f"extracted experiment name from path: {exp}")
    else:
        exp = (experiment_name(cfg) if args.experiment_name == "default"
               else args.experiment_name)
    if args.use_best and epoch_req is None:
        epoch_req = "best"
    mgr = CheckpointManager(args.ckpt_dir, exp)
    try:
        state, aux, epoch = mgr.restore(state, epoch=epoch_req)
    except FileNotFoundError:
        avail = sorted(mgr._mgr.all_steps() or [])
        raise SystemExit(
            f"checkpoint not found under {mgr.directory}; available epochs: {avail}"
        )
    # adopt trained aux (coarse bins) BEFORE the eval forward traces
    task.restore_aux(aux)
    return _run_eval(args, cfg, task, ds, eng, state, exp, epoch, bs)


def _run_eval(args, cfg, task, ds, eng, state, exp, epoch, bs):
    print(f"evaluating {exp} @ epoch {epoch} on {args.eval_on}")

    from ..metrics import METRIC_NAMES
    from ..obs import save_batch_visualization

    per_sample = {k: [] for k in METRIC_NAMES + ("loss",)}
    gts, preds = [], []
    # full-set visualization: one PNG per --vis_batch_size samples, named
    # batch_%04d_samples_%04d-%04d.png under {results_dir}/{exp}/{eval_on}
    # (test.py:222-320; vis tensors are in denormalized meters)
    vis_dir = os.path.join(args.results_dir, exp, args.eval_on)
    vis_gts, vis_preds, vis_group, vis_seen = [], [], 0, 0
    if args.visualize:
        os.makedirs(vis_dir, exist_ok=True)
        print(f"visualization output directory: {vis_dir}")

    def _flush_vis():
        nonlocal vis_gts, vis_preds, vis_group, vis_seen
        n = len(vis_gts)
        lo, hi = vis_seen, vis_seen + n - 1
        path = os.path.join(
            vis_dir, f"batch_{vis_group:04d}_samples_{lo:04d}-{hi:04d}.png")
        save_batch_visualization(
            np.stack(vis_gts), np.stack(vis_preds), path,
            max_depth=cfg.dataset.max_depth, max_cols=n,
        )
        print(f"saved visualization: {path}")
        vis_gts, vis_preds = [], []
        vis_group += 1
        vis_seen = hi + 1

    want_pred = args.save_tensors or args.visualize
    for batch in ds.batches(bs, shuffle=False, drop_last=False):
        if want_pred:
            # metrics + pred/gt meters from ONE jitted graph (the eval
            # forward is CSEd), instead of eval_step plus a second forward
            out, pred, gt_m = eng.eval_step_pred(state, batch)
            pred, gt_m = np.asarray(pred), np.asarray(gt_m)
        else:
            out = eng.eval_step(state, batch)
        # mesh-backed engines pad ragged tails to a shardable size and
        # return a _valid row mask (engine.py eval_step); keep only real
        # rows so pad rows never reach the means/tensors/visualizations
        valid = np.asarray(out["_valid"]).astype(bool) if "_valid" in out else None
        if want_pred and valid is not None:
            pred, gt_m = pred[valid], gt_m[valid]
        for k in per_sample:
            v = np.asarray(out[k])
            per_sample[k].append(v[valid] if valid is not None else v)
        if args.visualize:
            for j in range(len(gt_m)):
                vis_gts.append(gt_m[j])
                vis_preds.append(pred[j])
                if len(vis_gts) >= args.vis_batch_size:
                    _flush_vis()
        if args.save_tensors:
            gts.append(gt_m)
            preds.append(pred)
    if args.visualize and vis_gts:
        _flush_vis()
    if args.visualize:
        print(f"visualizations saved to {vis_dir}: "
              f"{vis_group} files, {vis_seen} samples")

    per_sample = {k: np.concatenate(v) for k, v in per_sample.items()}
    means = {k: float(v.mean()) for k, v in per_sample.items()}
    print("  ".join(f"{k}={v:.4f}" for k, v in means.items()))

    out_dir = os.path.join(args.stat_dir, cfg.dataset.name, args.eval_on)
    os.makedirs(out_dir, exist_ok=True)
    artifact = os.path.join(out_dir, f"stats_on_{exp}_epoch{epoch}.npz")
    payload = dict(per_sample)
    if args.save_tensors and gts:
        payload["gt"] = np.concatenate(gts)
        payload["pred"] = np.concatenate(preds)
    np.savez_compressed(artifact, **payload)
    print(f"stats artifact: {artifact}")
    return means


if __name__ == "__main__":
    main()
