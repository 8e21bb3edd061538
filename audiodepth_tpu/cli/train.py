"""Unified training CLI — one driver for every model family.

Replaces the reference's seven specialized train scripts (train.py,
train_cvae.py, train_base_residual.py, train_binaural_attention.py,
train_rgb_depth.py, train_adabins_distillation.py, train_coarse_depth.py)
with a single entry point: `python -m audiodepth_tpu.cli.train --model ...`.

Reference driver features carried over:
  * criterion selection with auto-Combined inference when any loss weight
    is given explicitly (train.py:392-467);
  * lr sanity bounds (hard error > 0.1 — train.py:227-238, enforced in
    configs.validate);
  * experiment-name assembly keying checkpoints/logs (train.py:286-313);
  * sequence holdout via --holdout_locations (train.py:294-373);
  * best-model tracking metric (train.py:613-620);
  * resume from latest checkpoint (auto) or --checkpoints N.
"""

from __future__ import annotations

import argparse

import jax


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native audio-depth training")
    p.add_argument("--dataset", default="batvisionv2",
                   choices=["batvisionv1", "batvisionv2", "synthetic"])
    p.add_argument("--model", default="unet_baseline")
    p.add_argument("--experiment_name", default="default")
    p.add_argument("--dataset_dir", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--saving_checkpoints", type=int, default=None,
                   help="checkpoint every N epochs (train.py:1005 cadence)")
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--optimizer", default=None, choices=[None, "Adam", "AdamW", "SGD"])
    p.add_argument("--criterion", default=None, choices=[None, "L1", "SIlog", "Combined"])
    p.add_argument("--l1_weight", type=float, default=None)
    p.add_argument("--silog_weight", type=float, default=None)
    p.add_argument("--silog_lambda", type=float, default=None)
    p.add_argument("--use_silog", type=lambda x: str(x).lower() == "true",
                   default=None,
                   help="true|false: enable/disable the SIlog term; any "
                        "mention auto-enables Combined (train.py:99-101); "
                        "false zeroes silog_weight")
    p.add_argument("--audio_format", default=None,
                   choices=[None, "spectrogram", "mel_spectrogram", "waveform"],
                   help="overrides the dataset preset (train.py:69-71; "
                        "mel is rejected on BV1)")
    p.add_argument("--max_depth", type=float, default=None,
                   help="max depth in meters (train.py:74-76)")
    p.add_argument("--validation", type=lambda x: str(x).lower() == "true",
                   default=None, help="true|false (train.py:111)")
    p.add_argument("--validation_iter", type=int, default=None,
                   help="validate every N epochs (train.py:113)")
    p.add_argument("--weight_decay", type=float, default=None,
                   help="AdamW decoupled weight decay "
                        "(train_binaural_attention.py:125 default 0.01)")
    p.add_argument("--lr_schedule", default=None,
                   choices=[None, "constant", "cosine", "step", "warm_restarts"])
    p.add_argument("--ngf", type=int, default=None)
    p.add_argument("--base_channels", type=int, default=None)
    p.add_argument("--generator", default=None, choices=[None, "unet_256", "unet_128"])
    p.add_argument("--n_bins", type=int, default=None)
    p.add_argument("--bin_strategy", default=None, choices=[None, "linear", "log", "sid"])
    p.add_argument("--model_type", default=None,
                   choices=[None, "unet", "lite", "hybrid", "dual_reg"])
    p.add_argument("--attention_levels", default=None,
                   help="comma-separated encoder levels for cross-attention, "
                        "e.g. 2,3,4,5 (binaural family)")
    # family knobs the reference drivers expose as flags
    # (train_base_residual.py:132-135, train_cvae.py:131-143,
    #  train_adabins_distillation.py, train_binaural_attention.py)
    p.add_argument("--warmup_epochs", type=int, default=None,
                   help="adaptive-loss warmup (base_residual)")
    p.add_argument("--use_adaptive_loss", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="adaptive loss schedule (base_residual/adabins); "
                        "--no-use_adaptive_loss disables")
    p.add_argument("--loss_type", default=None,
                   choices=[None, "standard", "edge_aware", "adaptive"],
                   help="binaural-attention loss family")
    p.add_argument("--kl_weight", type=float, default=None, help="cVAE KL weight")
    p.add_argument("--latent_dim", type=int, default=None, help="cVAE latent dim")
    p.add_argument("--temperature", type=float, default=None,
                   help="distillation KL temperature")
    p.add_argument("--recon", default=None,
                   choices=[None, "silog", "l1", "l2", "frequency_aware"],
                   help="base_residual reconstruction term")
    # per-family loss weights, same names + defaults as the reference
    # drivers' argparse (train_base_residual.py:136-142,
    # train_rgb_depth.py:126-128, train_adabins_distillation.py:179-187,
    # train_coarse_depth.py:148-186)
    p.add_argument("--lambda_recon", type=float, default=None,
                   help="base_residual recon weight (default 1.0); also the "
                        "binaural edge-aware recon weight")
    p.add_argument("--lambda_base", type=float, default=None,
                   help="base_residual structural-guidance weight (default 1.2)")
    p.add_argument("--lambda_sparse", type=float, default=None,
                   help="residual sparsity weight (base_residual 0.05, "
                        "adabins 0.1)")
    p.add_argument("--lowpass_kernel", type=int, default=None,
                   help="base_residual guidance avg-pool kernel (default 16)")
    p.add_argument("--lambda_edge", type=float, default=None,
                   help="binaural edge-aware loss edge weight (default 0.2)")
    p.add_argument("--lambda_smooth", type=float, default=None,
                   help="smoothness weight (binaural edge-aware 0.1, "
                        "rgb_depth 0.1)")
    p.add_argument("--lambda_l1", type=float, default=None,
                   help="rgb_depth L1 weight (default 1.0)")
    p.add_argument("--lambda_task", type=float, default=None,
                   help="adabins task-loss weight (default 1.0)")
    p.add_argument("--lambda_response", type=float, default=None,
                   help="adabins response-distillation weight (default 0.5)")
    p.add_argument("--lambda_feature", type=float, default=None,
                   help="adabins feature-distillation weight (default 0.3)")
    p.add_argument("--lambda_bin", type=float, default=None,
                   help="adabins bin-distribution weight (default 0.2)")
    p.add_argument("--freeze_rgb", action="store_true",
                   help="accepted for reference-CLI compatibility; the RGB "
                        "teacher is ALWAYS stop-gradient-frozen here, which "
                        "is trajectory-identical to both reference settings "
                        "(its teacher runs under no_grad either way and "
                        "grad-less params are skipped by torch optimizers)")
    # coarse-family weights (train_coarse_depth.py:148-186)
    p.add_argument("--ce_weight", type=float, default=None,
                   help="coarse CE weight (default 1.0)")
    p.add_argument("--regression_weight", type=float, default=None,
                   help="coarse regression weight (default 0.5)")
    p.add_argument("--offset_reg_weight", type=float, default=None,
                   help="coarse offset regularization (default 0.01)")
    p.add_argument("--coarse_weight", type=float, default=None,
                   help="dual_reg coarse-term weight (default 1.0)")
    p.add_argument("--final_weight", type=float, default=None,
                   help="dual_reg final-term weight (default 1.0)")
    p.add_argument("--sid_alpha", type=float, default=None,
                   help="SID bin-spacing alpha (default 0.6)")
    p.add_argument("--soft_ce_sigma", type=float, default=None,
                   help="soft-CE Gaussian sigma (default 2.0)")
    p.add_argument("--use_focal", action="store_true", default=None,
                   help="focal loss instead of soft-CE (coarse unet/lite)")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="rematerialize the encoder (binaural/adabins). "
                        "binaural defaults ON (needed to fit bs>=64 in 16 GB "
                        "HBM; --no-remat is ~8%% faster when the batch fits). "
                        "adabins defaults OFF (fits through bs=64; remat "
                        "costs 28-33%%). Ablations in RESULTS.md")
    # sparse-depth coarse workflow (train_coarse_depth.py:133-645):
    # train against preprocessed sparse_depth_{method}/ targets
    p.add_argument("--sparse_method", default=None,
                   help="train on sparse_depth_{method}/ targets produced by "
                        "tools/preprocess_sparse_depth (e.g. downup_015)")
    p.add_argument("--use_original_depth", action="store_true",
                   help="also load the dense original depth alongside the "
                        "sparse target (SparseDepth_Dataset.py:136-145)")
    p.add_argument("--eval_img", action="store_true",
                   help="train the baseline on camera images (3ch) instead of "
                        "audio — BV2 only (train.py:322-387)")
    p.add_argument("--holdout_locations", nargs="*", default=None)
    # reference sequence-holdout spelling (train.py:76-82): both named
    # sequences are blacklisted from train/val and get holdout eval loaders
    p.add_argument("--sequence_holdout", action="store_true",
                   help="alias for the reference flag; holdout sequences "
                        "come from --holdout_test_seq/--holdout_eval_seq "
                        "or --holdout_locations")
    p.add_argument("--holdout_test_seq", default=None,
                   help="sequence held out of training (train.py:78)")
    p.add_argument("--holdout_eval_seq", default=None,
                   help="sequence held out + evaluated per validation "
                        "(train.py:80)")
    p.add_argument("--checkpoints", type=int, default=None,
                   help="epoch to resume from (default: auto-latest)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init_from_torch", default=None, metavar="PTH",
                   help="warm-start from a reference .pth checkpoint "
                        "(tools/import_torch): weights only, fresh "
                        "optimizer — the reference's own resume semantics "
                        "(train.py:603-606 loads only state_dict) — "
                        "continuing from the wrapper's saved epoch+1")
    p.add_argument("--ckpt_dir", default="./checkpoints")
    p.add_argument("--log_dir", default="./logs")
    p.add_argument("--best_metric", default="rmse",
                   choices=["rmse", "abs_rel", "delta1", "mae", "loss"])
    p.add_argument("--results_dir", default="./results",
                   help="per-validation visualization PNGs (train.py:861-871)")
    p.add_argument("--no_visualize", action="store_true")
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--wandb_project", default="batvision-depth-estimation",
                   help="W&B project (train.py:124)")
    p.add_argument("--wandb_entity", default=None,
                   help="W&B entity/team (train.py:126)")
    p.add_argument("--wandb_mode", default=None,
                   choices=[None, "online", "offline", "disabled"],
                   help="W&B logging mode (train.py:128)")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of the first "
                        "post-compile epoch to this directory")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--seed", type=int, default=None,
                   help="PRNG seed for init + epoch shuffles (mode.seed)")
    p.add_argument("--compute_dtype", default=None, choices=[None, "bfloat16", "float32", "float64"])
    p.add_argument("--num_samples", type=int, default=256,
                   help="synthetic dataset size")
    p.add_argument("--device_cache", action="store_true",
                   help="upload the whole split to HBM once and gather "
                        "batches on-device (fastest for BatVision-scale "
                        "corpora; see data/device_cache.py)")
    p.add_argument("--override", action="append", default=None,
                   metavar="SECTION.KEY=VALUE",
                   help="generic dotted config override, repeatable "
                        "(e.g. --override mode.threads=8 "
                        "--override model.extra.depth_min=0.2); applied "
                        "after every named flag")
    return p


def _parse_override(spec: str):
    """'section.key=value' → (dotted_key, coerced_value).

    Same scalar coercion as the reference's YAML fallback parser
    (config_loader.py:8-41): bool/int/float/null, else string.
    """
    from ..configs import NULL

    if "=" not in spec:
        raise SystemExit(f"--override expects SECTION.KEY=VALUE, got {spec!r}")
    key, raw = spec.split("=", 1)
    low = raw.strip().lower()
    if low in ("true", "false"):
        value = low == "true"
    elif low in ("null", "none", ""):
        # the NULL sentinel survives apply_overrides' None skip (None means
        # "flag not given"), so KEY=null really clears the field
        value = NULL
    else:
        try:
            value = int(raw)
        except ValueError:
            try:
                value = float(raw)
            except ValueError:
                value = raw
    return key.strip(), value


def config_from_args(args):
    from ..configs import load_config

    overrides = {}
    direct = {
        "mode.epochs": args.epochs,
        "mode.saving_checkpoints": args.saving_checkpoints,
        "mode.learning_rate": args.learning_rate,
        "mode.batch_size": args.batch_size,
        "mode.optimizer": args.optimizer,
        "mode.lr_schedule": args.lr_schedule,
        "mode.compute_dtype": args.compute_dtype,
        "mode.seed": args.seed,
        "model.ngf": args.ngf,
        "model.base_channels": args.base_channels,
        "model.generator": args.generator,
        "model.n_bins": args.n_bins,
        "model.bin_strategy": args.bin_strategy,
        "model.model_type": args.model_type,
        "model.attention_levels": args.attention_levels,
        "dataset.dataset_dir": args.dataset_dir,
        "dataset.audio_format": args.audio_format,
        "dataset.max_depth": args.max_depth,
        "mode.validation": args.validation,
        "mode.validation_iter": args.validation_iter,
        "mode.weight_decay": args.weight_decay,
        "mode.l1_weight": args.l1_weight,
        "mode.silog_weight": args.silog_weight,
        "mode.silog_lambda": args.silog_lambda,
        "model.kl_weight": args.kl_weight,
        "model.latent_dim": args.latent_dim,
    }
    overrides.update({k: v for k, v in direct.items() if v is not None})
    # smart criterion: any explicit loss weight (or --use_silog) implies
    # Combined (train.py:394-399); --use_silog false zeroes the SIlog term
    if args.criterion is not None:
        overrides["mode.criterion"] = args.criterion
    elif any(v is not None for v in (args.l1_weight, args.silog_weight,
                                     args.silog_lambda, args.use_silog)):
        overrides["mode.criterion"] = "Combined"
    if args.use_silog is False:
        overrides["mode.silog_weight"] = 0.0
    cfg = load_config(args.dataset, "train", args.experiment_name, args.model,
                      overrides=overrides)
    # family knobs living in model.extra (merged, not replaced, so YAML conf
    # values survive alongside CLI overrides)
    extra_updates = {k: v for k, v in {
        "warmup_epochs": args.warmup_epochs,
        "use_adaptive_loss": args.use_adaptive_loss,
        "loss_type": args.loss_type,
        "temperature": args.temperature,
        "recon": args.recon,
        "remat": args.remat,
        # per-family loss weights (reference driver argparse names)
        "lambda_recon": args.lambda_recon,
        "lambda_base": args.lambda_base,
        "lambda_sparse": args.lambda_sparse,
        "lowpass_kernel": args.lowpass_kernel,
        "lambda_edge": args.lambda_edge,
        "lambda_smooth": args.lambda_smooth,
        "lambda_l1": args.lambda_l1,
        "lambda_task": args.lambda_task,
        "lambda_response": args.lambda_response,
        "lambda_feature": args.lambda_feature,
        "lambda_bin": args.lambda_bin,
        "ce_weight": args.ce_weight,
        "regression_weight": args.regression_weight,
        "offset_reg_weight": args.offset_reg_weight,
        "coarse_weight": args.coarse_weight,
        "final_weight": args.final_weight,
        "sid_alpha": args.sid_alpha,
        "soft_ce_sigma": args.soft_ce_sigma,
        "use_focal": args.use_focal,
    }.items() if v is not None}
    if extra_updates:
        from ..configs import apply_overrides

        merged = dict(cfg.model.extra)
        merged.update(extra_updates)
        cfg = apply_overrides(cfg, {"model.extra": merged})
    # generic dotted overrides land last so they can touch anything,
    # including model.extra.* subkeys
    if args.override:
        from ..configs import apply_overrides

        # apply_overrides handles model.extra.* subkeys and the NULL
        # sentinel (KEY=null really clears a field)
        cfg = apply_overrides(
            cfg, dict(_parse_override(spec) for spec in args.override))
    return cfg


def fold_holdout_args(args) -> None:
    """Fold the reference's sequence-holdout spelling into holdout_locations.

    train.py:76-82: both named sequences are blacklisted from train/val;
    the eval seq additionally gets a holdout eval loader — ours builds one
    per holdout location, which covers both roles.
    """
    seq_holdouts = [s for s in (args.holdout_test_seq, args.holdout_eval_seq) if s]
    if seq_holdouts:
        args.holdout_locations = list(args.holdout_locations or []) + seq_holdouts
    elif args.sequence_holdout and not args.holdout_locations:
        raise SystemExit("--sequence_holdout needs --holdout_test_seq/"
                         "--holdout_eval_seq or --holdout_locations")


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..compilation_cache import enable as _enable_compile_cache

    _enable_compile_cache()
    from ..ckpt import BestTracker, CheckpointManager
    from ..configs import experiment_name, to_dict
    from ..data.batvision import make_dataset
    from ..data.bins import add_bins_to_batch
    from ..models import make_task
    from ..obs import MetricLogger
    from ..parallel.mesh import make_mesh
    from ..train import Engine

    # wandb-sweep integration (train.py:139-202): init early; sweep config
    # values override matching CLI args before the config is built.
    if args.use_wandb:
        try:
            import wandb

            init_kwargs = {"project": args.wandb_project, "allow_val_change": True}
            if args.wandb_entity:
                init_kwargs["entity"] = args.wandb_entity
            if args.wandb_mode:
                init_kwargs["mode"] = args.wandb_mode
            wandb.init(**init_kwargs)
            for key, value in dict(wandb.config).items():
                if hasattr(args, key) and value is not None:
                    setattr(args, key, value)
                    print(f"[sweep] override {key}={value}")
        except Exception as e:
            print(f"[train] wandb unavailable ({e}); continuing without")

    cfg = config_from_args(args)
    fold_holdout_args(args)
    if args.eval_img:
        if cfg.dataset.name == "batvisionv1":
            raise SystemExit("--eval_img is not supported on batvisionv1 "
                             "(no camera images; train.py:322-323)")
        from ..configs import apply_overrides

        cfg = apply_overrides(cfg, {"model.input_nc": 3})
    # experiment-name suffixes mirror the reference assembly
    # (train.py:288-313): [_IMG][_holdout_{locs}]
    suffixes = []
    if args.eval_img:
        suffixes.append("IMG")
    if args.holdout_locations:
        suffixes.append("holdout_" + "_".join(args.holdout_locations))
    exp = experiment_name(cfg, suffix="_".join(suffixes))
    print(f"experiment: {exp}")

    needs_bins = cfg.model.name == "coarse_depth"
    with_image = args.eval_img or cfg.model.name in ("rgb_depth", "adabins_distillation")

    if args.sparse_method:
        # the coarse family's defining data path: preprocessed
        # sparse_depth_{method}/ targets (train_coarse_depth.py:133-645)
        if cfg.dataset.name != "batvisionv2":
            raise SystemExit(
                "--sparse_method requires the batvisionv2 corpus layout "
                "(per-location sparse_depth_{method}/ folders from "
                "tools/preprocess_sparse_depth)"
            )
        from ..data.sparse_depth import BinnedSparseDepthDataset, SparseDepthDataset

        sp_kwargs = dict(
            sparse_depth_method=args.sparse_method,
            use_original_depth=args.use_original_depth,
        )
        if args.holdout_locations:
            sp_kwargs["location_blacklist"] = args.holdout_locations
        if needs_bins:
            # bin parameters identical to CoarseDepthTask's so the dataset's
            # precomputed 'bins' targets match the model's bin centers
            extra = cfg.model.extra
            sp_kwargs.update(
                n_bins=cfg.model.n_bins, bin_mode=cfg.model.bin_strategy,
                depth_min=float(extra.get("depth_min", 0.1)),
                sid_alpha=float(extra.get("sid_alpha", 0.6)),
            )
            ds_cls = BinnedSparseDepthDataset
        else:
            ds_cls = SparseDepthDataset
        train_ds = ds_cls(cfg, cfg.dataset.annotation_file_train, **sp_kwargs)
        val_ds = ds_cls(cfg, cfg.dataset.annotation_file_val, **sp_kwargs)
    else:
        train_kwargs = {}
        if cfg.dataset.name == "synthetic":
            train_kwargs["with_image"] = with_image
            train_kwargs["num_samples"] = args.num_samples
        elif args.holdout_locations:
            train_kwargs["location_blacklist"] = args.holdout_locations
        if with_image and cfg.dataset.name == "batvisionv2":
            # rgb teacher / --eval_img: images only; distillation: paired
            train_kwargs["use_image"] = (
                True if (cfg.model.name == "rgb_depth" or args.eval_img) else "both"
            )

        # held-out locations are blacklisted from train AND val
        # (train.py:326,330) so val metrics / best-model selection never see
        # the holdout sequences
        val_kwargs = dict(train_kwargs)
        val_kwargs.pop("num_samples", None)

        train_ds = make_dataset(cfg, "train", **train_kwargs)
        val_ds = make_dataset(cfg, "val", **val_kwargs)
    print(f"train: {len(train_ds)} samples, val: {len(val_ds)} samples")

    task = make_task(cfg)
    # data-parallel mesh: batch must divide evenly; use the largest device
    # count <= available that divides the global batch
    n_dev_req = args.num_devices or jax.device_count()
    n_dev = n_dev_req
    while n_dev > 1 and cfg.mode.batch_size % n_dev != 0:
        n_dev -= 1
    if n_dev != n_dev_req:
        print(f"WARNING: batch_size {cfg.mode.batch_size} does not divide "
              f"{n_dev_req} devices; training on {n_dev} device(s). Pick a "
              f"batch size divisible by the device count to use all chips.")
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    steps_per_epoch = max(len(train_ds) // cfg.mode.batch_size, 1)
    eng = Engine(cfg, task, mesh=mesh, steps_per_epoch=steps_per_epoch)

    def wrap(it):
        for b in it:
            if needs_bins and "bins" not in b:
                b = add_bins_to_batch(b, task.bin_edges, cfg.dataset.max_depth,
                                      cfg.dataset.depth_norm)
            yield b

    if args.device_cache:
        from ..data.device_cache import DeviceDatasetCache

        cache_train, cache_val = train_ds, val_ds
        if needs_bins:
            # precompute int bin targets into the cache (host bucketize once)
            from ..data.bins import depth_to_bins_np

            class _BinnedView:
                def __init__(self, ds):
                    self._ds = ds

                def __len__(self):
                    return len(self._ds)

                def sample(self, i):
                    s = self._ds.sample(i)
                    d = s["depth"][..., 0]
                    if cfg.dataset.depth_norm:
                        d = d * cfg.dataset.max_depth
                    s["bins"] = depth_to_bins_np(d, task.bin_edges)
                    return s

            cache_train, cache_val = _BinnedView(train_ds), _BinnedView(val_ds)

        from ..data.codec import depth_storage_units

        units = depth_storage_units(cfg)
        # under a mesh, shard the cached split row-wise across the data
        # axis: every chip's HBM carries 1/n of the corpus and the per-step
        # gather rides ICI, instead of pinning the whole split (and every
        # gather) to device 0
        cache_sharding = None
        if mesh is not None:
            from ..parallel.mesh import batch_sharding

            cache_sharding = batch_sharding(mesh, cfg.mode.data_axis)
        train_src = DeviceDatasetCache(cache_train, max_depth_units=units,
                                       sharding=cache_sharding)
        val_src = DeviceDatasetCache(cache_val, max_depth_units=units,
                                     sharding=cache_sharding)
        print(f"device cache: {train_src.nbytes() / 1e6:.0f} MB train, "
              f"{val_src.nbytes() / 1e6:.0f} MB val in HBM")
    else:
        train_src, val_src = train_ds, val_ds

    # per-epoch reshuffle stream, offset by mode.seed so --seed changes
    # both init AND the data order
    epoch_seed = [int(cfg.mode.seed) * 100_003]

    def train_batches():
        epoch_seed[0] += 1
        return wrap(train_src.batches(cfg.mode.batch_size, shuffle=cfg.mode.shuffle,
                                      seed=epoch_seed[0]))

    def val_batches():
        # keep the ragged tail: with val splits smaller than the train batch
        # size, drop_last would silently evaluate nothing
        return wrap(val_src.batches(cfg.mode.batch_size, shuffle=False,
                                    drop_last=False))

    holdout = None
    if args.holdout_locations and hasattr(train_ds, "filter_by_audio_path"):
        from ..data.batvision import make_dataset as _mk

        full = _mk(cfg, "train")
        # drop_last=False: a holdout location with fewer samples than the
        # batch size must still evaluate (train.py:915-999)
        holdout = {
            loc: (lambda l=loc: wrap(
                full.filter_by_audio_path(l).batches(
                    cfg.mode.batch_size, shuffle=False, drop_last=False)
            ))
            for loc in args.holdout_locations
        }

    sample = next(train_batches())
    state = eng.init_state(jax.random.PRNGKey(cfg.mode.seed), sample)

    mgr = CheckpointManager(args.ckpt_dir, exp)
    start_epoch = 1
    if args.init_from_torch:
        if args.resume or args.checkpoints is not None:
            raise SystemExit(
                "--init_from_torch conflicts with --resume/--checkpoints: "
                "a torch warm-start IS the reference's resume (weights "
                "only); drop one of the flags")
        from ..tools import import_torch as itorch

        sd = itorch.load_torch_state_dict(args.init_from_torch)
        variables = itorch.import_for_config(cfg, sd)
        itorch.check_structure(
            variables,
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        state = state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", state.batch_stats),
        )
        aux = itorch.load_torch_aux(args.init_from_torch)
        task.restore_aux(aux)
        if aux.get("epoch") is not None:
            start_epoch = int(aux["epoch"]) + 1
        print(f"warm-started from torch checkpoint {args.init_from_torch} "
              f"({len(sd)} tensors), starting at epoch {start_epoch}")
    elif args.resume or args.checkpoints is not None:
        try:
            state, _, restored = mgr.restore(state, epoch=args.checkpoints)
            start_epoch = restored + 1
            print(f"resumed from epoch {restored}")
        except FileNotFoundError:
            print("no checkpoint found; training from scratch")

    vis_callback = None
    if not args.no_visualize:
        import os as _os

        import numpy as _np

        from ..obs import save_batch_visualization

        vis_dir = _os.path.join(args.results_dir, exp)

        def vis_callback(epoch, first_batch, pred_m):
            from ..data.codec import depth_storage_units

            units = depth_storage_units(cfg)
            gt = _np.asarray(first_batch["depth"])
            if gt.dtype == _np.uint16:  # compact transport form
                gt = gt.astype(_np.float32) * (units / 65535.0)
            if cfg.dataset.depth_norm:
                gt = gt * cfg.dataset.max_depth
            png = _os.path.join(vis_dir, f"val_epoch{epoch}.png")
            save_batch_visualization(
                gt, pred_m, png, max_depth=cfg.dataset.max_depth,
            )
            # wandb image logging (train.py:861-871 wandb.Image parity);
            # `logger` is assigned below, before fit() invokes this callback
            if logger is not None:
                logger.log_image("val/visualization", png, step=epoch)

    logger = MetricLogger(args.log_dir, exp, use_wandb=args.use_wandb,
                          wandb_project=args.wandb_project,
                          wandb_entity=args.wandb_entity,
                          wandb_mode=args.wandb_mode,
                          config=to_dict(cfg))
    # architecture dump (train.py:576-597 architecture.txt equivalent)
    try:
        import os as _os

        from ..models.layers import count_params

        arch_path = _os.path.join(args.log_dir, f"{exp}_architecture.txt")
        with open(arch_path, "w") as f:
            f.write(f"experiment: {exp}\nconfig: {to_dict(cfg)}\n")
            f.write(f"model: {type(task.model).__name__}\n")
            f.write(f"params: {count_params(state.params):,}\n\n")
            # full module tree (the reference writes the whole nn.Module
            # repr to architecture.txt, train.py:576-597)
            f.write(task.tabulate(sample))
    except Exception as e:
        print(f"[train] architecture dump skipped: {e}")
    best = BestTracker(args.best_metric)
    profiler = None
    if args.profile_dir:
        from ..obs.logging import ProfilerHook

        profiler = ProfilerHook(args.profile_dir)
    state = eng.fit(
        state, train_batches, val_batches,
        start_epoch=start_epoch,
        ckpt_manager=mgr, best_tracker=best, logger=logger,
        holdout_batches=holdout, vis_callback=vis_callback,
        profiler=profiler,
    )
    mgr.wait()
    logger.close()
    if best.best_epoch is not None:
        print(f"best {args.best_metric}: {best.best_value:.4f} @ epoch {best.best_epoch}")
    return state


if __name__ == "__main__":
    main()
