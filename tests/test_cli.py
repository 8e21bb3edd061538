"""End-to-end CLI tests: train on synthetic, then evaluate the checkpoint."""

import os

import numpy as np
import pytest

from audiodepth_tpu.cli.evaluate import main as eval_main
from audiodepth_tpu.cli.train import build_parser, config_from_args, main as train_main


def test_smart_criterion_inference():
    args = build_parser().parse_args(["--l1_weight", "0.5"])
    cfg = config_from_args(args)
    assert cfg.mode.criterion == "Combined"
    assert cfg.mode.l1_weight == 0.5
    args2 = build_parser().parse_args(["--criterion", "L1"])
    assert config_from_args(args2).mode.criterion == "L1"


def test_lr_bound_rejected():
    args = build_parser().parse_args(["--learning_rate", "0.5"])
    with pytest.raises(ValueError):
        config_from_args(args)


def test_train_then_evaluate_synthetic(tmp_path):
    ckpt = str(tmp_path / "ck")
    logs = str(tmp_path / "lg")
    train_main([
        "--dataset", "synthetic", "--model", "unet_baseline",
        "--experiment_name", "clismoke",
        "--generator", "unet_128", "--ngf", "4",
        "--epochs", "2", "--batch_size", "4", "--num_samples", "8",
        "--compute_dtype", "float32",
        "--ckpt_dir", ckpt, "--log_dir", logs,
    ])
    # dataset.images_size stays 256 for unet_128? no — must shrink; the run
    # above uses full 256² with unet_128 (7 downs OK at 256).
    exp_dirs = os.listdir(ckpt)
    assert len(exp_dirs) == 1
    means = eval_main([
        "--dataset", "synthetic", "--model", "unet_baseline",
        "--experiment_name", exp_dirs[0],
        "--generator", "unet_128", "--ngf", "4", "--compute_dtype", "float32",
        "--eval_on", "val", "--batch_size", "4",
        "--ckpt_dir", ckpt, "--stat_dir", str(tmp_path / "eval"),
        "--visualize", "--results_dir", str(tmp_path / "res"),
        "--vis_batch_size", "3",
    ])
    assert np.isfinite(means["rmse"])
    # stats artifact exists
    stat_root = tmp_path / "eval" / "synthetic" / "val"
    assert any(f.suffix == ".npz" for f in stat_root.iterdir())
    # full-set visualization: PNG per --vis_batch_size samples across the
    # WHOLE eval set under {results_dir}/{exp}/{eval_on} (test.py:222-320),
    # including a ragged final group
    n_val = len(np.load(stat_root / next(
        f.name for f in stat_root.iterdir() if f.suffix == ".npz"))["rmse"])
    vis_dir = tmp_path / "res" / exp_dirs[0] / "val"
    pngs = sorted(f.name for f in vis_dir.iterdir() if f.suffix == ".png")
    assert len(pngs) == -(-n_val // 3)
    assert pngs[0] == "batch_0000_samples_0000-0002.png"
    last_lo = (len(pngs) - 1) * 3
    assert pngs[-1] == (
        f"batch_{len(pngs)-1:04d}_samples_{last_lo:04d}-{n_val-1:04d}.png")
    # jsonl log exists with val metrics
    log_file = next((tmp_path / "lg").glob("*.jsonl"))
    assert "val/rmse" in log_file.read_text()

    # --use_best resolves the best-validation epoch via best.json
    assert (tmp_path / "ck" / exp_dirs[0] / "best.json").exists()
    means_best = eval_main([
        "--dataset", "synthetic", "--model", "unet_baseline",
        "--experiment_name", exp_dirs[0], "--use_best",
        "--generator", "unet_128", "--ngf", "4", "--compute_dtype", "float32",
        "--eval_on", "val", "--batch_size", "4",
        "--ckpt_dir", ckpt, "--stat_dir", str(tmp_path / "eval"),
    ])
    assert np.isfinite(means_best["rmse"])

    # --checkpoint_path auto-extracts the experiment name (test.py:30-62)
    means_path = eval_main([
        "--dataset", "synthetic", "--model", "unet_baseline",
        "--checkpoint_path", os.path.join(ckpt, exp_dirs[0]),
        "--generator", "unet_128", "--ngf", "4", "--compute_dtype", "float32",
        "--eval_on", "val", "--batch_size", "4",
        "--stat_dir", str(tmp_path / "eval"),
    ])
    assert means_path["rmse"] == pytest.approx(means["rmse"], rel=1e-5)


def test_evaluate_image_families(tmp_path):
    """Eval CLI works for image-input families (VERDICT missing #3):
    rgb_depth and an --eval_img-trained baseline."""
    ckpt = str(tmp_path / "ck")
    common = [
        "--dataset", "synthetic", "--base_channels", "8", "--ngf", "4",
        "--generator", "unet_128", "--compute_dtype", "float32",
        "--epochs", "2", "--batch_size", "2", "--num_samples", "4",
        "--no_visualize",
        "--ckpt_dir", ckpt, "--log_dir", str(tmp_path / "lg"),
    ]
    train_main(["--model", "rgb_depth", "--experiment_name", "rgbev"] + common)
    train_main(["--model", "unet_baseline", "--eval_img",
                "--experiment_name", "imgev"] + common)
    for model, exp in (("rgb_depth", "rgbev"), ("unet_baseline", "imgev")):
        exp_dir = next(d for d in os.listdir(ckpt) if exp in d)
        argv = [
            "--dataset", "synthetic", "--model", model,
            "--experiment_name", exp_dir,
            "--base_channels", "8", "--ngf", "4", "--generator", "unet_128",
            "--compute_dtype", "float32",
            "--eval_on", "val", "--batch_size", "2",
            "--ckpt_dir", ckpt, "--stat_dir", str(tmp_path / "eval"),
        ]
        if model == "unet_baseline":
            argv.append("--eval_img")
        means = eval_main(argv)
        assert np.isfinite(means["rmse"])


def test_eval_img_baseline(tmp_path):
    train_main([
        "--dataset", "synthetic", "--model", "unet_baseline", "--eval_img",
        "--experiment_name", "imgsmoke",
        "--generator", "unet_128", "--ngf", "4",
        "--epochs", "1", "--batch_size", "2", "--num_samples", "4",
        "--compute_dtype", "float32",
        "--ckpt_dir", str(tmp_path / "ck"), "--log_dir", str(tmp_path / "lg"),
    ])
    assert any("IMG" in d for d in os.listdir(tmp_path / "ck"))


def test_eval_img_rejected_on_bv1():
    with pytest.raises(SystemExit):
        train_main(["--dataset", "batvisionv1", "--eval_img"])


def test_device_cache_training(tmp_path):
    train_main([
        "--dataset", "synthetic", "--model", "coarse_depth",
        "--model_type", "lite", "--n_bins", "8", "--base_channels", "8",
        "--experiment_name", "cachesmoke", "--device_cache",
        "--epochs", "2", "--batch_size", "4", "--num_samples", "8",
        "--compute_dtype", "float32", "--no_visualize",
        "--ckpt_dir", str(tmp_path / "ck"), "--log_dir", str(tmp_path / "lg"),
    ])
    log_file = next((tmp_path / "lg").glob("*.jsonl"))
    assert "val/rmse" in log_file.read_text()


def test_profile_dir_writes_trace(tmp_path):
    """--profile_dir traces the first post-compile epoch (ProfilerHook)."""
    prof = tmp_path / "prof"
    train_main([
        "--dataset", "synthetic", "--model", "coarse_depth",
        "--model_type", "lite", "--n_bins", "8", "--base_channels", "8",
        "--experiment_name", "profsmoke", "--profile_dir", str(prof),
        "--epochs", "2", "--batch_size", "4", "--num_samples", "8",
        "--compute_dtype", "float32", "--no_visualize",
        "--ckpt_dir", str(tmp_path / "ck"), "--log_dir", str(tmp_path / "lg"),
    ])
    traces = list(prof.glob("plugins/profile/*/*"))
    assert traces, f"no profiler artifacts under {prof}"


def test_resume_training(tmp_path, capsys):
    common = [
        "--dataset", "synthetic", "--model", "unet_baseline",
        "--experiment_name", "resumesmoke",
        "--generator", "unet_128", "--ngf", "4",
        "--batch_size", "4", "--num_samples", "8",
        "--compute_dtype", "float32", "--no_visualize",
        "--ckpt_dir", str(tmp_path / "ck"), "--log_dir", str(tmp_path / "lg"),
    ]
    # epochs=2 saves the best checkpoint at the epoch-2 validation
    train_main(common + ["--epochs", "2"])
    capsys.readouterr()
    train_main(common + ["--epochs", "4", "--resume"])
    out = capsys.readouterr().out
    assert "resumed from epoch" in out


def test_holdout_training_bv2(tmp_path, capsys):
    """End-to-end holdout semantics (train.py:294-373,915-999):
    held-out locations are blacklisted from train AND val, holdout metrics
    appear even when n_holdout < batch_size, and the experiment name carries
    the _holdout_ suffix."""
    from tests.test_batvision_data import write_wav

    rng = np.random.default_rng(5)
    # Hall: 4 train / 2 val rows; Office (held out): 1 train / 1 val row
    for loc, n_train, n_val in (("Hall", 4, 2), ("Office", 1, 1)):
        d = tmp_path / "data" / loc
        (d / "audio").mkdir(parents=True)
        (d / "depth").mkdir()
        rows = []
        for i in range(max(n_train, n_val)):
            np.save(d / "depth" / f"d{i}.npy",
                    rng.uniform(0, 40000, size=(32, 32)).astype(np.float32))
            write_wav(d / "audio" / f"a{i}.wav",
                      rng.normal(0, 0.1, size=(2, 8500)).astype(np.float32))
            rows.append(f"{loc}/audio,a{i}.wav,{loc}/depth,d{i}.npy")
        header = "audio path,audio file name,depth path,depth file name\n"
        (d / "train.csv").write_text(header + "\n".join(rows[:n_train]) + "\n")
        (d / "val.csv").write_text(header + "\n".join(rows[:n_val]) + "\n")

    train_main([
        "--dataset", "batvisionv2", "--dataset_dir", str(tmp_path / "data"),
        "--model", "unet_baseline", "--experiment_name", "holdsmoke",
        "--generator", "unet_128", "--ngf", "4",
        "--epochs", "2", "--batch_size", "2", "--compute_dtype", "float32",
        "--holdout_locations", "Office", "--no_visualize",
        "--ckpt_dir", str(tmp_path / "ck"), "--log_dir", str(tmp_path / "lg"),
    ])
    out = capsys.readouterr().out
    # val excludes the held-out location: only Hall's 2 val rows remain
    assert "train: 4 samples, val: 2 samples" in out
    # holdout evaluated despite 1 sample < batch_size 2 (drop_last=False)
    log = next((tmp_path / "lg").glob("*.jsonl")).read_text()
    assert "holdout/Office/rmse" in log
    # experiment identity carries the holdout suffix (train.py:288-313)
    assert any("holdout_Office" in d for d in os.listdir(tmp_path / "ck"))


def test_sparse_coarse_workflow(tmp_path):
    """The reference's coarse workflow twin (train_coarse_depth.py:133-645):
    preprocess sparse targets offline, then train the coarse family on them."""
    from audiodepth_tpu.tools.preprocess_sparse_depth import main as prep_main
    from tests.test_batvision_data import write_wav

    rng = np.random.default_rng(7)
    d = tmp_path / "data" / "Hall"
    (d / "audio").mkdir(parents=True)
    (d / "depth").mkdir()
    rows = []
    for i in range(4):
        np.save(d / "depth" / f"depth_{i}.npy",
                rng.uniform(500, 29000, size=(32, 32)).astype(np.float32))
        write_wav(d / "audio" / f"a{i}.wav",
                  rng.normal(0, 0.1, size=(2, 8500)).astype(np.float32))
        rows.append(f"Hall/audio,a{i}.wav,Hall/depth,depth_{i}.npy")
    header = "audio path,audio file name,depth path,depth file name\n"
    (d / "train.csv").write_text(header + "\n".join(rows) + "\n")
    (d / "val.csv").write_text(header + "\n".join(rows[:2]) + "\n")

    prep_main(["--dataset_dir", str(tmp_path / "data"), "--method", "downup_015"])
    assert (d / "sparse_depth_downup_015" / "depth_0.npy").exists()

    train_main([
        "--dataset", "batvisionv2", "--dataset_dir", str(tmp_path / "data"),
        "--model", "coarse_depth", "--model_type", "lite",
        "--n_bins", "8", "--base_channels", "8",
        "--experiment_name", "sparsesmoke", "--sparse_method", "downup_015",
        "--epochs", "2", "--batch_size", "2", "--compute_dtype", "float32",
        "--no_visualize",
        "--ckpt_dir", str(tmp_path / "ck"), "--log_dir", str(tmp_path / "lg"),
    ])
    log = next((tmp_path / "lg").glob("*.jsonl")).read_text()
    assert "val/rmse" in log


def test_sparse_method_requires_bv2_layout():
    with pytest.raises(SystemExit):
        train_main(["--dataset", "synthetic", "--model", "coarse_depth",
                    "--sparse_method", "downup_015"])


def test_family_knob_flags():
    """Reference driver flags (train_base_residual.py:132-135,
    train_cvae.py:131-143, ...) reach the task configuration."""
    from audiodepth_tpu.models import make_task

    args = build_parser().parse_args([
        "--model", "base_residual", "--warmup_epochs", "7",
        "--no-use_adaptive_loss", "--recon", "l1",
    ])
    cfg = config_from_args(args)
    task = make_task(cfg)
    assert task.warmup_epochs == 7
    assert task.use_adaptive is False
    assert task.recon == "l1"

    args2 = build_parser().parse_args([
        "--model", "unet_cvae", "--kl_weight", "0.01", "--latent_dim", "32",
    ])
    cfg2 = config_from_args(args2)
    assert cfg2.model.kl_weight == 0.01
    assert cfg2.model.latent_dim == 32

    args3 = build_parser().parse_args([
        "--model", "binaural_attention", "--loss_type", "edge_aware",
    ])
    assert make_task(config_from_args(args3)).loss_type == "edge_aware"

    args4 = build_parser().parse_args([
        "--model", "adabins_distillation", "--temperature", "2.0",
        "--use_adaptive_loss",
    ])
    task4 = make_task(config_from_args(args4))
    assert task4.temperature == 2.0
    assert task4.adaptive is True


def test_architecture_dump_and_device_warning(tmp_path, capsys):
    """The architecture dump contains the full nn.tabulate module tree, and
    a batch size that does not divide the requested device count prints a
    visible shrink warning instead of silently training on fewer chips."""
    train_main([
        "--dataset", "synthetic", "--model", "unet_baseline",
        "--experiment_name", "archdump",
        "--generator", "unet_128", "--ngf", "4",
        "--epochs", "1", "--batch_size", "5", "--num_samples", "5",
        "--num_devices", "2",  # 5 % 2 != 0 → shrink to 1 with a warning
        "--compute_dtype", "float32",
        "--ckpt_dir", str(tmp_path / "ck"), "--log_dir", str(tmp_path / "lg"),
        "--no_visualize",
    ])
    out = capsys.readouterr().out
    assert "WARNING" in out and "does not divide" in out
    arch = next((tmp_path / "lg").glob("*architecture.txt")).read_text()
    # full module tree, not just a param count: per-module rows present
    assert "UNetGenerator" in arch
    assert "ConvDown" in arch and "ConvUp" in arch
    assert "params:" in arch


def test_remat_flag_reaches_models():
    """--remat/--no-remat plumbs through model.extra to both remat users.

    Defaults differ per family (RESULTS.md remat ablations): binaural ON
    (bs>=64 needs it to fit 16 GB HBM; off is 94.1 vs 87.4 pairs/s at
    bs=32), adabins OFF (fits through bs=64 without it; remat costs
    28-33%: 142 vs 111 pairs/s at bs=32).
    """
    from audiodepth_tpu.cli.train import build_parser, config_from_args
    from audiodepth_tpu.models import make_task

    def build(argv):
        return make_task(config_from_args(build_parser().parse_args(argv)))

    base = ["--dataset", "synthetic", "--base_channels", "8",
            "--batch_size", "2"]
    assert build(["--model", "binaural_attention", "--no-remat"] + base
                 ).model.remat is False
    assert build(["--model", "adabins_distillation", "--remat"] + base
                 ).model.remat is True
    assert build(["--model", "binaural_attention"] + base).model.remat is True
    assert build(["--model", "adabins_distillation"] + base).model.remat is False


def test_driver_loss_weight_flags_reach_tasks():
    """Every reference driver's tunable loss weight is a CLI flag here, with
    the DRIVER argparse defaults as the task defaults — the reference's
    default run passes its argparse values into the criteria, NOT the loss
    classes' own defaults (train_adabins_distillation.py:179-187 vs
    utils_distillation_loss.py:32-47; train_coarse_depth.py:148-186 vs
    coarse_depth_model.py:783-790)."""
    from audiodepth_tpu.models import make_task

    def build(argv):
        return make_task(config_from_args(build_parser().parse_args(argv)))

    # adabins: driver defaults 1.0/0.5/0.3/0.2/0.1
    t = build(["--model", "adabins_distillation", "--dataset", "synthetic"])
    assert (t.lambda_task, t.lambda_response, t.lambda_feature,
            t.lambda_bin, t.lambda_sparse) == (1.0, 0.5, 0.3, 0.2, 0.1)
    t = build(["--model", "adabins_distillation", "--dataset", "synthetic",
               "--lambda_task", "2.0", "--lambda_bin", "0.05"])
    assert t.lambda_task == 2.0 and t.lambda_bin == 0.05

    # base_residual: λ's + lowpass kernel (train_base_residual.py:136-142)
    t = build(["--model", "base_residual", "--dataset", "synthetic"])
    assert (t.lambda_recon, t.lambda_base, t.lambda_sparse,
            t.lowpass_kernel) == (1.0, 1.2, 0.05, 16)
    t = build(["--model", "base_residual", "--dataset", "synthetic",
               "--lambda_base", "0.8", "--lowpass_kernel", "8"])
    assert t.lambda_base == 0.8 and t.lowpass_kernel == 8

    # binaural edge-aware weights (class defaults; driver flags commented out)
    t = build(["--model", "binaural_attention", "--dataset", "synthetic",
               "--base_channels", "8", "--loss_type", "edge_aware",
               "--lambda_edge", "0.4"])
    assert t.lambda_edge == 0.4 and t.lambda_smooth == 0.1

    # rgb teacher (train_rgb_depth.py:126-128)
    t = build(["--model", "rgb_depth", "--dataset", "synthetic",
               "--lambda_smooth", "0.25"])
    assert t.lambda_l1 == 1.0 and t.lambda_smooth == 0.25

    # coarse: driver defaults incl. hybrid regression 0.5 / offset_reg 0.01
    t = build(["--model", "coarse_depth", "--dataset", "synthetic",
               "--model_type", "hybrid"])
    assert (t.ce_weight, t.regression_weight, t.offset_reg_weight) == (1.0, 0.5, 0.01)
    assert t.ce_mode == "soft_ce" and t.soft_ce_sigma == 2.0
    t = build(["--model", "coarse_depth", "--dataset", "synthetic",
               "--model_type", "unet", "--use_focal", "--ce_weight", "2.0"])
    assert t.ce_mode == "focal" and t.ce_weight == 2.0


def test_general_reference_flags():
    """--audio_format/--max_depth/--validation*/--weight_decay/--use_silog
    and the generic --override escape hatch (train.py:69-113)."""
    args = build_parser().parse_args([
        "--dataset", "synthetic", "--audio_format", "spectrogram",
        "--max_depth", "25", "--validation", "false",
        "--validation_iter", "5", "--weight_decay", "0.05",
        "--use_silog", "false",
        "--override", "model.extra.depth_min=0.2",
        "--override", "mode.num_threads=8",
    ])
    cfg = config_from_args(args)
    assert cfg.dataset.audio_format == "spectrogram"
    assert cfg.dataset.max_depth == 25.0
    assert cfg.mode.validation is False and cfg.mode.validation_iter == 5
    assert cfg.mode.weight_decay == 0.05
    # --use_silog auto-enables Combined (train.py:99-101) and false zeroes it
    assert cfg.mode.criterion == "Combined" and cfg.mode.silog_weight == 0.0
    assert cfg.model.extra["depth_min"] == 0.2
    assert cfg.mode.num_threads == 8

    # --use_silog true: Combined with the preset weights kept
    cfg2 = config_from_args(build_parser().parse_args(
        ["--dataset", "synthetic", "--use_silog", "true"]))
    assert cfg2.mode.criterion == "Combined" and cfg2.mode.silog_weight > 0


def test_sequence_holdout_aliases():
    """train.py:76-82 spelling folds into holdout_locations."""
    from audiodepth_tpu.cli.train import fold_holdout_args

    args = build_parser().parse_args([
        "--sequence_holdout", "--holdout_test_seq", "Salle_Chevalier",
        "--holdout_eval_seq", "3rd_Floor_Luxembourg",
    ])
    fold_holdout_args(args)
    assert args.holdout_locations == ["Salle_Chevalier", "3rd_Floor_Luxembourg"]

    bare = build_parser().parse_args(["--sequence_holdout"])
    with pytest.raises(SystemExit):
        fold_holdout_args(bare)


def test_train_then_evaluate_adabins(tmp_path):
    """adabins training checkpoints carry the frozen RGB teacher subtree;
    the eval CLI must init a matching template (it used to fail the orbax
    restore with 'tree structures do not match')."""
    ckpt = str(tmp_path / "ck")
    train_main([
        "--dataset", "synthetic", "--model", "adabins_distillation",
        "--experiment_name", "adaevalsmoke", "--base_channels", "8",
        "--n_bins", "8", "--epochs", "1", "--batch_size", "2",
        "--num_samples", "4", "--compute_dtype", "float32", "--no_visualize",
        "--ckpt_dir", ckpt, "--log_dir", str(tmp_path / "lg"),
    ])
    exp = os.listdir(ckpt)[0]
    means = eval_main([
        "--dataset", "synthetic", "--model", "adabins_distillation",
        "--experiment_name", exp, "--base_channels", "8", "--n_bins", "8",
        "--compute_dtype", "float32", "--eval_on", "val", "--batch_size", "2",
        "--ckpt_dir", ckpt, "--stat_dir", str(tmp_path / "eval"),
    ])
    assert np.isfinite(means["rmse"])


def test_coarse_eval_restores_trained_bins(tmp_path):
    """Coarse checkpoints embed bin_edges/bin_centers; evaluation must adopt
    them — a checkpoint trained with --bin_strategy linear has the same
    param shapes as the sid default, so without restore_aux the forward
    would silently soft-bin over the wrong centers."""
    from audiodepth_tpu.ckpt import CheckpointManager
    from audiodepth_tpu.configs import load_config
    from audiodepth_tpu.models import make_task

    ckpt = str(tmp_path / "ck")
    train_main([
        "--dataset", "synthetic", "--model", "coarse_depth",
        "--model_type", "lite", "--base_channels", "8", "--n_bins", "8",
        "--bin_strategy", "linear", "--experiment_name", "binrestore",
        "--epochs", "1", "--batch_size", "2", "--num_samples", "4",
        "--compute_dtype", "float32", "--no_visualize",
        "--ckpt_dir", ckpt, "--log_dir", str(tmp_path / "lg"),
    ])
    exp = os.listdir(ckpt)[0]
    _, _, aux, _ = CheckpointManager(ckpt, exp).restore_eval()
    # trained centers are linear (evenly spaced)
    diffs = np.diff(np.asarray(aux["bin_centers"]))
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-4)

    over = {"model.model_type": "lite", "model.base_channels": 8,
            "model.n_bins": 8}
    task = make_task(load_config("synthetic", "test", exp, "coarse_depth",
                                 overrides=over))  # default sid centers
    default_centers = np.asarray(task.bin_centers)
    task.restore_aux(aux)
    assert not np.allclose(np.asarray(task.bin_centers), default_centers)
    np.testing.assert_allclose(np.asarray(task.bin_centers),
                               np.asarray(aux["bin_centers"]))
    # a bin-count mismatch fails loudly, not silently
    task16 = make_task(load_config("synthetic", "test", exp, "coarse_depth",
                                   overrides={**over, "model.n_bins": 16}))
    with pytest.raises(ValueError, match="bins"):
        task16.restore_aux(aux)

    # end-to-end: the eval CLI (no --bin_strategy flag) adopts the bins
    means = eval_main([
        "--dataset", "synthetic", "--model", "coarse_depth",
        "--model_type", "lite", "--base_channels", "8", "--n_bins", "8",
        "--compute_dtype", "float32", "--eval_on", "val", "--batch_size", "2",
        "--experiment_name", exp,
        "--ckpt_dir", ckpt, "--stat_dir", str(tmp_path / "eval"),
    ])
    assert np.isfinite(means["rmse"])


def test_init_from_torch_warm_start(tmp_path, capsys):
    """--init_from_torch continues a reference training run on TPU: weights
    load, the optimizer starts fresh, and the epoch counter resumes from
    the .pth wrapper's saved epoch + 1 (train.py:603-606 semantics)."""
    from audiodepth_tpu.ckpt import CheckpointManager
    from audiodepth_tpu.tools.export_torch import main as export_torch_main

    shape = ["--generator", "unet_128", "--ngf", "4"]
    ckpt = str(tmp_path / "ck")
    train_main([
        "--dataset", "synthetic", "--model", "unet_baseline",
        "--experiment_name", "warmsrc", *shape,
        "--epochs", "3", "--batch_size", "2", "--num_samples", "4",
        "--compute_dtype", "float32", "--no_visualize",
        "--ckpt_dir", ckpt, "--log_dir", str(tmp_path / "lg"),
    ])
    exp = os.listdir(ckpt)[0]
    pth = str(tmp_path / "ref.pth")
    export_torch_main([
        "--dataset", "synthetic", "--model", "unet_baseline", *shape,
        "--ckpt_dir", ckpt, "--experiment_name", exp, "--out", pth,
    ])

    ckpt2 = str(tmp_path / "ck2")
    train_main([
        "--dataset", "synthetic", "--model", "unet_baseline",
        "--experiment_name", "warmdst", *shape,
        "--init_from_torch", pth,
        "--epochs", "4", "--batch_size", "2", "--num_samples", "4",
        "--compute_dtype", "float32", "--no_visualize",
        "--ckpt_dir", ckpt2, "--log_dir", str(tmp_path / "lg2"),
    ])
    out = capsys.readouterr().out
    assert "starting at epoch 4" in out  # saved epoch 3 + 1
    exp2 = os.listdir(ckpt2)[0]
    # exactly one new epoch trained and checkpointed
    params, _, _, epoch = CheckpointManager(ckpt2, exp2).restore_eval()
    assert epoch == 4

    # conflicting resume flags fail loudly
    with pytest.raises(SystemExit, match="init_from_torch"):
        train_main([
            "--dataset", "synthetic", "--model", "unet_baseline",
            "--experiment_name", "warmbad", *shape,
            "--init_from_torch", pth, "--resume",
            "--epochs", "4", "--batch_size", "2", "--num_samples", "4",
            "--compute_dtype", "float32", "--no_visualize",
            "--ckpt_dir", str(tmp_path / "ck3"),
            "--log_dir", str(tmp_path / "lg3"),
        ])
