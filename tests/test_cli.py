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
    ])
    assert np.isfinite(means["rmse"])
    # stats artifact exists
    stat_root = tmp_path / "eval" / "synthetic" / "val"
    assert any(f.suffix == ".npz" for f in stat_root.iterdir())
    # visualization was written
    assert any(f.suffix == ".png" for f in (tmp_path / "res").iterdir())
    # jsonl log exists with val metrics
    log_file = next((tmp_path / "lg").glob("*.jsonl"))
    assert "val/rmse" in log_file.read_text()


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


def test_holdout_training_bv2(tmp_path):
    """End-to-end holdout: locations excluded from train, evaluated separately."""
    from tests.test_batvision_data import write_wav

    rng = np.random.default_rng(5)
    for loc in ("Hall", "Office"):
        d = tmp_path / "data" / loc
        (d / "audio").mkdir(parents=True)
        (d / "depth").mkdir()
        rows = []
        for i in range(4):
            np.save(d / "depth" / f"d{i}.npy",
                    rng.uniform(0, 40000, size=(32, 32)).astype(np.float32))
            write_wav(d / "audio" / f"a{i}.wav",
                      rng.normal(0, 0.1, size=(2, 8500)).astype(np.float32))
            rows.append(f"{loc}/audio,a{i}.wav,{loc}/depth,d{i}.npy")
        header = "audio path,audio file name,depth path,depth file name\n"
        (d / "train.csv").write_text(header + "\n".join(rows) + "\n")
        (d / "val.csv").write_text(header + "\n".join(rows[:2]) + "\n")

    train_main([
        "--dataset", "batvisionv2", "--dataset_dir", str(tmp_path / "data"),
        "--model", "unet_baseline", "--experiment_name", "holdsmoke",
        "--generator", "unet_128", "--ngf", "4",
        "--epochs", "2", "--batch_size", "2", "--compute_dtype", "float32",
        "--holdout_locations", "Office", "--no_visualize",
        "--ckpt_dir", str(tmp_path / "ck"), "--log_dir", str(tmp_path / "lg"),
    ])
    log = next((tmp_path / "lg").glob("*.jsonl")).read_text()
    assert "holdout/Office/rmse" in log
