"""Tools: sparse-depth preprocessor + feature-contract verifier."""

import numpy as np
import pytest

from audiodepth_tpu.tools.preprocess_sparse_depth import (
    main as prep_main,
    parse_method,
    slic_segments,
    smooth_downup,
    smooth_planar_grid,
    smooth_quantized,
)
from audiodepth_tpu.tools.verify_contracts import verify_compatibility


def make_depth(seed=0, shape=(48, 64)):
    rng = np.random.default_rng(seed)
    d = rng.uniform(500, 30000, size=shape).astype(np.float32)
    d[10:20, 10:20] = 0.0  # holes
    return d


def test_downup_fills_and_smooths():
    d = make_depth()
    out = smooth_downup(d, scale=0.15)
    assert out.shape == d.shape
    assert (out[10:20, 10:20] > 0).all()  # holes filled


def test_quantized_levels():
    d = make_depth()
    out = smooth_quantized(d, n_levels=8)
    assert out.shape == d.shape and np.isfinite(out).all()


def test_grid_blocks():
    d = make_depth()
    out = smooth_planar_grid(d, grid_size=16)
    assert out.shape == d.shape


def test_slic_segments_cover():
    img = np.random.default_rng(1).uniform(size=(48, 64)).astype(np.float32)
    labels = slic_segments(img, n_segments=20, compactness=0.1)
    assert labels.shape == img.shape
    assert len(np.unique(labels)) > 5


@pytest.mark.parametrize("spec,ok", [
    ("downup_015", True), ("superpixel_50", True), ("quantized_16", True),
    ("sp_extreme_20", True), ("sp_hier_50_20", True), ("grid_16", True),
    ("blur_3_2", True), ("bogus_1", False),
])
def test_parse_method(spec, ok):
    if ok:
        fn = parse_method(spec)
        out = fn(make_depth())
        assert out.shape == (48, 64)
    else:
        with pytest.raises(ValueError):
            parse_method(spec)


def test_preprocess_cli_end_to_end(tmp_path):
    seq = tmp_path / "seq1" / "depth"
    seq.mkdir(parents=True)
    for i in range(2):
        np.save(seq / f"depth_{i}.npy", make_depth(i))
    prep_main(["--dataset_dir", str(tmp_path), "--method", "downup_020"])
    out = tmp_path / "seq1" / "sparse_depth_downup_020"
    assert sorted(f.name for f in out.iterdir()) == ["depth_0.npy", "depth_1.npy"]


def test_feature_contract():
    assert verify_compatibility(base_channels=8, size=64, verbose=False)


def test_compare_checkpoints_csv(tmp_path):
    """examples/compare_checkpoints.py: the depth_model_comparison CSV twin.

    Trains one tiny checkpoint, exports it as a reference-format .pth, and
    compares BOTH restore branches (orbax dir + .pth import) over the same
    val slice — the two rows must agree since they are the same weights.
    """
    import csv
    import importlib.util
    import os
    import sys

    from audiodepth_tpu.cli.train import main as train_main
    from audiodepth_tpu.tools.export_torch import main as export_main

    ckpt = str(tmp_path / "ck")
    train_main([
        "--dataset", "synthetic", "--model", "unet_baseline",
        "--experiment_name", "cmpsmoke",
        "--generator", "unet_128", "--ngf", "4",
        "--epochs", "1", "--batch_size", "4", "--num_samples", "8",
        "--saving_checkpoints", "1", "--compute_dtype", "float32",
        "--ckpt_dir", ckpt, "--log_dir", str(tmp_path / "lg"),
    ])
    exp = os.listdir(ckpt)[0]
    pth = str(tmp_path / "m.pth")
    export_main([
        "--dataset", "synthetic", "--model", "unet_baseline",
        "--generator", "unet_128", "--ngf", "4",
        "--ckpt_dir", ckpt, "--experiment_name", exp, "--out", pth,
    ])

    spec = importlib.util.spec_from_file_location(
        "compare_checkpoints",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "compare_checkpoints.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out_csv = str(tmp_path / "cmp.csv")
    ov = "model.generator=unet_128,model.ngf=4"
    rows = mod.main([
        "--dataset", "synthetic", "--num_samples", "8", "--batch_size", "4",
        "--out", out_csv,
        "--entry", f"orbax:unet_baseline:{ckpt}/{exp}:{ov}",
        "--entry", f"torch-pth:unet_baseline:{pth}:{ov}",
    ])
    assert [r["Model"] for r in rows] == ["orbax", "torch-pth"]
    # same weights through both restore paths -> same metrics
    assert abs(rows[0]["RMSE"] - rows[1]["RMSE"]) < 1e-4 * max(1.0, rows[0]["RMSE"])
    with open(out_csv) as f:
        got = list(csv.DictReader(f))
    assert list(got[0].keys()) == ["Model", "ABS_REL", "RMSE", "MAE", "Delta1"]
    assert len(got) == 2


def test_profile_step_categorize_and_report():
    """profile_step: HLO-op bucketing + report formatting (pure halves).

    The capture half needs real hardware (validated on-chip, RESULTS.md
    "On-chip profile of the HEADLINE UNet-256 step"); the categorizer and
    report are pinned here on representative HLO expressions from that
    trace.
    """
    from audiodepth_tpu.tools.profile_step import categorize, report

    cases = {
        "%convert_reduce_fusion.6 = (f32[256]{0:T(256)S(1)}, f32[256]"
        "{0:T(256)S(1)}, bf16[256,32,32,256]{3,0,2,1}) fusion(...)":
            "conv+BN-stat multi-output fusions",
        "%compare_select_fusion = bf16[256,128,128,128]{0,3,2,1} fusion(...)":
            "conv+leaky/maxpool select fusions",
        "%fusion.393 = (f32[]{:T(128)}, bf16[4,4,256,64]{2,3,1,0}) "
        "fusion(...)": "filter-gradient conv fusions",
        "%fusion.132 = (f32[]{:T(128)}, f32[]{:T(128)}) fusion(...)":
            "loss/grad-norm scalar reductions",
        "%reverse.9 = bf16[256,128,128,64]{0,3,2,1} reverse(...)":
            "reverse (convT-grad data movement)",
        "%copy-done.3 = bf16[4,4,256,64]{2,3,1,0} copy-done(...)":
            "copies/transposes",
        "%convolution.1 = bf16[256,256,2,256]{3,1,2,0} convolution(...)":
            "standalone convolutions",
        "%custom-call.7 = bf16[128,16384,128] custom-call(...), "
        "custom_call_target=\"tpu_custom_call\" (flash_fwd)":
            "Pallas custom calls",
        "%fusion.38 = bf16[256,128,128,64]{0,3,2,1} fusion(...)":
            "other conv/elementwise fusions",
    }
    for name, want in cases.items():
        assert categorize(name) == want, (name, categorize(name), want)

    cats = {"conv+BN-stat multi-output fusions": int(21.4e9 * 8),
            "copies/transposes": int(3.2e9 * 8)}
    txt = report({"jit_train_step": int(82.7e9 * 8)}, cats,
                 {"%fusion.1 = ...": int(1e9 * 8)}, steps=8, top=1)
    assert "jit_train_step: 82.70 ms/step" in txt
    assert "conv+BN-stat multi-output fusions" in txt
    assert "87.0%" in txt  # 21.4 / 24.6
