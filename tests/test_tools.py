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
