"""Halo-exchange sharded STFT vs the single-device op on the 8-dev CPU mesh."""

import numpy as np
import pytest

from audiodepth_tpu.ops.stft import magnitude_stft
from audiodepth_tpu.parallel.mesh import make_mesh
from audiodepth_tpu.parallel.sharded_stft import sharded_magnitude_stft


@pytest.mark.parametrize("length", [7782, 4096, 2048])
def test_sharded_matches_single_device(length):
    rng = np.random.default_rng(0)
    wave = rng.normal(size=(2, 2, length)).astype(np.float32)
    mesh = make_mesh()
    ref = np.asarray(magnitude_stft(wave, 512, 64, 16))
    out = np.asarray(sharded_magnitude_stft(wave, mesh, "data", 512, 64, 16))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sharded_small_mesh():
    rng = np.random.default_rng(1)
    wave = rng.normal(size=(1, 2, 3000)).astype(np.float32)
    mesh = make_mesh(4)
    ref = np.asarray(magnitude_stft(wave, 512, 64, 16))
    out = np.asarray(sharded_magnitude_stft(wave, mesh, "data", 512, 64, 16))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
