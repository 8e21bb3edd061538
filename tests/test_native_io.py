"""Native IO runtime: golden parity against the Python loaders."""

import numpy as np
import pytest

from audiodepth_tpu.data import native_io
from audiodepth_tpu.data.batvision import load_wav, _load_depth
from audiodepth_tpu.data.codec import encode_batch
from audiodepth_tpu.ops.resize import resize_nearest_cv2_np
from tests.test_batvision_data import write_wav

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native toolchain unavailable"
)


def test_wav_decode_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.uniform(-0.8, 0.8, size=(2, 5000)).astype(np.float32)
    write_wav(tmp_path / "x.wav", data)
    # python path: float decode, then transport encode
    py_f, sr = load_wav(str(tmp_path / "x.wav"))
    py_i16 = encode_batch({"waveform": py_f[None]}, 30.0)["waveform"][0]
    # native path: direct int16, cut/pad to 6000
    nat = native_io.decode_wav_i16(str(tmp_path / "x.wav"), 6000)
    np.testing.assert_array_equal(nat[:, :5000], py_i16)
    assert (nat[:, 5000:] == 0).all()


def _write_wav_fmt(path, data, fmt):
    """Raw RIFF writer for format-coverage fixtures.

    fmt: pcm16 | pcm24 | pcm32 | f32 | ext_pcm16 (WAVE_FORMAT_EXTENSIBLE).
    data: float32 [C, L] in [-1, 1].
    """
    import struct

    ch, n = data.shape
    inter = np.ascontiguousarray(data.T)  # [L, C]
    if fmt == "pcm16":
        tag, bits = 1, 16
        body = (np.clip(inter, -1, 1) * 32767).astype("<i2").tobytes()
    elif fmt == "pcm24":
        tag, bits = 1, 24
        v = (np.clip(inter, -1, 1) * 8388607).astype(np.int64)
        body = b"".join(int(x).to_bytes(3, "little", signed=True)
                        for x in v.ravel())
    elif fmt == "pcm32":
        tag, bits = 1, 32
        body = (np.clip(inter, -1, 1) * 2147483392).astype("<i4").tobytes()
    elif fmt == "f32":
        tag, bits = 3, 32
        body = inter.astype("<f4").tobytes()
    elif fmt == "ext_pcm16":
        tag, bits = None, 16  # handled below
        body = (np.clip(inter, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        raise ValueError(fmt)
    sr = 44100
    block = ch * bits // 8
    if fmt == "ext_pcm16":
        # KSDATAFORMAT_SUBTYPE_PCM: 00000001-0000-0010-8000-00aa00389b71
        sub = bytes.fromhex("01000000" "0000" "1000" "800000aa00389b71")
        fmt_chunk = struct.pack("<HHIIHHHHI", 0xFFFE, ch, sr, sr * block,
                                block, bits, 22, bits, 0x3) + sub
    else:
        fmt_chunk = struct.pack("<HHIIHH", tag, ch, sr, sr * block, block, bits)
    blob = (b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + b"data" + struct.pack("<I", len(body)) + body)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(blob)) + b"WAVE" + blob)


@pytest.mark.parametrize("fmt", ["pcm16", "pcm24", "pcm32", "f32", "ext_pcm16"])
def test_wav_format_coverage(tmp_path, fmt):
    """PCM16/24/32, IEEE float, and EXTENSIBLE WAVs all decode to the same
    int16 transport form as the python scipy chain (VERDICT r3 Next #7;
    matches the reference's 4-backend decode tolerance,
    BatvisionV2_Dataset.py:142-175)."""
    rng = np.random.default_rng(fmt.__hash__() % 2**31)
    data = rng.uniform(-0.9, 0.9, size=(2, 3000)).astype(np.float32)
    p = tmp_path / f"x_{fmt}.wav"
    _write_wav_fmt(p, data, fmt)
    py_f, sr = load_wav(str(p))
    assert sr == 44100
    py_i16 = encode_batch({"waveform": py_f[None]}, 30.0)["waveform"][0]
    nat = native_io.decode_wav_i16(str(p), 3000)
    # exact for pcm16/ext/f32; ±1 LSB for 24/32-bit (banker's vs half-up
    # rounding at exact .5 boundaries)
    atol = 1 if fmt in ("pcm24", "pcm32") else 0
    np.testing.assert_allclose(nat.astype(np.int32),
                               py_i16.astype(np.int32), atol=atol, rtol=0)


def test_wav_decode_cuts(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.uniform(-0.5, 0.5, size=(2, 5000)).astype(np.float32)
    write_wav(tmp_path / "x.wav", data)
    nat = native_io.decode_wav_i16(str(tmp_path / "x.wav"), 3000)
    assert nat.shape == (2, 3000)


@pytest.mark.parametrize("depth_norm", [False, True])
@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.uint16])
def test_depth_load_matches_python(tmp_path, depth_norm, dtype):
    rng = np.random.default_rng(2)
    depth_mm = rng.uniform(-100, 40000, size=(48, 64))
    if dtype == np.uint16:
        depth_mm = np.clip(depth_mm, 0, 65535)
    else:
        depth_mm[0, 0] = np.nan
        depth_mm[0, 1] = np.inf
    depth_mm = depth_mm.astype(dtype)
    np.save(tmp_path / "d.npy", depth_mm)

    # python twin: load → scrub → mm→m → clip → nearest resize → (norm) → encode
    py = _load_depth(str(tmp_path / "d.npy"), 32, 30.0, scrub_nan=True)
    if depth_norm:
        py = py / 30.0
    units = 1.0 if depth_norm else 30.0
    py_u16 = encode_batch({"depth": py[None, ..., None]}, units)["depth"][0, ..., 0]

    nat = native_io.load_depth_u16(str(tmp_path / "d.npy"), (32, 32), 30.0, depth_norm)
    np.testing.assert_array_equal(nat, py_u16)


def test_assemble_batch(tmp_path):
    rng = np.random.default_rng(3)
    wavs, depths = [], []
    for i in range(4):
        w = rng.uniform(-0.5, 0.5, size=(2, 4000)).astype(np.float32)
        write_wav(tmp_path / f"w{i}.wav", w)
        np.save(tmp_path / f"d{i}.npy",
                rng.uniform(0, 35000, size=(48, 64)).astype(np.float32))
        wavs.append(str(tmp_path / f"w{i}.wav"))
        depths.append(str(tmp_path / f"d{i}.npy"))
    wav_out, depth_out = native_io.assemble_batch(
        wavs, depths, fixed_len=4096, out_hw=(32, 32), max_depth=30.0,
        depth_norm=False, n_threads=4,
    )
    assert wav_out.shape == (4, 2, 4096) and wav_out.dtype == np.int16
    assert depth_out.shape == (4, 32, 32, 1) and depth_out.dtype == np.uint16
    # spot-check one item against the single-file APIs
    one_w = native_io.decode_wav_i16(wavs[1], 4096)
    np.testing.assert_array_equal(wav_out[1], one_w)
    one_d = native_io.load_depth_u16(depths[2], (32, 32), 30.0, False)
    np.testing.assert_array_equal(depth_out[2, ..., 0], one_d)


def test_missing_file_raises():
    with pytest.raises(IOError):
        native_io.decode_wav_i16("/nonexistent.wav", 100)
    with pytest.raises(IOError):
        native_io.load_depth_u16("/nonexistent.npy", (8, 8), 30.0, False)


def test_bv2_native_batches_match_python(tmp_path):
    """BV2 dataset with native decoding == python path after transport encode."""
    from audiodepth_tpu.configs import load_config
    from audiodepth_tpu.data.batvision import BatvisionV2Dataset

    rng = np.random.default_rng(4)
    d = tmp_path / "Hall"
    (d / "audio").mkdir(parents=True)
    (d / "depth").mkdir()
    rows = []
    for i in range(4):
        np.save(d / "depth" / f"d{i}.npy",
                rng.uniform(0, 40000, size=(48, 64)).astype(np.float32))
        write_wav(d / "audio" / f"a{i}.wav",
                  rng.uniform(-0.5, 0.5, size=(2, 9000)).astype(np.float32))
        rows.append(f"Hall/audio,a{i}.wav,Hall/depth,d{i}.npy")
    (d / "train.csv").write_text(
        "audio path,audio file name,depth path,depth file name\n"
        + "\n".join(rows) + "\n")

    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(tmp_path), "dataset.images_size": 64,
    })
    ds = BatvisionV2Dataset(cfg, "train.csv")
    nat = next(ds.batches(4, shuffle=False, native=True))
    py = next(ds.batches(4, shuffle=False, native=False))
    assert nat["waveform"].dtype == np.int16 and nat["depth"].dtype == np.uint16
    py_enc = encode_batch(py, 30.0)
    np.testing.assert_array_equal(nat["waveform"], py_enc["waveform"])
    np.testing.assert_array_equal(nat["depth"], py_enc["depth"])


def test_bv2_native_batches_image_modes(tmp_path):
    """Image and paired ('both') modes stream through the native path too:
    C++ pool for wav+depth, concurrent cv2 pool for camera images — the
    parallel-decode coverage the reference gets from DataLoader workers
    (train.py:335; VERDICT r3 Next #4)."""
    import cv2

    from audiodepth_tpu.configs import load_config
    from audiodepth_tpu.data.batvision import BatvisionV2Dataset

    rng = np.random.default_rng(5)
    d = tmp_path / "Hall"
    for sub in ("audio", "depth", "cam"):
        (d / sub).mkdir(parents=True)
    rows = []
    for i in range(4):
        np.save(d / "depth" / f"d{i}.npy",
                rng.uniform(0, 40000, size=(48, 64)).astype(np.float32))
        write_wav(d / "audio" / f"a{i}.wav",
                  rng.uniform(-0.5, 0.5, size=(2, 9000)).astype(np.float32))
        cv2.imwrite(str(d / "cam" / f"c{i}.png"),
                    rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8))
        rows.append(f"Hall/audio,a{i}.wav,Hall/depth,d{i}.npy,Hall/cam,c{i}.png")
    (d / "train.csv").write_text(
        "audio path,audio file name,depth path,depth file name,"
        "camera path,camera file name\n" + "\n".join(rows) + "\n")

    cfg = load_config("batvisionv2", overrides={
        "dataset.dataset_dir": str(tmp_path), "dataset.images_size": 64,
    })
    # paired mode: audio + image + depth
    ds = BatvisionV2Dataset(cfg, "train.csv", use_image="both")
    nat = next(ds.batches(4, shuffle=False, native=True))
    py = encode_batch(dict(next(ds.batches(4, shuffle=False, native=False))), 30.0)
    assert nat["image"].dtype == np.uint8 and nat["image"].shape == (4, 64, 64, 3)
    np.testing.assert_array_equal(nat["image"], py["image"])
    np.testing.assert_array_equal(nat["waveform"], py["waveform"])
    np.testing.assert_array_equal(nat["depth"], py["depth"])

    # image-only mode: no waveform key
    ds_img = BatvisionV2Dataset(cfg, "train.csv", use_image=True)
    nat_img = next(ds_img.batches(4, shuffle=False, native=True))
    assert "waveform" not in nat_img
    np.testing.assert_array_equal(nat_img["image"], nat["image"])
    np.testing.assert_array_equal(nat_img["depth"], nat["depth"])


def test_corrupt_cached_so_recovers(tmp_path, monkeypatch):
    """A truncated/corrupt cached .so (interrupted or concurrent build) must
    trigger a rebuild, not a permanent OSError from available().

    Runs against a TEMP copy of the native tree: corrupting the real .so in
    place would invalidate this process's existing dlopen mapping (dlopen
    caches by path), which is exactly the hazard the atomic-build fix
    prevents for fresh processes.
    """
    import os
    import shutil

    src = tmp_path / "adepth_io.cpp"
    so = tmp_path / "libadepth_io.so"
    shutil.copy(os.path.abspath(native_io._SRC), src)
    so.write_bytes(b"\x7fELFgarbage")
    st = os.stat(src)
    os.utime(so, (st.st_atime + 10, st.st_mtime + 10))  # fresh mtime: cache accepts it

    monkeypatch.setattr(native_io, "_SRC", str(src))
    monkeypatch.setattr(native_io, "_SO", str(so))
    monkeypatch.setattr(native_io, "_LIB", None)
    monkeypatch.setattr(native_io, "_TRIED", False)
    try:
        assert native_io.available()  # corrupt cache detected, rebuilt from source
        assert so.stat().st_size > 1000  # the rebuilt real library
    finally:
        # restore the module-level loader state for later tests
        monkeypatch.undo()
        native_io._LIB = None
        native_io._TRIED = False
        assert native_io.available()
