"""BatVision V1/V2 dataset pipelines (host decode → device front end).

Twins of dataloader/BatvisionV{1,2}_Dataset.py in the reference, split
TPU-style: the host side only scans CSVs and decodes .npy/.wav files into
fixed-length waveform arrays and nearest-resized depth maps; ALL signal
processing (STFT/Mel/log/min-max/resize) runs in the jitted device front end
(data/frontend.py) inside the train step.

Sample semantics preserved:
  * BV2 (BatvisionV2_Dataset.py): per-location CSV concat skipping hidden/
    '__'/'_unzipped' dirs with warn-and-skip on missing CSVs (:22-49);
    depth .npy mm→m, clip to [0, max_depth], negative→0, cv2 INTER_NEAREST
    resize (:68-78); WAV via scipy with int16/int32 scaling (the reference's
    own fallback chain ends at the same scipy semantics, :142-175);
    waveform cut to int((2·max_depth/340)·sr) samples (:102-104).
  * BV1 (BatvisionV1_Dataset.py): single root CSV; NaN/±inf→0 depth scrub
    (:47-52); two mono .npy waveforms stacked L/R (:70-72); depth ÷max_depth
    when depth_norm (:63-64).
  * location blacklist for sequence holdout (BV2 :28-29, BV1 :25-31) and
    the holdout loaders built by substring filter on the audio path
    (train.py:294-373).

Static shapes: waveforms are cut/zero-padded to a fixed per-dataset length
(the TOF window for BV2; cfg-declared or first-sample length for BV1) so the
jitted step never retraces.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from ..configs import Config
from ..ops.resize import resize_nearest_cv2_np
from .frontend import tof_cut_samples


def load_wav(path: str):
    """Decode a WAV file to float32 [C, L] + sample rate (no torchaudio)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.ndim == 1:
        data = data[:, None]
    data = data.T  # [C, L]
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return data, sr


_IMAGE_POOL = None


def _image_pool():
    """Shared thread pool for camera-image decode (cv2 releases the GIL
    during imread/resize, so threads give real host parallelism — the
    analogue of the reference's DataLoader(num_workers=4), train.py:335,
    for the two families that read images)."""
    global _IMAGE_POOL
    if _IMAGE_POOL is None:
        import concurrent.futures

        _IMAGE_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=int(os.environ.get("ADEPTH_IMAGE_THREADS", "8")))
    return _IMAGE_POOL


def _decode_image_u8(path: str, size: int) -> np.ndarray:
    """cv2 decode → RGB → resize, kept in uint8 (the codec transport dtype;
    BatvisionV2_Dataset.py:199-210 semantics — resize runs on uint8 there
    too, /255 happens on device in data/codec.py)."""
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise IOError(f"could not load image {path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return cv2.resize(img, (size, size))


def _fix_length(wave_arr: np.ndarray, length: int) -> np.ndarray:
    c, l = wave_arr.shape
    if l >= length:
        return wave_arr[:, :length]
    out = np.zeros((c, length), np.float32)
    out[:, :l] = wave_arr
    return out


def _load_depth(path: str, size: int, max_depth: float, scrub_nan: bool) -> np.ndarray:
    depth = np.load(path).astype(np.float32)
    if scrub_nan:
        # np.nan_to_num defaults (BatvisionV1_Dataset.py:50-52): NaN→0,
        # +inf→FLT_MAX (the later clip maps it to max_depth), -inf→-FLT_MAX
        # (the later negative-floor maps it to 0).
        depth = np.nan_to_num(depth)
    depth = depth / 1000.0
    if max_depth:
        depth[depth > max_depth] = max_depth
    depth[depth < 0] = 0.0
    return resize_nearest_cv2_np(depth, size, size)


class BatvisionV2Dataset:
    def __init__(
        self,
        cfg: Config,
        annotation_file: str,
        location_blacklist: Optional[Sequence[str]] = None,
        use_image: bool = False,
    ):
        import pandas as pd

        self.cfg = cfg
        ds = cfg.dataset
        self.root = ds.dataset_dir
        self.use_image = use_image
        self.wave_len = tof_cut_samples(ds.max_depth, ds.sample_rate)

        locations = [
            d for d in sorted(os.listdir(self.root))
            if os.path.isdir(os.path.join(self.root, d))
            and not d.startswith(".") and not d.startswith("__")
            and not d.endswith("_unzipped")
        ]
        if location_blacklist:
            locations = [l for l in locations if l not in location_blacklist]
        frames = []
        for loc in locations:
            csv_path = os.path.join(self.root, loc, annotation_file)
            if os.path.exists(csv_path):
                frames.append(pd.read_csv(csv_path))
            else:
                print(f"Warning: {csv_path} not found, skipping location {loc}")
        if not frames:
            raise ValueError(
                f"No valid locations with {annotation_file} in {self.root}"
            )
        self.instances = pd.concat(frames).reset_index(drop=True)

    def __len__(self):
        return len(self.instances)

    def filter_by_audio_path(self, substring: str) -> "BatvisionV2Dataset":
        """Holdout loader: keep rows whose audio path contains substring."""
        import copy

        clone = copy.copy(self)
        clone.instances = self.instances[
            self.instances["audio path"].str.contains(substring, regex=False)
        ].reset_index(drop=True)
        return clone

    def sample(self, idx: int) -> Dict[str, np.ndarray]:
        """use_image False → audio; True → camera image; 'both' → paired
        audio+image (the distillation trainer's PairedDataset,
        train_adabins_distillation.py:283-299)."""
        row = self.instances.iloc[idx]
        ds = self.cfg.dataset
        depth = _load_depth(
            os.path.join(self.root, row["depth path"], row["depth file name"]),
            ds.images_size, ds.max_depth, scrub_nan=False,
        )
        out = {"depth": depth[..., None]}
        if self.use_image:
            import cv2

            img = cv2.imread(
                os.path.join(self.root, row["camera path"], row["camera file name"])
            )
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            img = cv2.resize(img, (ds.images_size, ds.images_size))
            out["image"] = img.astype(np.float32) / 255.0
        if not self.use_image or self.use_image == "both":
            wav, sr = load_wav(
                os.path.join(self.root, row["audio path"], row["audio file name"])
            )
            out["waveform"] = _fix_length(wav, self.wave_len)
        return out

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_last: bool = True, native: bool = True
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Batch iterator. With native=True (and the toolchain available)
        wav+depth decoding runs in the C++ thread pool (native/adepth_io.cpp)
        and batches come out directly in the compact transport dtypes (int16
        waveform / uint16 depth / uint8 image). Camera images decode
        concurrently in a cv2 thread pool (the GIL is released both there
        and inside the native call, so the two pools overlap)."""
        if native:
            from . import native_io

            if native_io.available():
                yield from self._native_batches(batch_size, shuffle, seed, drop_last)
                return
        yield from _batch_iter(self, batch_size, shuffle, seed, drop_last)

    def _native_batches(self, batch_size, shuffle, seed, drop_last):
        from . import native_io

        ds = self.cfg.dataset
        size = ds.images_size
        want_audio = not self.use_image or self.use_image == "both"
        n = len(self.instances)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        end = n - batch_size + 1 if drop_last else n
        for i in range(0, max(end, 0), batch_size):
            idx = order[i : i + batch_size]
            rows = self.instances.iloc[idx]
            futs = None
            if self.use_image:
                pool = _image_pool()
                futs = [
                    pool.submit(
                        _decode_image_u8,
                        os.path.join(self.root, r["camera path"],
                                     r["camera file name"]), size)
                    for _, r in rows.iterrows()
                ]
            wavs = [
                os.path.join(self.root, r["audio path"], r["audio file name"])
                for _, r in rows.iterrows()
            ] if want_audio else None
            depths = [
                os.path.join(self.root, r["depth path"], r["depth file name"])
                for _, r in rows.iterrows()
            ]
            wav, depth = native_io.assemble_batch(
                wavs, depths, fixed_len=self.wave_len,
                out_hw=(size, size),
                # the genuine BV2 class never normalizes, whatever
                # depth_norm says (BatvisionV2_Dataset.py:54-80) — the
                # python sample() path above mirrors that, so the native
                # decoder must too (codec.py::depth_storage_normalized)
                max_depth=ds.max_depth, depth_norm=False,
            )
            out = {"depth": depth}
            if wav is not None:
                out["waveform"] = wav
            if futs is not None:
                out["image"] = np.stack([f.result() for f in futs])
            yield out


class BatvisionV1Dataset:
    def __init__(
        self,
        cfg: Config,
        annotation_file: str,
        location_blacklist: Optional[Sequence[str]] = None,
        waveform_len: Optional[int] = None,
    ):
        import pandas as pd

        self.cfg = cfg
        self.root = cfg.dataset.dataset_dir
        self.instances = pd.read_csv(os.path.join(self.root, annotation_file))
        if location_blacklist:
            n0 = len(self.instances)
            for loc in location_blacklist:
                self.instances = self.instances[
                    ~self.instances["audio path left"].str.contains(loc, regex=False)
                ]
            print(
                f"BatvisionV1: filtered {n0 - len(self.instances)} instances "
                f"from blacklisted locations: {list(location_blacklist)}"
            )
        self.instances = self.instances.reset_index(drop=True)
        self._wave_len = waveform_len

    def __len__(self):
        return len(self.instances)

    def filter_by_audio_path(self, substring: str) -> "BatvisionV1Dataset":
        """Holdout loader: keep rows whose left-audio path contains substring
        (train.py:294-373 builds BV1 holdout loaders this way)."""
        import copy

        clone = copy.copy(self)
        # pin the PARENT's waveform length before cloning: if each loader
        # lazily derived wave_len from its own first row, holdout clones of
        # variable-length recordings would batch to a different [B,2,L]
        # shape than the train loader (retrace + different STFT window)
        clone._wave_len = self.wave_len
        clone.instances = self.instances[
            self.instances["audio path left"].str.contains(substring, regex=False)
        ].reset_index(drop=True)
        return clone

    @property
    def wave_len(self) -> int:
        if self._wave_len is None:
            row = self.instances.iloc[0]
            left = np.load(os.path.join(self.root, row["audio path left"]))
            self._wave_len = int(left.shape[-1])
        return self._wave_len

    def sample(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.instances.iloc[idx]
        ds = self.cfg.dataset
        depth = _load_depth(
            os.path.join(self.root, row["depth path"]),
            ds.images_size, ds.max_depth, scrub_nan=True,
        )
        if ds.depth_norm:
            depth = depth / ds.max_depth
        left = np.load(os.path.join(self.root, row["audio path left"])).astype(np.float32)
        right = np.load(os.path.join(self.root, row["audio path right"])).astype(np.float32)
        wav = np.stack([left, right])
        return {"waveform": _fix_length(wav, self.wave_len), "depth": depth[..., None]}

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        yield from _batch_iter(self, batch_size, shuffle, seed, drop_last)


def _batch_iter(dataset, batch_size: int, shuffle: bool, seed: int, drop_last: bool):
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    end = n - batch_size + 1 if drop_last else n
    for i in range(0, max(end, 0), batch_size):
        idx = order[i : i + batch_size]
        samples = [dataset.sample(int(j)) for j in idx]
        yield {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def make_dataset(cfg: Config, split: str = "train", **kwargs):
    """Factory: split in {train, val, test} → dataset object for cfg.dataset.name."""
    ds = cfg.dataset
    ann = getattr(ds, f"annotation_file_{split}")
    if ds.name == "batvisionv1":
        return BatvisionV1Dataset(cfg, ann, **kwargs)
    if ds.name == "batvisionv2":
        return BatvisionV2Dataset(cfg, ann, **kwargs)
    if ds.name == "synthetic":
        from .synthetic import SyntheticEchoDataset

        kwargs.setdefault("num_samples", {"train": 256, "val": 64, "test": 64}[split])
        kwargs.setdefault("seed", {"train": 0, "val": 1, "test": 2}[split])
        return SyntheticEchoDataset(cfg, **kwargs)
    raise ValueError(f"unknown dataset {ds.name!r}")
