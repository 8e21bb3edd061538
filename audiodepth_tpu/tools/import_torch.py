"""Torch checkpoint interop: reference ``.pth`` state_dicts → flax variables.

The reference ecosystem's artifact of record is a torch state_dict saved as
``checkpoint["state_dict"]`` (reference train.py:1005-1021, test.py:120-203).
This module maps each reference family's state_dict onto the matching
audiodepth_tpu flax module, converting layouts:

    Conv2d          [O,I,kh,kw]   -> nn.Conv kernel        [kh,kw,I,O]
    ConvTranspose2d [I,O,kh,kw]   -> nn.ConvTranspose(SAME) spatial-flip then
                                     [kh,kw,I,O]  (torch computes the conv
                                     adjoint = flipped-kernel correlation;
                                     verified exact vs torch k4s2p1)
    Conv2d 1x1      [O,I,1,1]     -> nn.Dense kernel [I,O] (token projections)
    Linear          [O,I]         -> nn.Dense kernel [I,O]
    BatchNorm2d     weight/bias/running_mean/running_var
                                  -> scale/bias params + mean/var batch_stats

Every mapper consumes the full torch key set (``num_batches_tracked`` and
documented dead modules are discarded explicitly); unconsumed or missing
keys raise, so architecture drift fails loudly instead of silently
transplanting garbage.  Forward parity for all seven families is pinned by
tests/test_torch_interop.py against the genuine reference modules.

Reference anchors: models/unetbaseline_model.py:123-235,
models/unet_cvae_model.py:49-295, models/base_residual_model.py:83-237,
models/binaural_attention_model.py:81-345, models/rgb_depth_model.py:80-218,
models/adabins_distillation_model.py:85-459,
models/coarse_depth_model.py:86-287,591-994.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
from flax.traverse_util import unflatten_dict


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth`` checkpoint into {key: np.ndarray}.

    Accepts a bare state_dict or the reference's ``{"state_dict": ...}`` /
    ``{"model_state_dict": ...}`` wrappers; strips DataParallel ``module.``
    prefixes.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model_state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    sd = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return sd


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convT_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


class _Builder:
    """Accumulates flax param/batch_stats leaves from torch keys.

    Tracks consumption so ``finish()`` can prove the mapping is total: every
    torch tensor either became a flax leaf or was explicitly discarded.
    """

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params: Dict[tuple, np.ndarray] = {}
        self.stats: Dict[tuple, np.ndarray] = {}
        self.used: set = set()

    def _take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"torch state_dict is missing expected key {key!r}")
        self.used.add(key)
        return self.sd[key]

    def _put(self, tree: Dict[tuple, np.ndarray], fpath: str, arr: np.ndarray):
        path = tuple(fpath.split("/"))
        if path in tree:
            raise ValueError(f"duplicate flax path {fpath}")
        tree[path] = np.asarray(arr, dtype=np.float32)

    # ---- primitives -----------------------------------------------------
    def conv(self, fpath: str, tprefix: str, bias: bool = True):
        self._put(self.params, f"{fpath}/kernel", _conv_kernel(self._take(f"{tprefix}.weight")))
        if bias:
            self._put(self.params, f"{fpath}/bias", self._take(f"{tprefix}.bias"))

    def convT(self, fpath: str, tprefix: str, bias: bool = True):
        self._put(self.params, f"{fpath}/kernel", _convT_kernel(self._take(f"{tprefix}.weight")))
        if bias:
            self._put(self.params, f"{fpath}/bias", self._take(f"{tprefix}.bias"))

    def dense(self, fpath: str, tprefix: str, conv1x1: bool = False):
        w = self._take(f"{tprefix}.weight")
        if conv1x1:  # [O,I,1,1] token projection -> Dense over channels
            w = w[:, :, 0, 0]
        self._put(self.params, f"{fpath}/kernel", _dense_kernel(w))
        self._put(self.params, f"{fpath}/bias", self._take(f"{tprefix}.bias"))

    def bn(self, fpath: str, tprefix: str):
        self._put(self.params, f"{fpath}/scale", self._take(f"{tprefix}.weight"))
        self._put(self.params, f"{fpath}/bias", self._take(f"{tprefix}.bias"))
        self._put(self.stats, f"{fpath}/mean", self._take(f"{tprefix}.running_mean"))
        self._put(self.stats, f"{fpath}/var", self._take(f"{tprefix}.running_var"))
        self.discard(f"{tprefix}.num_batches_tracked")

    def raw(self, fpath: str, tkey: str):
        self._put(self.params, fpath, self._take(tkey))

    def discard(self, *keys_or_prefixes: str):
        """Mark dead reference params (unused modules, buffers) consumed."""
        for kp in keys_or_prefixes:
            if kp in self.sd:
                self.used.add(kp)
            else:
                hits = [k for k in self.sd if k.startswith(kp + ".")]
                self.used.update(hits)

    # ---- composites (reference DoubleConv/Down/Up building blocks) ------
    # coarse_depth_model.py re-declares the same blocks with different inner
    # attribute names (conv/pool_conv vs double_conv/maxpool_conv); the
    # ``inner``/``pool`` knobs cover both spellings.
    def double_conv(self, fpath: str, tprefix: str, inner: str = "double_conv"):
        self.conv(f"{fpath}/Conv_0", f"{tprefix}.{inner}.0", bias=False)
        self.bn(f"{fpath}/BatchNorm_0/BatchNorm_0", f"{tprefix}.{inner}.1")
        self.conv(f"{fpath}/Conv_1", f"{tprefix}.{inner}.3", bias=False)
        self.bn(f"{fpath}/BatchNorm_1/BatchNorm_0", f"{tprefix}.{inner}.4")

    def encoder(self, fpath: str, tprefix: str = "",
                inner: str = "double_conv", pool: str = "maxpool_conv"):
        """SharedEncoder / BinauralEncoder / AdaBinsEncoder (inc + down1-4)."""
        p = tprefix + "." if tprefix else ""
        self.double_conv(f"{fpath}/DoubleConv_0", f"{p}inc", inner)
        for i in range(4):
            self.double_conv(
                f"{fpath}/Down_{i}/DoubleConv_0",
                f"{p}down{i + 1}.{pool}.1", inner,
            )

    def up(self, fpath: str, tprefix: str, inner: str = "double_conv"):
        self.double_conv(f"{fpath}/DoubleConv_0", f"{tprefix}.conv", inner)

    def finish(self) -> Dict[str, dict]:
        leftover = sorted(set(self.sd) - self.used)
        if leftover:
            raise ValueError(
                f"{len(leftover)} torch keys were not consumed by the mapping "
                f"(architecture drift?): {leftover[:8]}..."
            )
        out = {"params": unflatten_dict(self.params)}
        if self.stats:
            out["batch_stats"] = unflatten_dict(self.stats)
        return out


# ---------------------------------------------------------------------------
# pix2pix UNet baseline (models/unetbaseline_model.py:123-235)
# ---------------------------------------------------------------------------

def _unet_block_prefixes(num_downs: int) -> Sequence[str]:
    """Torch Sequential prefixes for blocks outermost(0) → innermost(n-1).

    Outermost Sequential: 0=downconv 1=submodule 2=uprelu 3=upconv 4=act.
    Middle:   0=downrelu 1=downconv 2=downnorm 3=submodule 4=uprelu
              5=upconv 6=upnorm [7=dropout].
    Innermost: 0=downrelu 1=downconv 2=uprelu 3=upconv 4=upnorm.
    """
    prefixes = ["model.model"]
    for d in range(1, num_downs):
        sub_idx = 1 if d == 1 else 3
        prefixes.append(f"{prefixes[-1]}.{sub_idx}.model")
    return prefixes


def import_unet(sd: Dict[str, np.ndarray], num_downs: int = 8) -> Dict[str, dict]:
    b = _Builder(sd)
    P = _unet_block_prefixes(num_downs)
    n = num_downs
    # encoder
    b.conv(f"ConvDown_0/Conv_0", f"{P[0]}.0", bias=False)
    for d in range(1, n - 1):
        b.conv(f"ConvDown_{d}/Conv_0", f"{P[d]}.1", bias=False)
        b.bn(f"BatchNorm_{d - 1}/BatchNorm_0", f"{P[d]}.2")
    b.conv(f"ConvDown_{n - 1}/Conv_0", f"{P[n - 1]}.1", bias=False)
    # decoder: innermost up, middles, outermost head
    b.convT("ConvUp_0/ConvTranspose_0", f"{P[n - 1]}.3", bias=False)
    b.bn(f"BatchNorm_{n - 2}/BatchNorm_0", f"{P[n - 1]}.4")
    for j, d in enumerate(range(n - 2, 0, -1), start=1):
        b.convT(f"ConvUp_{j}/ConvTranspose_0", f"{P[d]}.5", bias=False)
        b.bn(f"BatchNorm_{n - 2 + j}/BatchNorm_0", f"{P[d]}.6")
    b.convT(f"ConvUp_{n - 1}/ConvTranspose_0", f"{P[0]}.3", bias=True)
    return b.finish()


# ---------------------------------------------------------------------------
# UNet-cVAE (models/unet_cvae_model.py:49-295)
# ---------------------------------------------------------------------------

def import_unet_cvae(sd: Dict[str, np.ndarray], num_downs: int = 8) -> Dict[str, dict]:
    b = _Builder(sd)
    n = num_downs
    Q = ["model"]
    for _ in range(1, n):
        Q.append(Q[-1] + ".submodule")
    # encoder (outermost downconv has no preceding relu; innermost no norm)
    b.conv("ConvDown_0/Conv_0", f"{Q[0]}.downconv", bias=False)
    for d in range(1, n - 1):
        b.conv(f"ConvDown_{d}/Conv_0", f"{Q[d]}.downconv", bias=False)
        b.bn(f"BatchNorm_{d - 1}/BatchNorm_0", f"{Q[d]}.downnorm")
    b.conv(f"ConvDown_{n - 1}/Conv_0", f"{Q[n - 1]}.downconv", bias=False)
    # dead modules the reference registers but never runs (unet_cvae_model.py
    # creates downnorm/upnorm on every block before the outermost/innermost
    # branch decides not to use them)
    b.discard(f"{Q[0]}.downnorm", f"{Q[0]}.upnorm", f"{Q[n - 1]}.downnorm")
    # VAE bottleneck
    for name in ("fc_mu", "fc_logvar", "fc_dec"):
        b.dense(f"VAEBottleneck_0/{name}", f"{Q[n - 1]}.vae.{name}")
    # decoder
    b.convT("ConvUp_0/ConvTranspose_0", f"{Q[n - 1]}.upconv", bias=False)
    b.bn(f"BatchNorm_{n - 2}/BatchNorm_0", f"{Q[n - 1]}.upnorm")
    for j, d in enumerate(range(n - 2, 0, -1), start=1):
        b.convT(f"ConvUp_{j}/ConvTranspose_0", f"{Q[d]}.upconv", bias=False)
        b.bn(f"BatchNorm_{n - 2 + j}/BatchNorm_0", f"{Q[d]}.upnorm")
    b.convT(f"ConvUp_{n - 1}/ConvTranspose_0", f"{Q[0]}.upconv", bias=True)
    return b.finish()


# ---------------------------------------------------------------------------
# Base+Residual (models/base_residual_model.py:83-237)
# ---------------------------------------------------------------------------

def import_base_residual(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    b = _Builder(sd)
    b.encoder("SharedEncoder_0")
    for i in range(4):
        b.up(f"UpBilinear_{i}", f"base_up{i + 1}")
    b.conv("Conv_0", "base_head", bias=True)
    for i in range(4):
        b.up(f"UpBilinear_{i + 4}", f"res_up{i + 1}")
    b.conv("Conv_1", "res_head", bias=True)
    return b.finish()


# ---------------------------------------------------------------------------
# Binaural attention (models/binaural_attention_model.py:81-345)
# ---------------------------------------------------------------------------

def import_binaural(
    sd: Dict[str, np.ndarray], attention_levels: Sequence[int] = (2, 3, 4, 5)
) -> Dict[str, dict]:
    b = _Builder(sd)
    b.encoder("left_encoder", "left_encoder")
    b.encoder("right_encoder", "right_encoder")
    for lvl in attention_levels:
        tp = f"attention_modules.attn_{lvl}"
        b.dense(f"attn_{lvl}/Dense_0", f"{tp}.query", conv1x1=True)
        b.dense(f"attn_{lvl}/Dense_1", f"{tp}.key", conv1x1=True)
        b.dense(f"attn_{lvl}/Dense_2", f"{tp}.value", conv1x1=True)
        b.dense(f"attn_{lvl}/Dense_3", f"{tp}.out", conv1x1=True)
        b.raw(f"attn_{lvl}/gamma", f"{tp}.gamma")
    for lvl in range(1, 6):
        tp = f"fusion_layers.fusion_{lvl}"
        b.conv(f"fusion_{lvl}", f"{tp}.0", bias=True)
        b.bn(f"fusion_bn_{lvl}/BatchNorm_0", f"{tp}.1")
    for i in range(4):
        b.up(f"UpBilinear_{i}", f"up{i + 1}")
    b.conv("Conv_0", "outc.0", bias=True)
    return b.finish()


# ---------------------------------------------------------------------------
# RGB teacher (models/rgb_depth_model.py:80-218)
# ---------------------------------------------------------------------------

def import_rgb_depth(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    b = _Builder(sd)
    b.encoder("SharedEncoder_0")
    for i in range(4):
        b.up(f"UpBilinear_{i}", f"up{i + 1}")
    b.conv("Conv_0", "outc", bias=True)
    return b.finish()


# ---------------------------------------------------------------------------
# AdaBins distillation twins (models/adabins_distillation_model.py:210-459)
# ---------------------------------------------------------------------------

def import_adabins(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    b = _Builder(sd)
    for branch in ("audio", "rgb"):
        b.encoder(f"{branch}/AdaBinsEncoder_0", f"{branch}_encoder")
        b.dense(f"{branch}/BinPredictor_0/Dense_0", f"{branch}_bin_predictor.predictor.0")
        b.dense(f"{branch}/BinPredictor_0/Dense_1", f"{branch}_bin_predictor.predictor.3")
        for i in range(4):
            b.up(f"{branch}/AdaBinsDecoder_0/UpBilinear_{i}", f"{branch}_decoder.up{i + 1}")
        b.conv(f"{branch}/AdaBinsDecoder_0/Conv_0", f"{branch}_decoder.class_head", bias=True)
    b.conv("residual_head", "residual_head", bias=True)
    return b.finish()


# ---------------------------------------------------------------------------
# Coarse-depth family (models/coarse_depth_model.py:86-287, 591-994)
# ---------------------------------------------------------------------------

def import_coarse_unet(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    b = _Builder(sd)
    b.discard("bin_centers")  # buffer; bin centers are a forward arg here
    b.encoder("SharedEncoder_0", inner="conv", pool="pool_conv")
    for i in range(4):
        b.up(f"_Decoder_0/UpBilinear_{i}", f"up{i + 1}", inner="conv")
    b.conv("Conv_0", "outc", bias=True)
    return b.finish()


def import_coarse_lite(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    b = _Builder(sd)
    b.discard("bin_centers")
    for i in range(5):
        b.conv(f"ConvDown_{i}/Conv_0", f"encoder.{3 * i}", bias=True)
        b.bn(f"BatchNorm_{i}/BatchNorm_0", f"encoder.{3 * i + 1}")
    for i in range(5):
        b.convT(f"ConvUp_{i}/ConvTranspose_0", f"decoder.{3 * i}", bias=True)
        b.bn(f"BatchNorm_{i + 5}/BatchNorm_0", f"decoder.{3 * i + 1}")
    b.conv("Conv_0", "head", bias=True)
    return b.finish()


def _import_dual_decoders(b: _Builder, coarse_head_torch: str):
    b.encoder("SharedEncoder_0", inner="conv", pool="pool_conv")
    for i in range(4):
        b.up(f"coarse_decoder/UpBilinear_{i}", f"coarse_up{i + 1}", inner="conv")
    b.conv("coarse_head", coarse_head_torch, bias=True)
    for i in range(4):
        b.up(f"offset_decoder/UpBilinear_{i}", f"offset_up{i + 1}", inner="conv")
    b.conv("offset_fusion/Conv_0", "offset_fusion.0", bias=True)
    b.bn("offset_fusion/BatchNorm_0/BatchNorm_0", "offset_fusion.1")
    b.conv("offset_fusion/Conv_1", "offset_fusion.3", bias=True)
    b.bn("offset_fusion/BatchNorm_1/BatchNorm_0", "offset_fusion.4")
    b.conv("offset_fusion/Conv_2", "offset_head", bias=True)


def import_coarse_offset(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    b = _Builder(sd)
    b.discard("bin_centers")
    _import_dual_decoders(b, "coarse_head")
    return b.finish()


def import_dual_regression(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    b = _Builder(sd)
    _import_dual_decoders(b, "coarse_head")
    return b.finish()


_IMPORTERS = {
    "unet_baseline": import_unet,
    "unet_cvae": import_unet_cvae,
    "base_residual": import_base_residual,
    "binaural_attention": import_binaural,
    "rgb_depth": import_rgb_depth,
    "adabins_distillation": import_adabins,
    "coarse_unet": import_coarse_unet,
    "coarse_lite": import_coarse_lite,
    "coarse_with_offset": import_coarse_offset,
    "dual_regression": import_dual_regression,
}


def import_torch_family(family: str, sd: Dict[str, np.ndarray], **kwargs) -> Dict[str, dict]:
    """Map a reference torch state_dict to flax variables for ``family``."""
    if family not in _IMPORTERS:
        raise ValueError(
            f"no torch importer for family {family!r}; available: {sorted(_IMPORTERS)}"
        )
    return _IMPORTERS[family](sd, **kwargs)


def import_for_config(cfg, sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    """Dispatch on a loaded Config (mirrors the reference driver mapping)."""
    name = cfg.model.name
    if name in ("unet_baseline", "unet_cvae"):
        nd = 8 if cfg.model.generator == "unet_256" else 7
        fn = import_unet if name == "unet_baseline" else import_unet_cvae
        return fn(sd, num_downs=nd)
    if name == "binaural_attention":
        return import_binaural(sd, attention_levels=tuple(cfg.model.attention_levels))
    if name == "coarse_depth":
        by_type = {"unet": import_coarse_unet, "lite": import_coarse_lite,
                   "hybrid": import_coarse_offset, "dual_reg": import_dual_regression}
        return by_type[cfg.model.model_type](sd)
    return import_torch_family(name, sd)


def check_structure(imported: Dict[str, dict], init_vars: Dict[str, dict]) -> None:
    """Assert the imported tree matches a model.init tree leaf-for-leaf."""
    from flax.traverse_util import flatten_dict

    for col in ("params", "batch_stats"):
        want = flatten_dict(init_vars.get(col, {}))
        got = flatten_dict(imported.get(col, {}))
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        if missing or extra:
            raise ValueError(
                f"{col} mismatch: missing={missing[:6]} extra={extra[:6]}"
            )
        for k, arr in want.items():
            if tuple(arr.shape) != tuple(got[k].shape):
                raise ValueError(
                    f"{col} {'/'.join(k)}: shape {got[k].shape} != expected {arr.shape}"
                )
