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

The same per-family mapping specs run in BOTH directions: _Builder maps
torch→flax (import) and _ExportBuilder runs the identical spec flax→torch,
producing a ``.pth``-ready state_dict the reference loads with
``load_state_dict(strict=True)`` (dead reference modules and buffers are
synthesized at their init values).

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


def load_torch_aux(path: str) -> Dict[str, np.ndarray]:
    """Non-weight payloads from a reference checkpoint wrapper.

    The coarse-depth driver embeds bin_centers/bin_edges next to the
    state_dict (train_coarse_depth.py:632-640); evaluation must adopt them
    or soft-binning runs over the wrong centers. The wrapper's saved
    'epoch' (train.py:1005-1017) is surfaced too so a warm-start can
    continue from epoch+1 like the reference's resume (train.py:603-606).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    aux = {}
    if isinstance(obj, dict):
        for key in ("bin_centers", "bin_edges"):
            v = obj.get(key)
            if v is not None:
                aux[key] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        if isinstance(obj.get("epoch"), (int, np.integer)):
            aux["epoch"] = int(obj["epoch"])
    return aux


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

    # Leaf dtype for the produced flax tree. fp32 is the production value
    # (reference checkpoints are fp32); the float64 gradient-parity tests
    # override it so the transplant is bit-exact in f64.
    param_dtype = np.float32

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
        # ALWAYS copy: tensor.numpy() aliases live torch parameter storage,
        # so without a copy an in-place torch optimizer step would silently
        # rewrite the imported flax leaves (np.asarray is a no-op when the
        # dtype already matches). Caught by the trajectory-parity test.
        tree[path] = np.array(arr, dtype=self.param_dtype)

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

    def dead_bn(self, tprefix: str, ch: int):
        """A BN module the reference registers but never runs: consumed on
        import, synthesized at init values on export."""
        del ch
        self.discard(tprefix)

    def buffer(self, tkey: str, n: int):
        """A registered buffer (e.g. coarse bin_centers): consumed on
        import (bin centers travel as forward args here), synthesized as
        the reference default linspace(0,1,n) on export."""
        del n
        self.discard(tkey)

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


def _spec_unet(b: "_Builder", num_downs: int = 8):
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


# ---------------------------------------------------------------------------
# UNet-cVAE (models/unet_cvae_model.py:49-295)
# ---------------------------------------------------------------------------

def _spec_unet_cvae(b: "_Builder", num_downs: int = 8, ngf: int = 64,
                    output_nc: int = 1):
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
    b.dead_bn(f"{Q[0]}.downnorm", ngf)
    b.dead_bn(f"{Q[0]}.upnorm", output_nc)
    b.dead_bn(f"{Q[n - 1]}.downnorm", ngf * 8)
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


# ---------------------------------------------------------------------------
# Base+Residual (models/base_residual_model.py:83-237)
# ---------------------------------------------------------------------------

def _spec_base_residual(b: "_Builder"):
    b.encoder("SharedEncoder_0")
    for i in range(4):
        b.up(f"UpBilinear_{i}", f"base_up{i + 1}")
    b.conv("Conv_0", "base_head", bias=True)
    for i in range(4):
        b.up(f"UpBilinear_{i + 4}", f"res_up{i + 1}")
    b.conv("Conv_1", "res_head", bias=True)


# ---------------------------------------------------------------------------
# Binaural attention (models/binaural_attention_model.py:81-345)
# ---------------------------------------------------------------------------

def _spec_binaural(b: "_Builder",
                   attention_levels: Sequence[int] = (2, 3, 4, 5)):
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


# ---------------------------------------------------------------------------
# RGB teacher (models/rgb_depth_model.py:80-218)
# ---------------------------------------------------------------------------

def _spec_rgb_depth(b: "_Builder"):
    b.encoder("SharedEncoder_0")
    for i in range(4):
        b.up(f"UpBilinear_{i}", f"up{i + 1}")
    b.conv("Conv_0", "outc", bias=True)


# ---------------------------------------------------------------------------
# AdaBins distillation twins (models/adabins_distillation_model.py:210-459)
# ---------------------------------------------------------------------------

def _spec_adabins(b: "_Builder"):
    for branch in ("audio", "rgb"):
        b.encoder(f"{branch}/AdaBinsEncoder_0", f"{branch}_encoder")
        b.dense(f"{branch}/BinPredictor_0/Dense_0", f"{branch}_bin_predictor.predictor.0")
        b.dense(f"{branch}/BinPredictor_0/Dense_1", f"{branch}_bin_predictor.predictor.3")
        for i in range(4):
            b.up(f"{branch}/AdaBinsDecoder_0/UpBilinear_{i}", f"{branch}_decoder.up{i + 1}")
        b.conv(f"{branch}/AdaBinsDecoder_0/Conv_0", f"{branch}_decoder.class_head", bias=True)
    b.conv("residual_head", "residual_head", bias=True)


# ---------------------------------------------------------------------------
# Coarse-depth family (models/coarse_depth_model.py:86-287, 591-994)
# ---------------------------------------------------------------------------

def _spec_coarse_unet(b: "_Builder", n_bins: int = 128):
    b.buffer("bin_centers", n_bins)  # bin centers are a forward arg here
    b.encoder("SharedEncoder_0", inner="conv", pool="pool_conv")
    for i in range(4):
        b.up(f"_Decoder_0/UpBilinear_{i}", f"up{i + 1}", inner="conv")
    b.conv("Conv_0", "outc", bias=True)


def _spec_coarse_lite(b: "_Builder", n_bins: int = 128):
    b.buffer("bin_centers", n_bins)
    for i in range(5):
        b.conv(f"ConvDown_{i}/Conv_0", f"encoder.{3 * i}", bias=True)
        b.bn(f"BatchNorm_{i}/BatchNorm_0", f"encoder.{3 * i + 1}")
    for i in range(5):
        b.convT(f"ConvUp_{i}/ConvTranspose_0", f"decoder.{3 * i}", bias=True)
        b.bn(f"BatchNorm_{i + 5}/BatchNorm_0", f"decoder.{3 * i + 1}")
    b.conv("Conv_0", "head", bias=True)


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


def _spec_coarse_offset(b: "_Builder", n_bins: int = 8):
    b.buffer("bin_centers", n_bins)
    _import_dual_decoders(b, "coarse_head")


def _spec_dual_regression(b: "_Builder"):
    _import_dual_decoders(b, "coarse_head")


# ---------------------------------------------------------------------------
# flax → torch (export): the SAME specs, run against flax variables
# ---------------------------------------------------------------------------

class _ExportBuilder(_Builder):
    """Runs a mapping spec in reverse: flax variables → torch state_dict."""

    def __init__(self, variables: Dict[str, dict]):
        from flax.traverse_util import flatten_dict

        self.p = {"/".join(k): np.asarray(v)
                  for k, v in flatten_dict(variables.get("params", {})).items()}
        self.s = {"/".join(k): np.asarray(v)
                  for k, v in flatten_dict(variables.get("batch_stats", {})).items()}
        self.out: Dict[str, np.ndarray] = {}
        self.used: set = set()

    def _take_flax(self, tree: Dict[str, np.ndarray], fpath: str) -> np.ndarray:
        if fpath not in tree:
            raise KeyError(f"flax variables are missing expected leaf {fpath!r}")
        self.used.add(fpath)
        return tree[fpath]

    def _emit(self, tkey: str, arr: np.ndarray):
        if tkey in self.out:
            raise ValueError(f"duplicate torch key {tkey}")
        self.out[tkey] = np.ascontiguousarray(arr)

    def conv(self, fpath: str, tprefix: str, bias: bool = True):
        w = self._take_flax(self.p, f"{fpath}/kernel")        # [kh,kw,I,O]
        self._emit(f"{tprefix}.weight", np.transpose(w, (3, 2, 0, 1)))
        if bias:
            self._emit(f"{tprefix}.bias", self._take_flax(self.p, f"{fpath}/bias"))

    def convT(self, fpath: str, tprefix: str, bias: bool = True):
        w = self._take_flax(self.p, f"{fpath}/kernel")        # flipped [kh,kw,I,O]
        self._emit(f"{tprefix}.weight",
                   np.transpose(w, (2, 3, 0, 1))[:, :, ::-1, ::-1])
        if bias:
            self._emit(f"{tprefix}.bias", self._take_flax(self.p, f"{fpath}/bias"))

    def dense(self, fpath: str, tprefix: str, conv1x1: bool = False):
        k = self._take_flax(self.p, f"{fpath}/kernel").T      # [O,I]
        if conv1x1:
            k = k[:, :, None, None]
        self._emit(f"{tprefix}.weight", k)
        self._emit(f"{tprefix}.bias", self._take_flax(self.p, f"{fpath}/bias"))

    def bn(self, fpath: str, tprefix: str):
        self._emit(f"{tprefix}.weight", self._take_flax(self.p, f"{fpath}/scale"))
        self._emit(f"{tprefix}.bias", self._take_flax(self.p, f"{fpath}/bias"))
        self._emit(f"{tprefix}.running_mean", self._take_flax(self.s, f"{fpath}/mean"))
        self._emit(f"{tprefix}.running_var", self._take_flax(self.s, f"{fpath}/var"))
        self.out[f"{tprefix}.num_batches_tracked"] = np.zeros((), np.int64)

    def raw(self, fpath: str, tkey: str):
        self._emit(tkey, self._take_flax(self.p, fpath))

    def dead_bn(self, tprefix: str, ch: int):
        self._emit(f"{tprefix}.weight", np.ones(ch, np.float32))
        self._emit(f"{tprefix}.bias", np.zeros(ch, np.float32))
        self._emit(f"{tprefix}.running_mean", np.zeros(ch, np.float32))
        self._emit(f"{tprefix}.running_var", np.ones(ch, np.float32))
        self.out[f"{tprefix}.num_batches_tracked"] = np.zeros((), np.int64)

    def buffer(self, tkey: str, n: int):
        self._emit(tkey, np.linspace(0.0, 1.0, n, dtype=np.float32))

    def discard(self, *keys_or_prefixes: str):
        pass  # nothing to consume on export

    def finish(self) -> Dict[str, np.ndarray]:
        leftover = sorted((set(self.p) | set(self.s)) - self.used)
        if leftover:
            raise ValueError(
                f"{len(leftover)} flax leaves were not consumed by the "
                f"mapping (architecture drift?): {leftover[:8]}..."
            )
        return self.out


_SPECS = {
    "unet_baseline": _spec_unet,
    "unet_cvae": _spec_unet_cvae,
    "base_residual": _spec_base_residual,
    "binaural_attention": _spec_binaural,
    "rgb_depth": _spec_rgb_depth,
    "adabins_distillation": _spec_adabins,
    "coarse_unet": _spec_coarse_unet,
    "coarse_lite": _spec_coarse_lite,
    "coarse_with_offset": _spec_coarse_offset,
    "dual_regression": _spec_dual_regression,
}


def import_torch_family(family: str, sd: Dict[str, np.ndarray], **kwargs) -> Dict[str, dict]:
    """Map a reference torch state_dict to flax variables for ``family``."""
    if family not in _SPECS:
        raise ValueError(
            f"no torch mapping for family {family!r}; available: {sorted(_SPECS)}"
        )
    b = _Builder(sd)
    _SPECS[family](b, **kwargs)
    return b.finish()


def export_torch_family(family: str, variables: Dict[str, dict],
                        **kwargs) -> Dict[str, np.ndarray]:
    """Map flax variables to a reference-format torch state_dict."""
    if family not in _SPECS:
        raise ValueError(
            f"no torch mapping for family {family!r}; available: {sorted(_SPECS)}"
        )
    b = _ExportBuilder(variables)
    _SPECS[family](b, **kwargs)
    return b.finish()


# thin per-family wrappers (stable public API)
def import_unet(sd, num_downs=8):
    return import_torch_family("unet_baseline", sd, num_downs=num_downs)


def import_unet_cvae(sd, num_downs=8):
    return import_torch_family("unet_cvae", sd, num_downs=num_downs)


def import_base_residual(sd):
    return import_torch_family("base_residual", sd)


def import_binaural(sd, attention_levels=(2, 3, 4, 5)):
    return import_torch_family("binaural_attention", sd,
                               attention_levels=attention_levels)


def import_rgb_depth(sd):
    return import_torch_family("rgb_depth", sd)


def import_adabins(sd):
    return import_torch_family("adabins_distillation", sd)


def import_coarse_unet(sd):
    return import_torch_family("coarse_unet", sd)


def import_coarse_lite(sd):
    return import_torch_family("coarse_lite", sd)


def import_coarse_offset(sd):
    return import_torch_family("coarse_with_offset", sd)


def import_dual_regression(sd):
    return import_torch_family("dual_regression", sd)


def _family_kwargs(cfg) -> tuple:
    """(spec family name, kwargs) for a loaded Config."""
    name = cfg.model.name
    if name == "unet_baseline":
        return name, {"num_downs": 8 if cfg.model.generator == "unet_256" else 7}
    if name == "unet_cvae":
        return name, {"num_downs": 8 if cfg.model.generator == "unet_256" else 7,
                      "ngf": cfg.model.ngf, "output_nc": cfg.model.output_nc}
    if name == "binaural_attention":
        return name, {"attention_levels": tuple(cfg.model.attention_levels)}
    if name == "coarse_depth":
        by_type = {"unet": "coarse_unet", "lite": "coarse_lite",
                   "hybrid": "coarse_with_offset", "dual_reg": "dual_regression"}
        fam = by_type[cfg.model.model_type]
        kw = {} if fam == "dual_regression" else {"n_bins": cfg.model.n_bins}
        return fam, kw
    return name, {}


def import_for_config(cfg, sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    """Dispatch on a loaded Config (mirrors the reference driver mapping)."""
    fam, kw = _family_kwargs(cfg)
    if fam == "unet_cvae":
        kw = {"num_downs": kw["num_downs"]}  # ngf/output_nc are export-only
    if fam in ("coarse_unet", "coarse_lite", "coarse_with_offset"):
        kw = {}
    return import_torch_family(fam, sd, **kw)


def export_for_config(cfg, variables: Dict[str, dict]) -> Dict[str, np.ndarray]:
    """flax variables → reference-format state_dict, driven by a Config."""
    fam, kw = _family_kwargs(cfg)
    return export_torch_family(fam, variables, **kw)


def check_structure(imported: Dict[str, dict], init_vars: Dict[str, dict]) -> None:
    """Assert the imported tree matches a model.init tree leaf-for-leaf."""
    from flax.traverse_util import flatten_dict

    for col in ("params", "batch_stats"):
        # callers pass state.batch_stats verbatim, which is None for
        # norm='instance'/'none' models — treat None as an empty collection
        want = flatten_dict(init_vars.get(col) or {})
        got = flatten_dict(imported.get(col) or {})
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
