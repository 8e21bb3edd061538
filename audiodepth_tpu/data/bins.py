"""Depth binning: linear / log / SID edges + bucketize.

Twin of BinnedDepthDataset's bin machinery
(dataloader/SparseDepth_Dataset.py:284-330 in the reference):
  linear: linspace(d_min, d_max, n+1)
  log:    logspace(log10 d_min, log10 d_max, n+1)
  sid:    d_min · (d_max/d_min)^(t^α), t = linspace(0,1,n+1), α=0.6 (DORN)
  centers = edge midpoints; indices = bucketize(depth, edges[1:-1]) clipped.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def compute_bin_edges(
    n_bins: int,
    depth_min: float = 0.1,
    depth_max: float = 30.0,
    mode: str = "linear",
    sid_alpha: float = 0.6,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (edges [n+1], centers [n]) as float32 numpy arrays."""
    if mode == "linear":
        edges = np.linspace(depth_min, depth_max, n_bins + 1)
    elif mode == "log":
        edges = np.logspace(np.log10(depth_min), np.log10(depth_max), n_bins + 1)
    elif mode == "sid":
        t = np.linspace(0.0, 1.0, n_bins + 1)
        edges = depth_min * (depth_max / depth_min) ** (t ** sid_alpha)
    else:
        raise ValueError(f"unknown bin mode {mode!r}")
    centers = 0.5 * (edges[:-1] + edges[1:])
    return edges.astype(np.float32), centers.astype(np.float32)


def depth_to_bins(depth: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """Bucketize depth to bin indices [0, n_bins-1] (torch.bucketize twin)."""
    n_bins = edges.shape[0] - 1
    inner = edges[1:-1]
    # torch.bucketize(right=False): smallest i with boundaries[i] >= v,
    # which is numpy searchsorted side='left'.
    idx = jnp.searchsorted(inner, depth, side="left")
    return jnp.clip(idx, 0, n_bins - 1).astype(jnp.int32)


def depth_to_bins_np(depth: np.ndarray, edges: np.ndarray) -> np.ndarray:
    n_bins = edges.shape[0] - 1
    idx = np.searchsorted(edges[1:-1], depth, side="left")
    return np.clip(idx, 0, n_bins - 1).astype(np.int32)


def add_bins_to_batch(batch: dict, edges: np.ndarray, max_depth: float,
                      depth_norm: bool) -> dict:
    """Attach int bin targets ('bins' [B,H,W]) bucketized in METERS.

    Bin edges are always metric (BinnedDepthDataset uses depth_min=0.1m to
    cfg.max_depth), so normalized depth is denormalized before bucketizing.
    Handles compact-transport depth (uint16 fixed point, data/codec.py) by
    decoding to units first.
    """
    depth = batch["depth"][..., 0]
    if depth.dtype == np.uint16:
        units = 1.0 if depth_norm else max_depth
        depth = depth.astype(np.float32) * (units / 65535.0)
    if depth_norm:
        depth = depth * max_depth
    out = dict(batch)
    out["bins"] = depth_to_bins_np(depth, edges)
    return out
