"""Shape / parameter / numerics tests for the model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodepth_tpu.configs import load_config
from audiodepth_tpu.models import build_unet, count_params
from audiodepth_tpu.models.unet import UNetGenerator


def test_unet256_shapes_and_head():
    model = UNetGenerator(input_nc=2, output_nc=1, num_downs=8, ngf=8,
                          depth_norm=True, dtype=jnp.float32)
    x = jnp.zeros((2, 256, 256, 2))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(vars_, x, train=False)
    assert y.shape == (2, 256, 256, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0  # sigmoid head


def test_unet_relu_head_when_not_norm():
    model = UNetGenerator(input_nc=2, output_nc=1, num_downs=7, ngf=4,
                          depth_norm=False, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 2))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(vars_, x, train=False)
    assert y.shape == (1, 128, 128, 1)
    assert float(y.min()) >= 0.0  # relu head


def test_unet256_param_count_matches_reference():
    """unet_256 ngf=64 input_nc=2 has exactly 54,408,833 params.

    Golden number obtained by instantiating the reference UnetGenerator
    (models/unetbaseline_model.py:123-148) with the same settings; our NHWC
    twin must reproduce the conv topology exactly (BN running stats are
    buffers, excluded on both sides).
    """
    cfg = load_config("batvisionv2")
    model = build_unet(cfg)
    x = jnp.zeros((1, 256, 256, 2))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    assert count_params(vars_["params"]) == 54_408_833


def test_unet_batchstats_update():
    model = UNetGenerator(input_nc=2, output_nc=1, num_downs=7, ngf=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 2))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    y, mutated = model.apply(vars_, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
    old = jax.tree_util.tree_leaves(vars_["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))
