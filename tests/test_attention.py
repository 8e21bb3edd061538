"""Blockwise cross-attention numerics (CPU: XLA path; Pallas path is
exercised on real TPU by bench/verify runs — its fwd/grad parity vs this
same XLA twin was validated on-chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodepth_tpu.ops.attention import blockwise_cross_attention
from audiodepth_tpu.ops.pallas.flash_attention import cross_attention


def naive_attention(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    return jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(s, axis=-1), v)


@pytest.mark.parametrize("n,block", [(64, 16), (100, 32), (256, 256)])
def test_blockwise_matches_naive(n, block):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, n, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, n, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, n, 16)), jnp.float32)
    scale = 1 / 8.0
    out = blockwise_cross_attention(q, k, v, scale, block_q=block)
    ref = naive_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_blockwise_grads_match_naive():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 64, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 64, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 64, 16)), jnp.float32)
    f = lambda *a: jnp.sum(blockwise_cross_attention(*a, 0.125, block_q=16) ** 2)
    g = lambda *a: jnp.sum(naive_attention(*a, 0.125) ** 2)
    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_dispatcher_falls_back_on_cpu():
    # on CPU the dispatcher must use the XLA path regardless of tiling
    q = jnp.zeros((1, 256, 8))
    k = jnp.zeros((1, 256, 8))
    v = jnp.ones((1, 256, 16))
    out = cross_attention(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)
