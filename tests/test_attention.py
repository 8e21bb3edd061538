"""Cross-attention numerics: the XLA blockwise path AND the Pallas flash
kernels (fwd values, logsumexp, and all three gradients) — the kernels run
in interpret mode so CI executes the actual kernel math on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audiodepth_tpu.ops.pallas.flash_attention as fa
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


def _rand_qkv(seed, b=2, n=128, m=128, dk=16, dv=32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, n, dk)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, m, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, m, dv)), jnp.float32)
    return q, k, v


def test_flash_fwd_kernel_interpret():
    """Pallas forward kernel: output AND logsumexp vs the naive reference,
    with multiple q/k blocks so the online-softmax update path runs."""
    q, k, v = _rand_qkv(2)
    scale = 1.0 / 4.0
    out, lse = fa._flash_fwd(q, k, v, scale, block_q=64, block_k=32,
                             interpret=True)
    ref = naive_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    lse_ref = jax.scipy.special.logsumexp(s, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                               rtol=1e-4, atol=1e-5)


def test_flash_bwd_kernel_interpret():
    """Pallas backward kernels: dq, dk, dv vs jax.vjp of the naive path."""
    q, k, v = _rand_qkv(3)
    scale = 1.0 / 4.0
    out, lse = fa._flash_fwd(q, k, v, scale, block_q=32, block_k=64,
                             interpret=True)
    rng = np.random.default_rng(4)
    do = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
    dq, dk, dv = fa._flash_bwd(q, k, v, out, lse, do, scale,
                               block_q=32, block_k=64, interpret=True)
    _, vjp = jax.vjp(lambda q_, k_, v_: naive_attention(q_, k_, v_, scale),
                     q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(do)
    for got, ref in ((dq, dq_ref), (dk, dk_ref), (dv, dv_ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)


def test_flash_bwd_odd_head_dims_interpret():
    """Transposed dq/dk path with dk_orig below / not a multiple of the
    16-sublane dk_sub granule (lane-sliced operands stay zero-padded)."""
    scale = 1.0 / 4.0
    for dk_orig in (8, 40):
        q, k, v = _rand_qkv(10 + dk_orig, dk=dk_orig)
        out, lse = fa._flash_fwd(q, k, v, scale, block_q=64, block_k=32,
                                 interpret=True)
        rng = np.random.default_rng(11)
        do = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
        dq, dk, dv = fa._flash_bwd(q, k, v, out, lse, do, scale,
                                   block_q=64, block_k=32, interpret=True)
        _, vjp = jax.vjp(lambda q_, k_, v_: naive_attention(q_, k_, v_, scale),
                         q, k, v)
        dq_ref, dk_ref, dv_ref = vjp(do)
        assert dq.shape == q.shape and dk.shape == k.shape
        for got, ref in ((dq, dq_ref), (dk, dk_ref), (dv, dv_ref)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-3, atol=1e-4)


def test_flash_custom_vjp_interpret(monkeypatch):
    """End-to-end custom_vjp (the exact production call path) in interpret
    mode: value and all three grads vs the naive reference."""
    monkeypatch.setattr(fa, "INTERPRET", True)
    q, k, v = _rand_qkv(5, n=1024, m=1024)  # _pick_block → 1024, single block
    scale = 1.0 / 4.0
    f = lambda *a: jnp.sum(fa.flash_cross_attention(*a, scale) ** 2)
    g = lambda *a: jnp.sum(naive_attention(*a, scale) ** 2)
    np.testing.assert_allclose(float(f(q, k, v)), float(g(q, k, v)), rtol=1e-4)
    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_dispatcher_falls_back_on_cpu():
    # on CPU the dispatcher must use the XLA path regardless of tiling
    q = jnp.zeros((1, 256, 8))
    k = jnp.zeros((1, 256, 8))
    v = jnp.ones((1, 256, 16))
    out = cross_attention(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_flash_bwd_many_k_sweeps_interpret():
    """dqt accumulates in its full-N output block across ≥4 k-sweeps
    (pins the one-flush-per-batch out_spec design; nk > 2 so the
    accumulate branch runs repeatedly)."""
    q, k, v = _rand_qkv(21, n=128, m=256)
    scale = 1.0 / 4.0
    out, lse = fa._flash_fwd(q, k, v, scale, block_q=32, block_k=64,
                             interpret=True)
    rng = np.random.default_rng(22)
    do = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
    dq, dk, dv = fa._flash_bwd(q, k, v, out, lse, do, scale,
                               block_q=32, block_k=64, interpret=True)
    _, vjp = jax.vjp(lambda q_, k_, v_: naive_attention(q_, k_, v_, scale),
                     q, k, v)
    for got, ref in zip((dq, dk, dv), vjp(do)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)
