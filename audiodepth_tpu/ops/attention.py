"""Blockwise (flash-style) spatial cross-attention.

The reference's BinauralCrossAttention materializes a full HW×HW attention
matrix per batch element (binaural_attention_model.py:119-151) — at level 2
of a 256² input that is a 16384×16384 matrix (1 GiB fp32 per sample), the
repo's dominant memory hot spot (SURVEY §5). Here attention is computed in
query blocks: scores for one [block_q, N] tile at a time, softmax in fp32,
then the value contraction — peak memory O(block_q · N) instead of O(N²),
with both contractions landing on the MXU.

A Pallas fused kernel can replace the lax.map body later; the blockwise
structure (and its memory bound) is already right.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def blockwise_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 1024,
) -> jnp.ndarray:
    """softmax(q @ k^T * scale) @ v, computed in query blocks.

    Args:
      q: [B, N, Dk] queries.
      k: [B, M, Dk] keys.
      v: [B, M, Dv] values.
      scale: score multiplier (the reference uses 1/sqrt(C_full)).
      block_q: query tile size (N is padded up to a multiple).

    Returns [B, N, Dv] in q.dtype.
    """
    b, n, dk = q.shape
    m = k.shape[1]
    dv = v.shape[-1]
    bq = min(block_q, n)
    pad = (-n) % bq
    if pad:
        q = jnp.concatenate([q, jnp.zeros((b, pad, dk), q.dtype)], axis=1)
    nblocks = q.shape[1] // bq
    qb = q.reshape(b, nblocks, bq, dk).transpose(1, 0, 2, 3)  # [nb, B, bq, dk]

    # softmax statistics at ≥fp32 (never DOWNcast — f64 parity tests)
    acc_t = jnp.promote_types(q.dtype, jnp.float32)

    def one_block(q_tile):
        scores = jnp.einsum(
            "bqd,bkd->bqk", q_tile.astype(acc_t), k.astype(acc_t)
        ) * scale
        attn = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", attn, v.astype(acc_t))

    out = jax.lax.map(one_block, qb)                           # [nb, B, bq, dv]
    out = out.transpose(1, 0, 2, 3).reshape(b, nblocks * bq, dv)
    return out[:, :n].astype(v.dtype)
