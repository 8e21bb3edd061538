"""Pallas TPU flash cross-attention: fused forward AND backward kernels.

Forward: online-softmax attention over (batch, q-block, k-block) grid with
fp32 running max/sum accumulators in VMEM — peak memory O(block²) instead of
the reference's full HW×HW materialization (binaural_attention_model.py:
124-131; 16384² per sample at level 2). Also emits the per-row logsumexp L
so the backward can rematerialize probabilities blockwise.

Backward: ONE merged kernel (grid b × k-block × q-block), never
materializing an N×N tensor:
    D  = rowsum(do ⊙ o)                      (XLA, elementwise)
    p  = exp(q·kᵀ·scale − L)                 (recomputed ONCE per block pair)
    dv = pᵀ·do          dp = do·vᵀ           ds = p ⊙ (dp − D)
    dqᵀ = k₁₆ᵀ·dsᵀ·scale                     dkᵀ = q₁₆ᵀ·ds·scale
dkᵀ/dv accumulate in VMEM scratch across the q-block sweep; dqᵀ
accumulates in a persistent full-N VMEM scratch. Two wins vs the classic
two-kernel split: (1) s and dp are computed once instead of twice — 5
block matmuls per (q,k) pair instead of 7; (2) dq and dk are produced
TRANSPOSED from the lane-SLICED (un-padded, dk=16-wide) operands, so
those two matmuls stream 16 MXU output rows instead of a 128-lane padded
output tile (~8x less MXU work each). Measured on the level-2 shape on
v5e: two-kernel 369 ms → merged 288 ms → merged+both-transposed 203 ms
(idle host; 236 ms under host contention).

Requirements: N % block == 0 (true for every feature level here: HW ∈
{256, 1024, 4096, 16384}); head dims zero-padded to the 128-lane boundary
outside the kernels. Use `cross_attention()` which dispatches
Pallas-on-TPU / XLA elsewhere.

Performance floor — revisit triggers. The binaural family sits at MFU
~0.43 (flat r03→r04) and the negative experiments recorded in RESULTS.md
argue that is structural FOR THE CURRENT TOOLCHAIN, resting on two Mosaic
assumptions: (1) the dk=16 contraction cannot occupy fewer than one
128-lane MXU tile, so the s = q·kᵀ recompute pays an 8× lane pad that no
blocking choice removes; (2) Mosaic serializes the per-grid-step
matmul→softmax→matmul chain rather than software-pipelining the VPU
softmax under the next MXU block. Reopen this kernel if either assumption
breaks: a Mosaic release that overlaps VPU work with MXU issue across
grid steps (watch: fwd block-1024 time dropping below ~100 ms at the
level-2 shape without source changes), native sub-tile / packed-lane
contraction support for dk<128, or a workload change that raises dk to
≥64 (the pad waste then drops ≤2× and larger q-blocks win). Until one of
those fires, further tuning here is not worth the turns — measured
variants (asymmetric blocks, two-kernel splits) are all within noise of
or worse than the current shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..attention import blockwise_cross_attention

# Measured on v5e-1 at level-2 shapes (B=128 — both directions stacked at
# bs=64 — N=16384, dk=16, dv=128, bf16 operands / fp32 softmax stats):
#   fwd:  block 512 → 252 ms, block 1024 → 141 ms (63% MXU counting the
#         dk→128 lane padding; the gap is the un-overlapped VPU softmax)
#   bwd:  two-kernel split → 369 ms; merged one-pass kernel → 288 ms
#         (5 block matmuls per (q,k) pair instead of 7); + transposed
#         lane-sliced dq/dk matmuls → 203 ms on an idle host (only the s
#         recompute still pays the dk→128 pad; dq/dk stream 16 output
#         rows). Asymmetric blocks (512,2048)/(2048,512) don't beat
#         (1024,1024) — measured 198-224 ms.
# Grid-step overhead dominates small blocks; 1024² fp32 scores = 4 MB VMEM,
# but wide values (dv=512) blow the 16 MB scoped-VMEM stack at 1024 —
# hence the dv-aware cap.
DEFAULT_BLOCK = 1024

# Tests set this True to execute the kernels in Pallas interpret mode on
# CPU, so the kernel math (not just the XLA twin) is pinned in CI.
INTERPRET = False

# Sequences with N and M both ≤ this go to the XLA twin even on TPU (grid
# launch overhead dominates the tiny N² there — see cross_attention).
# bench.py keys its analytic FLOP count off the same constant.
XLA_DISPATCH_MAX_N = 256


def _pick_block(n: int, dv: int = 128) -> int:
    # dv=512 @ block 1024 blows the 16 MB scoped-VMEM stack in the merged
    # backward (s/p/dp/ds blocks + dv scratch) — cap at 512 there. dv=256
    # fits at 1024 since the dq/dk accumulators went transposed (measured
    # level-3 shape: 46.6 ms @512 → 41.9 ms @1024 fwd+bwd).
    cap = DEFAULT_BLOCK if dv <= 256 else 512
    return min(cap, n)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

# softmax runs in the log2 domain: scale·log2(e) is folded into q OUTSIDE
# the kernel (one [B,N,dk] pass instead of an [bq,bk] VPU pass per block
# pair) and exp2 replaces exp (cheaper VPU transcendental). Measured on the
# level-2 shape: 161.7 → 150.8 ms fwd (-6.7%); output err vs the natural-
# domain kernel ≤ 2.4e-4 (bf16 q-scaling rounding, inside bf16 epsilon).
LOG2E = 1.4426950408889634


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr):
    from jax.experimental import pallas as pl

    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # matmuls at native input precision (bf16 on the MXU in production)
    # with fp32 accumulation; softmax statistics stay fp32.
    # q arrives pre-scaled by scale*log2e, so s is already in log2 domain.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(k_idx == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)
        # convert back to the natural-log domain for the bwd interface
        lse_ref[0] = (m_scr[:] + jnp.log2(l_scr[:])) * (1.0 / LOG2E)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                dqt_ref, dkt_ref, dv_ref, dkt_scr, dv_scr,
                *, scale, block_q):
    """Merged backward: grid (b, k-block, q-block), q innermost.

    Recomputes s and dp ONCE per block pair and produces all three grads:
    dkᵀ/dv accumulate in small VMEM scratch over the consecutive q sweep
    (written out at the sweep's end, the standard pattern); dq accumulates
    TRANSPOSED ([dk, N]) DIRECTLY IN ITS OUTPUT BLOCK — the dqt out_spec
    maps every (kk, i) step of a batch to the one full-[dk_sub, N] block,
    so the buffer lives in VMEM for the whole per-batch sweep and is
    flushed to HBM exactly once, at the batch boundary (consecutive-revisit
    semantics only; no reliance on out-of-order flush ordering, no
    redundant per-sweep writes). BOTH dq and dk are produced transposed,
    as q16ᵀ·ds-shaped matmuls over the lane-SLICED (un-padded) head dim:
    the [dk_sub, block] output streams only dk_sub≈16 MXU rows instead of
    a 128-lane padded output tile, cutting those two matmuls ~8x, and the
    [dk, N] accumulator rides the sublane axis so it is 8x smaller in
    VMEM — which is what lets the full-N dq buffer coexist with
    1024-wide blocks.
    """
    from jax.experimental import pallas as pl

    k_idx = pl.program_id(1)
    nk = pl.num_programs(1)
    q_idx = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(q_idx == 0)
    def _init_kv():
        dkt_scr[:] = jnp.zeros_like(dkt_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    dk_sub = dqt_ref.shape[1]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0].astype(jnp.float32)   # pre-multiplied by log2e outside
    dsum = dsum_ref[0].astype(jnp.float32)

    # q arrives pre-scaled by scale*log2e: s is in the log2 domain and the
    # probability rematerialization is one exp2 with no per-block scale pass
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp2(s - lse2)                                 # [bq, bk]
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # pᵀ·do [bk, dv]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                      # [bq, bk]
    ds = p * (dp - dsum)
    # q is pre-scaled by scale*log2e and dk wants q·scale: divide log2e out
    # at the cheap [dk, bk] accumulator instead of an [bq, bk] pass
    dkt_scr[:] = dkt_scr[:] + jax.lax.dot_general(
        q[:, :dk_sub], ds.astype(q.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / LOG2E)                                      # q16ᵀ·ds [dk, bk]

    dqt_part = jax.lax.dot_general(
        k[:, :dk_sub], ds.astype(k.dtype), (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                              # k16ᵀ·dsᵀ [dk, bq]

    cols = pl.ds(q_idx * block_q, block_q)

    @pl.when(k_idx == 0)
    def _dq_first():
        dqt_ref[0, :, cols] = dqt_part

    @pl.when(k_idx != 0)
    def _dq_accum():
        dqt_ref[0, :, cols] = dqt_ref[0, :, cols] + dqt_part

    @pl.when(q_idx == nq - 1)
    def _finalize():
        dkt_ref[0] = dkt_scr[:].astype(dkt_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _pad_lanes(x: jnp.ndarray, mult: int = 128) -> jnp.ndarray:
    pad = (-x.shape[-1]) % mult
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_fwd(q, k, v, scale, block_q=DEFAULT_BLOCK, block_k=DEFAULT_BLOCK,
               interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = q.shape
    m = k.shape[1]
    dv = v.shape[-1]
    assert n % block_q == 0 and m % block_k == 0, (n, m, block_q, block_k)
    # fold scale + the log2-domain conversion into q: one [B,N,dk] pass
    # here instead of an [bq,bk] VPU pass per block pair in the kernel
    qp = _pad_lanes((q * (scale * LOG2E)).astype(q.dtype))
    kp = _pad_lanes(k)
    dk = qp.shape[-1]

    out, lse = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, n, dv), v.dtype),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ),
        grid=(b, n // block_q, m // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dk), lambda bi, i, kk: (bi, i, 0)),
            pl.BlockSpec((1, block_k, dk), lambda bi, i, kk: (bi, kk, 0)),
            pl.BlockSpec((1, block_k, dv), lambda bi, i, kk: (bi, kk, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dv), lambda bi, i, kk: (bi, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bi, i, kk: (bi, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, v)
    return out, lse


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_bwd(q, k, v, o, lse, do, scale, block_q=DEFAULT_BLOCK,
               block_k=DEFAULT_BLOCK, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, dk_orig = q.shape
    m = k.shape[1]
    dv = v.shape[-1]
    qp = _pad_lanes((q * (scale * LOG2E)).astype(q.dtype))
    kp = _pad_lanes(k)
    dk = qp.shape[-1]
    dsum = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                   keepdims=True)  # [B, N, 1]
    lse2 = lse * LOG2E  # log2-domain statistics to match the pre-scaled q

    # dq accumulates transposed: dk on the (8-)sublane axis instead of a
    # 128-padded lane axis → the full-N accumulator is ~dk_sub/16 KB per
    # row instead of 512, small enough to live in VMEM for N=16384
    dk_sub = max(16, -(-dk_orig // 16) * 16)

    dqt, dkt, dv_out = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, block_q=block_q),
        out_shape=(
            jax.ShapeDtypeStruct((b, dk_sub, n), jnp.float32),
            jax.ShapeDtypeStruct((b, dk_sub, m), jnp.float32),
            jax.ShapeDtypeStruct((b, m, dv), jnp.float32),
        ),
        grid=(b, m // block_k, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dk), lambda bi, kk, i: (bi, i, 0)),
            pl.BlockSpec((1, block_k, dk), lambda bi, kk, i: (bi, kk, 0)),
            pl.BlockSpec((1, block_k, dv), lambda bi, kk, i: (bi, kk, 0)),
            pl.BlockSpec((1, block_q, dv), lambda bi, kk, i: (bi, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bi, kk, i: (bi, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bi, kk, i: (bi, i, 0)),
        ],
        out_specs=(
            # dqt: ONE full-[dk_sub, n] block per batch element — every
            # (kk, i) step maps to the same block, so it accumulates in
            # VMEM and flushes to HBM once at the batch boundary
            pl.BlockSpec((1, dk_sub, n), lambda bi, kk, i: (bi, 0, 0)),
            pl.BlockSpec((1, dk_sub, block_k), lambda bi, kk, i: (bi, 0, kk)),
            pl.BlockSpec((1, block_k, dv), lambda bi, kk, i: (bi, kk, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((dk_sub, block_k), jnp.float32),
            pltpu.VMEM((block_k, dv), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, v, do, lse2, dsum)

    dq = jnp.swapaxes(dqt, 1, 2)[..., :dk_orig]
    dk_out = jnp.swapaxes(dkt, 1, 2)[..., :dk_orig]

    return (
        dq.astype(q.dtype),
        dk_out.astype(k.dtype),
        dv_out.astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_cross_attention(q, k, v, scale):
    dv = v.shape[-1]
    bq, bk = _pick_block(q.shape[1], dv), _pick_block(k.shape[1], dv)
    out, _ = _flash_fwd(q, k, v, scale, bq, bk, interpret=INTERPRET)
    return out


def _vjp_fwd(q, k, v, scale):
    dv = v.shape[-1]
    bq, bk = _pick_block(q.shape[1], dv), _pick_block(k.shape[1], dv)
    out, lse = _flash_fwd(q, k, v, scale, bq, bk, interpret=INTERPRET)
    return out, (q, k, v, out, lse)


def _vjp_bwd(scale, residuals, g):
    q, k, v, o, lse = residuals
    dv = v.shape[-1]
    bq, bk = _pick_block(q.shape[1], dv), _pick_block(k.shape[1], dv)
    return _flash_bwd(q, k, v, o, lse, g, scale, bq, bk, interpret=INTERPRET)


flash_cross_attention.defvjp(_vjp_fwd, _vjp_bwd)


def cross_attention(q, k, v, scale: float, block_q: int = DEFAULT_BLOCK):
    """Dispatch: Pallas flash kernel on TPU when shapes tile; else XLA.

    Small sequences (N ≤ 256, e.g. the level-5 16×16 feature map) go to
    the XLA twin even on TPU: the N² score tensor is tiny there and the
    Pallas grid/launch overhead dominates (measured 13.2 ms Pallas vs
    ~4-6 ms XLA at [128, 256, 512] fwd+bwd on v5e).
    """
    n, m = q.shape[1], k.shape[1]
    on_tpu = jax.default_backend() == "tpu"
    dv = v.shape[-1]
    big = n > XLA_DISPATCH_MAX_N or m > XLA_DISPATCH_MAX_N
    if (on_tpu and big
            and n % _pick_block(n, dv) == 0 and m % _pick_block(m, dv) == 0):
        return flash_cross_attention(q, k, v, scale)
    return blockwise_cross_attention(q, k, v, scale, block_q=block_q)
