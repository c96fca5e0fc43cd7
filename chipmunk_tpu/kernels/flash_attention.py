"""Pallas TPU flash attention forward, with lse output and an optional fused
per-query-group column-sum output.

TPU equivalents of the reference CUDA kernels (SURVEY.md §2.2):
  * ``dense_attn``        ← csrc/attn/dense_attn.cu (FA2-style fwd + lse)
  * ``dense_colsum_attn`` ← csrc/attn/dense_colsum_attn.cu (adds per-
    query-group column sums of prev-step-normalized probabilities)

Design notes (TPU-first, not a port):
  * base-2 softmax with tau = log2(e)/sqrt(D); lse emitted in **log2 domain**
    (see ops/attn_ref.py for the format rationale vs the reference's
    reciprocal, dense_colsum_attn.cu:316-319).
  * grid = (B*H, Sq/BQ, Sk/BK) with the KV dimension innermost: the running
    (m, l, acc) state lives in VMEM scratch that persists across the KV
    sweep; output is finalized on the last KV block.  One program owns an
    entire 128-row query group, so the colsum accumulator is a plain row
    write per KV block — no cross-warpgroup smem atomics needed (the
    reference burns a smem ring + store_add for this,
    dense_colsum_attn.cu:142-177).
  * the colsum variant needs no extra reduction pass: with the fixed
    prev-step normalizer, colsums are independent of the running max.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.attn_ref import attn_scale

DEFAULT_BQ = None    # adaptive: whole-Q at image scale (see dense_attn)
DEFAULT_BK = 1024
NEG_INF = -1.0e30
# Mosaic's default scoped-vmem cap is 16MB; the whole-Q block's [bq, bk]
# f32 score tile alone is ~18MB at image scale (v5e has 128MB VMEM)
VMEM_LIMIT = 64 * 1024 * 1024
# Largest whole-Q block: [bq, bk] f32 scores + [bq, D] f32 accumulator
# must fit the raised cap with pipelining headroom
MAX_WHOLE_Q = 8192


def _pick_bq(sq: int) -> int:
    """Whole-Q when it fits VMEM (huge MXU tiles + one VPU softmax chain
    per KV block, ~150-180 TF/s vs ~90 at bq=256); else a large tile.
    128-multiple so the lane-packed lse blocks tile exactly."""
    if sq <= MAX_WHOLE_Q:
        return sq + (-sq) % 128
    return 1024


def _flash_kernel(q_ref, k_ref, v_ref,            # inputs
                  o_ref, lse_ref,                 # outputs
                  acc_ref, m_ref, l_ref,          # scratch
                  *, tau: float, sk_valid: int, bq: int, bk: int):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # tau is folded into the [bq,1] max and the exp2's fused multiply-add
    # instead of a standalone [bq,bk] scaling pass — the VPU softmax chain
    # is the throughput limiter, not the MXU (90 -> ~150 TF/s measured)
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if sk_valid % bk != 0:
        # mask padded KV rows on the last block
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
        s = jnp.where(col < sk_valid, s, NEG_INF)

    m_prev = m_ref[:]                              # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True) * tau
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s * tau - m_new)                  # [BQ, BK]
    alpha = jnp.exp2(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0],
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _finalize():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        # lse rides a [BH, Sq/128, 128] array: a trailing size-1 dim would
        # be lane-padded 128x by TPU tiling (1.4GB at video scale), and 2D
        # [BH, Sq] blocks violate the (8,128)-divisibility rule
        lse_ref[0] = (m_ref[:] + jnp.log2(l_safe)).reshape(lse_ref.shape[1:])


def _colsum_kernel(q_ref, k_ref, v_ref, prev_lse_ref,
                   o_ref, lse_ref, cs_ref,
                   acc_ref, m_ref, l_ref, csacc_ref, plse_ref,
                   *, tau: float, sk_valid: int, bq: int, bk: int,
                   score_block: int, qg: int):
    """Each program covers bq = n_sub*qg query rows (n_sub query GROUPS),
    so the colsum accumulator holds n_sub group rows — processing many
    groups per program is what closes the round-1 gap where this kernel
    was pinned to bq=qg=128 and ran at 2.3x the cost of dense_attn."""
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    nb = bk // score_block
    n_sub = bq // qg

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        csacc_ref[:] = jnp.zeros_like(csacc_ref)
        # expand the lane-packed prev_lse [bq/128, 128] into the [bq, 1]
        # column the row subtraction needs (Mosaic has no rows->column
        # shape cast; a one-hot MXU expand + diagonal mask does it once
        # per q block)
        lr = prev_lse_ref[0]
        nrow = bq // 128
        e1 = (jax.lax.broadcasted_iota(jnp.int32, (bq, nrow), 0) // 128
              == jax.lax.broadcasted_iota(jnp.int32, (bq, nrow), 1)
              ).astype(jnp.float32)
        x = jnp.dot(e1, lr, preferred_element_type=jnp.float32)  # [bq,128]
        d = (jax.lax.broadcasted_iota(jnp.int32, (bq, 128), 1)
             == jax.lax.broadcasted_iota(jnp.int32, (bq, 128), 0) % 128)
        plse_ref[:] = jnp.sum(jnp.where(d, x, 0.0), axis=-1, keepdims=True)

    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if sk_valid % bk != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
        s = jnp.where(col < sk_valid, s, NEG_INF)

    # Column sums normalized by the previous step's lse — independent of the
    # running max, so written directly per KV block (reference
    # dense_colsum_attn.cu:267-274).  Emitted at score_block granularity
    # (summed within each kv block): that's the selection granule of the TPU
    # gather kernels, and it keeps the output O(S/score_block) instead of
    # O(S) per group — at video scale the reference's token-granular colsum
    # tensor would be several GB (dense_colsum_attn.cu:580-583).
    p_prev = jnp.exp2(s * tau - plse_ref[:])              # [BQ, BK]
    # per-query-group token sums: [n_sub, qg, BK] -> [n_sub, BK]
    group_sums = p_prev.reshape(n_sub, qg, -1).sum(axis=1)
    # scatter the nb block sums to lanes [j*nb, (j+1)*nb) of the group rows
    # with a shifted 0/1 matrix on the MXU (dynamic-lane stores must be
    # 128-aligned on TPU, so we accumulate instead)
    nbp = csacc_ref.shape[-1]
    bsm = (jax.lax.broadcasted_iota(jnp.int32, (bk, nbp), 0) // score_block
           + j * nb
           == jax.lax.broadcasted_iota(jnp.int32, (bk, nbp), 1)
           ).astype(jnp.float32)
    csacc_ref[:] += jnp.dot(group_sums, bsm,
                            preferred_element_type=jnp.float32)

    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True) * tau
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s * tau - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0],
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _finalize():
        l = l_ref[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = (m_ref[:] + jnp.log2(l_safe)).reshape(lse_ref.shape[1:])
        cs_ref[:] = csacc_ref[:]


def _pad_to(x, mult, axis):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=('bq', 'bk', 'interpret'))
def dense_attn(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               bq: int = DEFAULT_BQ, bk: int = DEFAULT_BK,
               interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flash attention forward.  q,k,v: [B,H,S,D] -> (o [B,H,Sq,D],
    lse fp32 [B,H,Sq] in log2 domain).  Sq is padded internally to bq;
    padded rows return lse of the padded computation and are sliced off.
    bq=None picks the block adaptively (whole-Q at image scale)."""
    B, H, Sq, D = q.shape
    Sk = k.shape[-2]
    bq = bq if bq is not None else _pick_bq(Sq)
    # NOTE: a two-interleaved-accumulator-chain variant (chains=2) was
    # carried through rounds 3-4 behind an opt-in flag; it measured a
    # regression at every shape tried (188 -> 129 TF/s at FLUX scale,
    # docs/DESIGN.md) and was deleted in round 4 — Mosaic already
    # software-pipelines the qk-matmul/softmax/pv-matmul chain across
    # grid steps, so the manual interleave only added merge overhead.
    slab = bk
    qp = _pad_to(q.reshape(B * H, Sq, D), bq, 1)
    kp = _pad_to(k.reshape(B * H, Sk, D), slab, 1)
    vp = _pad_to(v.reshape(B * H, Sk, D), slab, 1)
    Sqp, Skp = qp.shape[1], kp.shape[1]
    grid = (B * H, Sqp // bq, Skp // slab)
    kern = functools.partial(
        _flash_kernel,
        tau=attn_scale(D), sk_valid=Sk, bq=bq, bk=bk)
    chain_scratch = [
        pltpu.VMEM((bq, D), jnp.float32),
        pltpu.VMEM((bq, 1), jnp.float32),
        pltpu.VMEM((bq, 1), jnp.float32),
    ]
    o, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, slab, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, slab, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq // 128, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Sqp, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Sqp // 128, 128), jnp.float32),
        ],
        scratch_shapes=chain_scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(qp, kp, vp)
    return (o[:, :Sq].reshape(B, H, Sq, D),
            lse.reshape(B * H, Sqp)[:, :Sq].reshape(B, H, Sq))


@functools.partial(jax.jit, static_argnames=('qg', 'bq', 'bk',
                                              'score_block', 'interpret'))
def dense_colsum_attn(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      prev_lse: jnp.ndarray,
                      qg: int = 128,
                      bq: int = None, bk: int = DEFAULT_BK,
                      score_block: int = 128,
                      interpret: bool = False,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flash attention forward that also emits per-query-group column-sum
    **selection scores** of the prev-lse-normalized probabilities, summed
    within ``score_block``-token KV blocks (the gather granule of csp_attn).

    ``qg`` is the selection query-group size (config attn.mbm); each
    program block covers bq = 8k*qg rows (whole-Q at image scale), so the
    colsum pass runs at dense_attn block shapes instead of being pinned to
    one group per program.  Padded query rows must carry prev_lse = +big
    (ops.attn_ref.PAD_LSE) so they contribute 0.

    Returns (o [B,H,Sq,D], block colsums fp32 [B,H,G,ceil(Sk/score_block)],
    lse fp32 [B,H,Sq]).
    """
    B, H, Sq, D = q.shape
    Sk = k.shape[-2]
    from ..ops.attn_ref import PAD_LSE
    if bq is None:
        sq8 = Sq + (-Sq) % (8 * qg)
        bq = sq8 if sq8 <= MAX_WHOLE_Q else 8 * qg
    assert bq % (8 * qg) == 0, (bq, qg)
    qp = _pad_to(q.reshape(B * H, Sq, D), bq, 1)
    lp = _pad_to(prev_lse.reshape(B * H, Sq), bq, 1)
    if qp.shape[1] != Sq:
        lp = lp.at[:, Sq:].set(PAD_LSE)
    lp = lp.reshape(B * H, -1, 128)
    kp = _pad_to(k.reshape(B * H, Sk, D), bk, 1)
    vp = _pad_to(v.reshape(B * H, Sk, D), bk, 1)
    Sqp, Skp = qp.shape[1], kp.shape[1]
    n_sub = bq // qg
    Gp = Sqp // qg
    NB = Skp // score_block
    NBp = NB + (-NB) % 128
    grid = (B * H, Sqp // bq, Skp // bk)
    o, lse, cs = pl.pallas_call(
        functools.partial(_colsum_kernel, tau=attn_scale(D), sk_valid=Sk,
                          bq=bq, bk=bk, score_block=score_block, qg=qg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bq // 128, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq // 128, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((n_sub, NBp),
                         lambda b, i, j, R=Sqp // bq: (b * R + i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Sqp, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Sqp // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((B * H * Gp, NBp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((n_sub, NBp), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(qp, kp, vp, lp)
    nb_valid = -(-Sk // score_block)
    assert Sq % qg == 0, (Sq, qg)  # module layout contract: whole q groups
    G = Sq // qg
    cs = cs.reshape(B * H, Gp, NBp)[:, :G, :nb_valid]
    return (o[:, :Sq].reshape(B, H, Sq, D),
            cs.reshape(B, H, G, nb_valid),
            lse.reshape(B * H, Sqp)[:, :Sq].reshape(B, H, Sq))
