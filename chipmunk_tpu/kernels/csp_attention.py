"""Pallas TPU column-sparse (gathered-KV) flash attention.

TPU equivalent of the reference's csp_attn / csp_128_attn CUDA kernels
(csrc/attn/csp_attn.cu, csrc/attn/csp_128_attn.cu): each query group of
``qg`` rows attends only to the KV rows listed in its index set; softmax is
over that subset; output is a fresh tensor that callers combine with the
delta cache (``cache ± o_sparse``, reference modules/attn.py:164-190 —
fused by XLA with buffer donation, so no in-place o_scale variant needed).

TPU-first design (vs the reference's warp-specialized producer/consumer +
per-row cp.async gather, csp_attn.cu:135-191):
  * indices are **block-granular**: one index names ``kv_block`` contiguous
    KV tokens (config attn.kv_block).  After the voxel/patchify reorder,
    attention mass is spatially clustered, so block selection is the natural
    TPU mapping — every gather is one large DMA instead of 256-byte row
    copies.  kv_block can be as small as 8 for near-token granularity.
  * grid = (B*H, G).  Each program owns one query group: its index row
    (int32[jmax], ≤ a few KB) is staged into SMEM by BlockSpec, K/V stay in
    HBM and gathered tiles are DMA'd into double-buffered VMEM scratch —
    the analogue of the reference's TMA-prefetched index pipeline
    (csp_attn.cu:228-243) with Mosaic semaphores instead of mbarriers.
  * per-group variable counts: indices are padded by repeating the last
    valid block; tiles beyond the count are skipped (no DMA, no FLOPs).

Layout contract (enforced by the wrapper):
  q: [B,H,Sq,D] with Sq % qg == 0 ; k,v: [B,H,Sk,D] with Sk % kv_block == 0
  block_inds: int32 [B,H,G,jmax], entries in [0, Sk/kv_block), padded by
      repeating the last valid entry (see ``pad_block_indices``)
  block_counts: int32 [B,H,G]
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.attn_ref import attn_scale

NEG_INF = -1.0e30
COMPUTE_TILE = 128   # KV tokens per MXU step (gathers per tile = 128/kv_block)


def pad_block_indices(inds: jnp.ndarray, counts: jnp.ndarray) -> jnp.ndarray:
    """Replace entries at positions >= count with the last valid entry, so
    skipped grid steps re-"fetch" an already-resident block (no DMA)."""
    pos = jnp.arange(inds.shape[-1], dtype=jnp.int32)
    last = jnp.take_along_axis(
        inds, jnp.maximum(counts - 1, 0)[..., None].astype(jnp.int32), axis=-1)
    return jnp.where(pos < counts[..., None], inds, last)


def _csp_kernel(inds_ref, counts_ref,            # SMEM (blocked per group)
                q_ref,                            # VMEM [1, qg, D]
                k_hbm, v_hbm,                     # ANY  [BH, Sk, D]
                o_ref,                            # VMEM [1, qg, D]
                kt_ref, vt_ref,                   # VMEM [2, TILE, D] scratch
                acc_ref, m_ref, l_ref,            # VMEM scratch
                sems,                             # DMA sems [2, 2, per_tile]
                *, tau: float, kv_block: int, n_tiles: int, qg: int):
    b, g = pl.program_id(0), pl.program_id(1)
    per_tile = COMPUTE_TILE // kv_block
    count = counts_ref[0, 0, g]                      # valid gather blocks
    # number of compute tiles actually needed (ceil)
    live_tiles = (count + per_tile - 1) // per_tile

    def tile_dma(jc, slot, t):
        idx = inds_ref[0, g, jc * per_tile + t]
        kd = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(idx * kv_block, kv_block), :],
            kt_ref.at[slot, pl.ds(t * kv_block, kv_block), :],
            sems.at[0, slot, t])
        vd = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(idx * kv_block, kv_block), :],
            vt_ref.at[slot, pl.ds(t * kv_block, kv_block), :],
            sems.at[1, slot, t])
        return kd, vd

    def start_tile(jc, slot):
        for t in range(per_tile):
            kd, vd = tile_dma(jc, slot, t)
            kd.start()
            vd.start()

    def wait_tile(jc, slot):
        for t in range(per_tile):
            kd, vd = tile_dma(jc, slot, t)
            kd.wait()
            vd.wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(live_tiles > 0)
    def _():
        start_tile(0, 0)

    q = q_ref[0]                                  # [qg, D]

    def body(jc, _):
        slot = jax.lax.rem(jc, 2)

        @pl.when(jc + 1 < live_tiles)
        def _prefetch():
            start_tile(jc + 1, 1 - slot)

        @pl.when(jc < live_tiles)
        def _compute():
            wait_tile(jc, slot)
            s = jax.lax.dot_general(q, kt_ref[slot], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * tau
            # mask gather sub-blocks beyond count on the last live tile
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = (jc * per_tile + col // kv_block) < count
            s = jnp.where(valid, s, NEG_INF)

            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            m_ref[:] = m_new
            acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
                p.astype(vt_ref.dtype), vt_ref[slot],
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)

    l = l_ref[:]
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('qg', 'kv_block', 'interpret'))
def csp_attn(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
             block_inds: jnp.ndarray, block_counts: jnp.ndarray,
             qg: int = 128, kv_block: int = 128,
             interpret: bool = False) -> jnp.ndarray:
    """Column-sparse attention.  Returns o [B,H,Sq,D] (q.dtype).

    block_inds int32 [B,H,G,jmax] (block ids, will be pad-normalized),
    block_counts int32 [B,H,G].  jmax * kv_block is the static max selected
    tokens per group.
    """
    B, H, Sq, D = q.shape
    Sk = k.shape[-2]
    assert Sq % qg == 0, (Sq, qg)
    assert Sk % kv_block == 0, (Sk, kv_block)
    assert COMPUTE_TILE % kv_block == 0, kv_block
    G = Sq // qg
    jmax = block_inds.shape[-1]
    per_tile = COMPUTE_TILE // kv_block
    # pad jmax so tiles divide evenly
    jpad = (-jmax) % per_tile
    block_counts = jnp.minimum(block_counts, jmax)
    block_inds = pad_block_indices(block_inds, block_counts)
    if jpad:
        block_inds = jnp.concatenate(
            [block_inds,
             jnp.repeat(block_inds[..., -1:], jpad, axis=-1)], axis=-1)
        jmax += jpad
    n_tiles = jmax // per_tile

    qf = q.reshape(B * H, Sq, D)
    kf = k.reshape(B * H, Sk, D)
    vf = v.reshape(B * H, Sk, D)
    indsf = block_inds.reshape(B * H, G, jmax)
    countsf = block_counts.reshape(B * H, 1, G).astype(jnp.int32)

    o = pl.pallas_call(
        functools.partial(_csp_kernel, tau=attn_scale(D), kv_block=kv_block,
                          n_tiles=n_tiles, qg=qg),
        grid=(B * H, G),
        in_specs=[
            # whole per-(b,h) index plane in SMEM (TPU block-shape rules
            # disallow single-row SMEM blocks; a plane is a few KB)
            pl.BlockSpec((1, G, jmax), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, qg, D), lambda b, g: (b, g, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, qg, D), lambda b, g: (b, g, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, COMPUTE_TILE, D), k.dtype),
            pltpu.VMEM((2, COMPUTE_TILE, D), v.dtype),
            pltpu.VMEM((qg, D), jnp.float32),
            pltpu.VMEM((qg, 1), jnp.float32),
            pltpu.VMEM((qg, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, per_tile)),
        ],
        interpret=interpret,
    )(indsf, countsf, qf, kf, vf)
    return o.reshape(B, H, Sq, D)
