"""Pallas TPU column-sparse (gathered-KV) flash attention.

TPU equivalent of the reference's csp_attn / csp_128_attn CUDA kernels
(csrc/attn/csp_attn.cu, csrc/attn/csp_128_attn.cu): each query group of
``qg`` rows attends only to the KV rows listed in its index set; softmax is
over that subset; output is a fresh tensor that callers combine with the
delta cache (``cache ± o_sparse``, reference modules/attn.py:164-190 —
fused by XLA, so no in-place o_scale variant is needed).

Two TPU-first execution modes (vs the reference's warp-specialized
producer/consumer + per-row cp.async gather, csp_attn.cu:135-191):

  * **VMEM-resident** (default when K+V for one head fit in VMEM, i.e.
    image-scale sequences): the whole K/V head is staged into VMEM once per
    (b,h) by the Pallas pipeline and shared by all query groups, and each
    "gather" is a 128-aligned dynamic slice feeding the MXU directly.  The
    per-group gather duplication that makes column-sparse attention
    bandwidth-bound (every group re-reads its own ~15% of KV) never touches
    HBM: total HBM traffic equals dense attention's single K/V read while
    FLOPs drop by the sparsity factor.
  * **HBM-gather** (video-scale sequences): K and V rows of each block
    are packed adjacently in one [nb, 2*kv_block, D] tensor (one fused
    XLA concat) so every selected block is a SINGLE async copy into
    multi-buffered VMEM scratch, with the per-group index row staged in
    SMEM — the analogue of the reference's TMA-prefetched index pipeline
    (csp_attn.cu:228-243).  The mode is scalar DMA issue/wait-bound, so
    copy count, not bytes, is the knob that matters (9.48x vs dense at
    the 119k/5% point, results/bench_csp_hbm_pack.log).

Indices are block-granular (``kv_block`` tokens per index, config
attn.kv_block): selection granule = gather granule.  Variable per-group
counts: indices are padded by repeating the last valid block; tiles beyond
the count are skipped (no DMA, no FLOPs).

Layout contract (enforced by the wrapper):
  q: [B,H,Sq,D] with Sq % qg == 0 ; k,v: [B,H,Sk,D] with Sk % kv_block == 0
  block_inds: int32 [B,H,G,jmax], entries in [0, Sk/kv_block)
  block_counts: int32 [B,H,G], >= 1
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.attn_ref import attn_scale

NEG_INF = -1.0e30
MAX_KV_BLOCK = 128   # gather granule upper bound (one MXU tile)
# Raise Mosaic's scoped-vmem cap (default 16MB; v5e has 128MB VMEM) —
# the resident mode stages whole K/V heads plus gather scratch.  100MB
# keeps S=32k (Wan-scale) heads VMEM-resident: measured 43.7ms vs 65ms
# for the HBM-gather mode at 59% selection (round 3)
VMEM_LIMIT = 100 * 1024 * 1024
# NOTE: a third "direct" mode (flash loop over selected blocks read in
# place from the VMEM-resident K/V head, no gather copies) was built and
# measured in round 4 and DELETED: the per-block fori_loop serializes
# 128x128 matmuls with no pipeline overlap, measuring 0.17-0.48x vs dense
# at every density 0.30-0.85 (results/bench_csp_direct.log) — strictly
# worse than both the gather modes and the dense fallback.  The dense-ish
# regime is handled by the modules/attn.py cost gate (run the layer dense)
# plus lower-density operating points (configs/wan-chipmunk.yml).


def pad_block_indices(inds: jnp.ndarray, counts: jnp.ndarray) -> jnp.ndarray:
    """Replace entries at positions >= count with the last valid entry, so
    skipped steps revisit an already-resident block (no refetch)."""
    pos = jnp.arange(inds.shape[-1], dtype=jnp.int32)
    last = jnp.take_along_axis(
        inds, jnp.maximum(counts - 1, 0)[..., None].astype(jnp.int32), axis=-1)
    return jnp.where(pos < counts[..., None], inds, last)


# ---------------------------------------------------------------- VMEM mode

def _make_expand(kv_block: int, jmax: int):
    """One-hot [jmax, jmax*kv_block] tile->column expansion matrix
    (dynamic-lane gathers aren't a TPU primitive; the MXU is).  Built
    ONCE per program and reused by every query group — constructing it
    inside the group loop measured +2.8ms/layer at Wan scale
    (results/bench_wan_attnstep.log)."""
    JT = jmax * kv_block
    tj = jax.lax.broadcasted_iota(jnp.int32, (jmax, JT), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (jmax, JT), 1) // kv_block
    return (tj == cj).astype(jnp.float32)


def _partial_block_mask(s, valid_ref, g, expand, colrem, kv_block: int):
    """Mask score columns that fall past the model-level KV padding
    boundary.  valid_ref: VMEM [1, G, jmax] f32 — per gathered tile, the
    number of valid leading tokens in that tile (kv_block if fully valid,
    0 if fully padding).  Columns with in-tile offset >= that count get
    NEG_INF."""
    vrow = valid_ref[0, pl.ds(g, 1), :]                          # [1, jmax]
    vcol = jnp.dot(vrow, expand, preferred_element_type=jnp.float32)
    return jnp.where(colrem >= vcol, NEG_INF, s)


def _csp_vmem_kernel(inds_ref, counts_ref,        # SMEM
                     *refs,
                     tau: float, kv_block: int, jmax: int, qg: int,
                     n_groups: int, mask_kv: bool = False):
    """One program per (b,h).  q/K/V/o stay VMEM-resident for the whole
    head; per query group, the selected KV blocks are gathered VMEM->VMEM
    with async local DMA double-buffered across groups, then attention is
    one exact-softmax shot: two large matmuls instead of a flash loop.
    Program count is B*H (vs B*H*G), so block-pipeline overhead amortizes
    over all groups."""
    if mask_kv:
        valid_ref, q_ref, k_ref, v_ref, o_ref, kg_ref, vg_ref, sems = refs
    else:
        valid_ref = None
        q_ref, k_ref, v_ref, o_ref, kg_ref, vg_ref, sems = refs
    JT = jmax * kv_block

    def group_dmas(g, slot):
        count = counts_ref[0, 0, g]
        for t in range(jmax):
            idx = inds_ref[0, g, t]
            start = pl.multiple_of(idx * kv_block, kv_block)
            dst = pl.ds(t * kv_block, kv_block)
            yield (t < count,
                   pltpu.make_async_copy(
                       k_ref.at[0, pl.ds(start, kv_block), :],
                       kg_ref.at[slot, dst, :], sems.at[0, slot]),
                   pltpu.make_async_copy(
                       v_ref.at[0, pl.ds(start, kv_block), :],
                       vg_ref.at[slot, dst, :], sems.at[1, slot]))

    def start_group(g, slot):
        for live, kd, vd in group_dmas(g, slot):
            @pl.when(live)
            def _():
                kd.start()
                vd.start()

    def wait_group(g, slot):
        for live, kd, vd in group_dmas(g, slot):
            @pl.when(live)
            def _():
                kd.wait()
                vd.wait()

    # unwritten scratch rows (count < jmax) must be finite: 0 * garbage
    # in the PV matmul would poison the output (p is zeroed there, but
    # 0 * NaN = NaN)
    kg_ref[:] = jnp.zeros_like(kg_ref)
    vg_ref[:] = jnp.zeros_like(vg_ref)
    start_group(0, 0)
    if mask_kv:
        expand = _make_expand(kv_block, jmax)
        colrem = (jax.lax.broadcasted_iota(jnp.int32, (qg, JT), 1)
                  % kv_block).astype(jnp.float32)

    def body(g, _):
        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < n_groups)
        def _prefetch():
            start_group(g + 1, 1 - slot)

        wait_group(g, slot)
        count = counts_ref[0, 0, g]
        qrow = pl.multiple_of(g * qg, qg)
        q = q_ref[0, pl.ds(qrow, qg), :]
        s = jax.lax.dot_general(q, kg_ref[slot],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * tau
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col // kv_block < count, s, NEG_INF)
        if mask_kv:
            s = _partial_block_mask(s, valid_ref, g, expand, colrem,
                                    kv_block)
        # exact softmax: the whole selected row is in hand (no online pass)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vg_ref.dtype), vg_ref[slot],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, pl.ds(qrow, qg), :] = (o / l).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)


# ----------------------------------------------------------------- HBM mode

def _csp_hbm_packed_kernel(inds_ref, counts_ref,         # SMEM
                           *refs,
                           tau: float, kv_block: int, jmax: int, qg: int,
                           n_groups: int, mask_kv: bool = False,
                           nbuf: int = 2):
    """Packed-KV HBM mode: K and V rows of each kv_block are stored
    adjacently in one [nb, 2*kv_block, D] tensor, so gathering a selected
    block is ONE async copy instead of two.  The r5 nbuf sweep showed the
    HBM mode is limited by the serial scalar DMA issue+wait work
    (6.1us/group for 2*jmax copies vs the 2.8us transfer floor; deeper
    pipelining bought nothing and only 6.6% of selected blocks are
    adjacent, so coalescing can't merge copies either —
    results/bench_csp_hbm_nbuf.log).  Halving the copy count attacks the
    actual limiter.  The reference's analogue is its fused K+V TMA
    producer loop (csp_attn.cu:135-159)."""
    if mask_kv:
        (valid_ref, q_hbm, kv_hbm, o_hbm,
         qg_ref, kvg_ref, og_ref, qsem, kvsem, osem) = refs
    else:
        valid_ref = None
        (q_hbm, kv_hbm, o_hbm,
         qg_ref, kvg_ref, og_ref, qsem, kvsem, osem) = refs
    b = pl.program_id(0)
    JT = jmax * kv_block

    def q_dma(g, slot):
        return pltpu.make_async_copy(
            q_hbm.at[b, pl.ds(g * qg, qg), :], qg_ref.at[slot],
            qsem.at[slot])

    def o_dma(g, slot):
        return pltpu.make_async_copy(
            og_ref.at[slot], o_hbm.at[b, pl.ds(g * qg, qg), :],
            osem.at[slot])

    def kv_dmas(g, slot):
        count = counts_ref[0, 0, g]
        for t in range(jmax):
            idx = inds_ref[0, g, t]
            yield (t < count,
                   pltpu.make_async_copy(kv_hbm.at[b, idx],
                                         kvg_ref.at[slot, t],
                                         kvsem.at[slot]))

    # NOTE (r5 negative result): a dynamic-trip-count fori_loop over
    # [0, count) — fewer iterations (avg 36 live vs jmax 60) and no
    # per-copy compare+branch — measured SLOWER than this fully
    # unrolled static loop: 18.77 ms vs 17.96 ms at the 119k/5% point
    # (results/bench_csp_hbm_dynloop.log).  Mosaic's dynamic scf.for
    # per-iteration overhead exceeds the dead iterations' predicated
    # no-ops; keep the unrolled form.
    def start_group(g, slot):
        q_dma(g, slot).start()
        for live, kvd in kv_dmas(g, slot):
            @pl.when(live)
            def _():
                kvd.start()

    def wait_group(g, slot):
        q_dma(g, slot).wait()
        for live, kvd in kv_dmas(g, slot):
            @pl.when(live)
            def _():
                kvd.wait()

    # unwritten scratch rows must be finite (0 * NaN = NaN in the PV matmul)
    kvg_ref[:] = jnp.zeros_like(kvg_ref)
    for s0 in range(min(nbuf - 1, n_groups)):
        start_group(s0, s0)
    if mask_kv:
        expand = _make_expand(kv_block, jmax)
        colrem = (jax.lax.broadcasted_iota(jnp.int32, (qg, JT), 1)
                  % kv_block).astype(jnp.float32)

    def body(g, _):
        slot = jax.lax.rem(g, nbuf)

        @pl.when(g + nbuf - 1 < n_groups)
        def _prefetch():
            start_group(g + nbuf - 1, jax.lax.rem(g + nbuf - 1, nbuf))

        wait_group(g, slot)
        count = counts_ref[0, 0, g]
        kv = kvg_ref[slot]                       # [jmax, 2*kv_block, D]
        kg = kv[:, :kv_block, :].reshape(JT, -1)
        vg = kv[:, kv_block:, :].reshape(JT, -1)
        s = jax.lax.dot_general(qg_ref[slot], kg,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * tau
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col // kv_block < count, s, NEG_INF)
        if mask_kv:
            s = _partial_block_mask(s, valid_ref, g, expand, colrem,
                                    kv_block)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vg.dtype), vg,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        l = jnp.where(l == 0.0, 1.0, l)

        # o keeps its own 2-deep buffer regardless of the gather depth
        oslot = jax.lax.rem(g, 2)

        @pl.when(g >= 2)
        def _():
            o_dma(g - 2, oslot).wait()

        og_ref[oslot] = (o / l).astype(og_ref.dtype)
        o_dma(g, oslot).start()
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)

    @pl.when(n_groups >= 2)
    def _():
        o_dma(n_groups - 2, jax.lax.rem(n_groups - 2, 2)).wait()
    o_dma(n_groups - 1, jax.lax.rem(n_groups - 1, 2)).wait()


@functools.partial(jax.jit,
                   static_argnames=('qg', 'kv_block', 'interpret', 'mode',
                                    'kv_valid', 'nbuf'))
def csp_attn(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
             block_inds: jnp.ndarray, block_counts: jnp.ndarray,
             qg: int = 128, kv_block: int = 128,
             mode: str = 'auto',
             kv_valid: int = None,
             nbuf: int = 2,
             interpret: bool = False) -> jnp.ndarray:
    """Column-sparse attention.  Returns o [B,H,Sq,D] (q.dtype).

    block_inds int32 [B,H,G,jmax] (kv-block ids, pad-normalized here),
    block_counts int32 [B,H,G].  mode: 'auto' | 'vmem' | 'hbm'.
    kv_valid: static number of valid KV rows; keys at positions
    >= kv_valid (model-level padding tail) are excluded from the softmax
    (the reference slices padded keys off before its kernels,
    hyvideo/modules/attenion.py:106-117).
    nbuf: HBM-mode gather buffer depth (2 = one group of gathers in
    flight; 3 measured within noise of 2 once the gather was packed —
    results/bench_csp_hbm_pack.log).

    A split-KV HBM kernel (separate K and V gather copies, 21.53 ms vs
    packed 17.96 ms at 119k/4%) was the r1-r4 implementation and was
    DELETED after the packed-KV form won on-chip (the mode is scalar
    issue/wait-bound; halving copies is the whole win — see
    docs/DESIGN.md gather-regime notes and results/bench_csp_hbm_*.log).
    """
    B, H, Sq, D = q.shape
    Sk = k.shape[-2]
    assert Sq % qg == 0, (Sq, qg)
    assert Sk % kv_block == 0, (Sk, kv_block)
    assert MAX_KV_BLOCK % kv_block == 0, kv_block
    G = Sq // qg
    jmax = block_inds.shape[-1]
    block_counts = jnp.minimum(block_counts, jmax)
    block_inds = pad_block_indices(block_inds, block_counts)
    mask_kv = kv_valid is not None and kv_valid < Sk

    if mode == 'auto':
        # Pallas double-buffers the whole-head input/output blocks, so the
        # true footprint is 2x the resident q/k/v/o plus gather scratch
        resident = (2 * Sk + 2 * Sq) * D * k.dtype.itemsize
        scratch = 4 * jmax * kv_block * D * k.dtype.itemsize
        mode = ('vmem' if 2 * resident + scratch + (4 << 20) <= VMEM_LIMIT
                else 'hbm')

    qf = q.reshape(B * H, Sq, D)
    kf = k.reshape(B * H, Sk, D)
    vf = v.reshape(B * H, Sk, D)
    indsf = block_inds.reshape(B * H, G, jmax)
    countsf = block_counts.reshape(B * H, 1, G).astype(jnp.int32)
    extra_in, extra_specs = (), ()
    if mask_kv:
        # per-(group, tile) count of valid leading tokens in the gathered
        # tile (computed here with vector ops; SMEM has no vector reads)
        valid = jnp.clip(kv_valid - indsf * kv_block, 0, kv_block)
        extra_in = (valid.astype(jnp.float32),)
        extra_specs = (pl.BlockSpec((1, G, jmax), lambda b: (b, 0, 0)),)

    kw = dict(tau=attn_scale(D), kv_block=kv_block, jmax=jmax, qg=qg,
              n_groups=G, mask_kv=mask_kv)
    if mode == 'vmem':
        o = pl.pallas_call(
            functools.partial(_csp_vmem_kernel, **kw),
            grid=(B * H,),
            in_specs=[
                pl.BlockSpec((1, G, jmax), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, G), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                *extra_specs,
                pl.BlockSpec((1, Sq, D), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, Sk, D), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, Sk, D), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Sq, D), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, jmax * kv_block, D), k.dtype),
                pltpu.VMEM((2, jmax * kv_block, D), v.dtype),
                # one DMA semaphore per (k/v, slot), shared by the jmax
                # gather copies: per-copy semaphore arrays blow the 2KB
                # sflag budget at video jmax (wan jmax=160 -> 2.6KB)
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )(indsf, countsf, *extra_in, qf, kf, vf)
    else:
        # pack K and V rows of each kv_block adjacently so one DMA
        # gathers both (halves the scalar issue+wait work that limits
        # this mode — results/bench_csp_hbm_nbuf.log); the pack itself
        # is one fused XLA copy (~2x KV bytes, ~3% of the gather bytes
        # at the 119k/5% point)
        nb = Sk // kv_block
        kvf = jnp.concatenate(
            [kf.reshape(B * H, nb, kv_block, D),
             vf.reshape(B * H, nb, kv_block, D)], axis=2)
        # clamp the gather depth so the multi-buffered scratch fits VMEM
        while (nbuf > 2 and
               2 * nbuf * jmax * kv_block * D * k.dtype.itemsize
               > VMEM_LIMIT // 2):
            nbuf -= 1
        o = pl.pallas_call(
            functools.partial(_csp_hbm_packed_kernel, nbuf=nbuf, **kw),
            grid=(B * H,),
            in_specs=[
                pl.BlockSpec((1, G, jmax), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, G), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                *extra_specs,
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((nbuf, qg, D), q.dtype),
                pltpu.VMEM((nbuf, jmax, 2 * kv_block, D), k.dtype),
                pltpu.VMEM((2, qg, D), q.dtype),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((nbuf,)),  # shared by jmax gathers
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )(indsf, countsf, *extra_in, qf, kvf)
    return o.reshape(B, H, Sq, D)
