"""Pallas TPU column-sparse delta MLP kernels.

TPU equivalents of the reference's sparse MLP chain (SURVEY.md §3.3):
  * ``csp_mlp_mm1`` ← csrc/mlp/csp_mlp_mm1.cu — for each 128-token block,
    recompute only the selected fc1 neurons: gather weight columns, fused
    bias + tanh-gelu, subtract the cached post-activations, emit the packed
    delta AND refresh the activation cache at the selected positions.
  * ``csp_mlp_mm2`` ← csrc/mlp/csp_mlp_mm2_and_scatter_add.cu — fold the
    packed delta into the output cache: ``out += packed @ fc2[sel]``.

TPU-first design:
  * neuron indices are **block-granular** (``neuron_block`` neurons per
    index, config mlp.neuron_block): every gather of fc1ᵀ/fc2 rows is one
    contiguous DMA driven by a scalar-prefetched BlockSpec index map — the
    TPU analogue of the reference's register-cached index gather
    (csrc/common/memory/global_to_shared.cuh:19-58).
  * the reference's CUDA-graph SM-partitioning trick (scatter_add on 6 SMs
    concurrent with the Triton GEMM on the rest, csp_mlp_mm2_and_scatter_add
    .cu:96-259) is GPU launch-overhead engineering with no TPU meaning: here
    the cache refresh is fused into mm1's output index map (a scattered
    block write), and mm2 accumulates into the donated out_cache.
  * the activation cache is token-major [T, N] (the reference keeps it
    transposed [N, T] for its mm1 register epilogue, modules/mlp.py:56 —
    pointless under Mosaic layouts).

Index contract (enforced by wrappers): int32 block ids in [0, N/bn),
unique within a row, padded by repeating the last valid id; counts >= 1.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .csp_attention import pad_block_indices

# Default token block sharing one neuron set (the reference's mlp.bm key,
# [bm,1] sparsity pattern).  Large bm is the TPU perf lever: the x chunk
# stays VMEM-resident and each gathered weight block is read once per
# chunk instead of once per 128 tokens — at bm=128, per-token-block weight
# gathers re-read ~(T/bm * keep) times the dense weight bytes and the
# kernel is bandwidth-bound; at bm>=512 it is MXU-bound like the reference.
DEFAULT_BM = 128
MM2_COUT_BLOCK = 1024
# Mosaic's default scoped-vmem limit is 16MB; at bm=512 the mm1 working set
# (double-buffered x/cache/packed blocks + gathered weights + scales) is
# ~16.1MB, so raise the cap (v5e has 128MB VMEM; 64MB leaves pipelining room)
VMEM_LIMIT = 64 * 1024 * 1024


def _check_kernel_weight(w, name):
    """fp8 QTensor weights are a measured perf trap in these kernels:
    Mosaic's fp8->bf16 convert is emulated (4.7-12 ms — slower than the
    dense MLP, docs/DESIGN.md kernel table).  int8 is the same byte count
    with ~free converts, so there is no legitimate reason to feed fp8
    here — refuse loudly (VERDICT r3 weak #5)."""
    from ..utils.quant import QTensor
    if isinstance(w, QTensor) and w.q.dtype == jnp.float8_e4m3fn:
        raise ValueError(
            f"{name}: fp8 QTensor weights are rejected by the sparse MLP "
            f"kernels (emulated fp8 converts make them slower than dense, "
            f"docs/DESIGN.md). Store int8 instead — same bytes, ~free "
            f"converts (mlp.is_fp8 maps there automatically, "
            f"modules/mlp_fp8.quant_spec_for_is_fp8).")


def _dq4_planes(q, dtype):
    """In-kernel int4 plane-split dequant: [r, c/2] uint8 (offset-binary
    nibbles; position i holds cols i and i + c/2, utils/quant.py format)
    -> two [r, c/2] planes in ``dtype`` (scale NOT applied — folded
    post-matmul).  Returned as separate planes so callers can split the
    matmul over them instead of paying a cross-lane concat; the HBM win
    is the point — gathered weight traffic halves vs int8/fp8."""
    # All bit ops in int32: Mosaic on v5e does not legalize 8-bit vector
    # arithmetic (arith.subi / arith.shrui on vector<..xi8>); the u8->i32
    # extension and i32 and/shift/sub/convert chain is native
    qi = q.astype(jnp.int32)
    lo = (qi & 0xF) - 8
    hi = (qi >> 4) - 8
    return lo.astype(dtype), hi.astype(dtype)


def _dq4(q, dtype):
    """Materialized [r, c] int4 dequant (concat of the two planes)."""
    lo, hi = _dq4_planes(q, dtype)
    return jnp.concatenate([lo, hi], axis=-1)


def _mm1_kernel(inds_ref, counts_ref,           # scalar prefetch (SMEM)
                *refs, wq: bool = False, w4: bool = False):
    if wq:
        (x_ref, w1t_ref, ws_ref, b1_ref, cache_ref,
         packed_ref, newcache_ref) = refs
    else:
        ws_ref = None
        x_ref, w1t_ref, b1_ref, cache_ref, packed_ref, newcache_ref = refs
    m, j = pl.program_id(0), pl.program_id(1)
    valid = j < counts_ref[m]
    x = x_ref[:]                                  # [BM, C] bf16
    w = w1t_ref[:]                     # [bn, C] bf16|fp8|int8 | [bn,C/2] u8
    if w4:
        # plane-split matmul: contract each nibble plane against its x
        # half — no cross-lane concat of the dequantized block
        lo, hi = _dq4_planes(w, x.dtype)
        h = x.shape[1] // 2
        mid = (jax.lax.dot_general(x[:, :h], lo, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(x[:, h:], hi, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32))
    else:
        if wq:
            # quantized weights: per-out-row scale folded AFTER the matmul
            # ([BM,bn] multiply beats dequantizing the [bn,C] block; the
            # reference's fp8 Triton mm1 fuses scales the same way,
            # triton/csp_mlp_mm1.py:122-130)
            w = w.astype(x.dtype)
        mid = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    if wq:
        mid = mid * ws_ref[0]
    mid = mid + b1_ref[0].astype(jnp.float32)
    act = jax.nn.gelu(mid, approximate=True).astype(cache_ref.dtype)

    @pl.when(valid)
    def _():
        packed_ref[:] = (act.astype(jnp.float32)
                         - cache_ref[:].astype(jnp.float32)
                         ).astype(packed_ref.dtype)
        newcache_ref[:] = act

    @pl.when(jnp.logical_not(valid))
    def _():
        # packed block (m, j) is unique per j: zero it so consumers may
        # reduce over the full jmax without masking.  The newcache block
        # aliases the last valid one — leave its buffer untouched.
        packed_ref[:] = jnp.zeros_like(packed_ref)


@functools.partial(jax.jit, static_argnames=('bn', 'bm', 'interpret'))
def csp_mlp_mm1(x: jnp.ndarray, w1t: jnp.ndarray, b1: jnp.ndarray,
                act_cache: jnp.ndarray,
                inds: jnp.ndarray, counts: jnp.ndarray,
                bn: int = 128, bm: int = DEFAULT_BM,
                interpret: bool = False,
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage-1 sparse MLP.

    x: [T, C]; w1t: [N, C] (fc1 weight, output-major) — a plain array or a
    utils.quant.QTensor (fp8/int8 + per-row scale; the gathered block is
    converted in-kernel and the scale folded into the fp32 accumulator);
    b1: [N]; act_cache: [T, N] (bf16 or fp8 — fp8 halves the dominant
    chipmunk cache, see utils/quant.py); inds: int32 [M, jmax] neuron-block
    ids; counts: int32 [M];  M = T // bm.
    Returns (packed [T, jmax*bn] delta, new act_cache [T, N]).
    act_cache is donated/aliased into the new cache.
    """
    from ..utils.quant import QTensor
    _check_kernel_weight(w1t, 'csp_mlp_mm1')
    T, C = x.shape
    wq = isinstance(w1t, QTensor)
    w4 = wq and w1t.pack_axis is not None
    if wq:
        assert not w4 or w1t.pack_axis in (-1, 1), w1t.pack_axis
        w1q, w1s = w1t.q, w1t.scale
    else:
        w1q, w1s = w1t, None
    N = w1q.shape[0]
    wC = C // 2 if w4 else C          # stored (packed) contraction width
    assert T % bm == 0 and N % bn == 0
    M, jmax = inds.shape
    assert M == T // bm, (M, T, bm)
    counts = jnp.clip(counts, 1, jmax).astype(jnp.int32)
    inds = pad_block_indices(inds, counts).astype(jnp.int32)
    b1r = b1.reshape(N // bn, 1, bn)
    extra_in, extra_specs = (), ()
    if wq:
        extra_in = (w1s.astype(jnp.float32).reshape(N // bn, 1, bn),)
        extra_specs = (pl.BlockSpec((1, 1, bn),
                                    lambda m, j, I, c: (I[m, j], 0, 0)),)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(M, jmax),
        in_specs=[
            pl.BlockSpec((bm, C), lambda m, j, I, c: (m, 0)),
            pl.BlockSpec((bn, wC), lambda m, j, I, c: (I[m, j], 0)),
            *extra_specs,
            pl.BlockSpec((1, 1, bn), lambda m, j, I, c: (I[m, j], 0, 0)),
            pl.BlockSpec((bm, bn), lambda m, j, I, c: (m, I[m, j])),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda m, j, I, c: (m, j)),
            pl.BlockSpec((bm, bn), lambda m, j, I, c: (m, I[m, j])),
        ],
    )
    packed, new_cache = pl.pallas_call(
        functools.partial(_mm1_kernel, wq=wq, w4=w4),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, jmax * bn), x.dtype),
            jax.ShapeDtypeStruct((T, N), act_cache.dtype),
        ],
        # alias act_cache (last input) into the refreshed cache output
        input_output_aliases={5 + len(extra_in): 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(inds, counts, x, w1q, *extra_in, b1r, act_cache)
    return packed, new_cache


def _mm2_kernel(inds_ref, counts_ref,
                *refs, wq: bool = False, w4: bool = False):
    if wq:
        packed_ref, w2_ref, ws_ref, outin_ref, out_ref, acc_ref = refs
    else:
        ws_ref = None
        packed_ref, w2_ref, outin_ref, out_ref, acc_ref = refs
    m, co, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nj = pl.num_programs(2)
    valid = j < counts_ref[m]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = outin_ref[:].astype(jnp.float32)

    @pl.when(valid)
    def _():
        a = packed_ref[:]
        w = w2_ref[:]
        if w4:
            # plane-split: the packed planes hold output cols [0, Cout/2)
            # and [Cout/2, Cout) — accumulate each into its half of acc
            a = a * ws_ref[0].astype(a.dtype)
            lo, hi = _dq4_planes(w, a.dtype)
            h = lo.shape[1]
            acc_ref[:, :h] += jax.lax.dot_general(
                a, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[:, h:] += jax.lax.dot_general(
                a, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            if wq:
                # per-N-row scale folded into the packed operand ([bm,bn]
                # multiply, cheaper than dequantizing the [bn,cb] block)
                a = a * ws_ref[0].astype(a.dtype)
                w = w.astype(a.dtype)
            acc_ref[:] += jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('bn', 'bm', 'interpret'))
def csp_mlp_mm2(packed: jnp.ndarray, w2: jnp.ndarray, out_cache: jnp.ndarray,
                inds: jnp.ndarray, counts: jnp.ndarray,
                bn: int = 128, bm: int = DEFAULT_BM,
                interpret: bool = False) -> jnp.ndarray:
    """Stage-2 sparse MLP: out_cache += packed @ w2[selected rows].

    packed: [T, jmax*bn]; w2: [N, Cout] — plain array or QTensor (fp8/int8
    + per-N-row scale); out_cache: [T, Cout] (donated).  The output dim is
    blocked (MM2_COUT_BLOCK) so the fp32 accumulator fits VMEM at large bm.
    Returns the updated out_cache.
    """
    from ..utils.quant import QTensor
    _check_kernel_weight(w2, 'csp_mlp_mm2')
    T, _ = packed.shape
    wq = isinstance(w2, QTensor)
    w4 = wq and w2.pack_axis is not None
    if wq:
        assert not w4 or w2.pack_axis in (-1, 1), w2.pack_axis
        w2q, w2s = w2.q, w2.scale
    else:
        w2q, w2s = w2, None
    N = w2q.shape[0]
    Cout = w2q.shape[1] * (2 if w4 else 1)
    M, jmax = inds.shape
    assert M == T // bm
    counts = jnp.clip(counts, 1, jmax).astype(jnp.int32)
    inds = pad_block_indices(inds, counts).astype(jnp.int32)
    # int4 plane-packing interleaves output columns (stored col i = orig
    # cols i and i + Cout/2), so the output dim can't be blocked -> one
    # whole-Cout block (acc [bm, Cout] fp32 stays small at MLP Cout)
    cb = Cout if w4 else min(MM2_COUT_BLOCK, Cout)
    assert Cout % cb == 0
    wcb = cb // 2 if w4 else cb
    extra_in, extra_specs = (), ()
    if wq:
        extra_in = (w2s.astype(jnp.float32).reshape(N // bn, 1, bn),)
        extra_specs = (pl.BlockSpec((1, 1, bn),
                                    lambda m, co, j, I, c: (I[m, j], 0, 0)),)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(M, Cout // cb, jmax),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda m, co, j, I, c: (m, j)),
            pl.BlockSpec((bn, wcb), lambda m, co, j, I, c: (I[m, j], co)),
            *extra_specs,
            pl.BlockSpec((bm, cb), lambda m, co, j, I, c: (m, co)),
        ],
        out_specs=pl.BlockSpec((bm, cb), lambda m, co, j, I, c: (m, co)),
        scratch_shapes=[pltpu.VMEM((bm, cb), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_mm2_kernel, wq=wq, w4=w4),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, Cout), out_cache.dtype),
        input_output_aliases={4 + len(extra_in): 0},  # out_cache -> out
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(inds, counts, packed, w2q, *extra_in, out_cache)
    return out


def _fused_kernel(inds_ref, counts_ref,          # scalar prefetch (SMEM)
                  *refs, wq: bool = False, nj: int = 0,
                  w4: bool = False, a8: bool = False):
    """mm1 + mm2 in one pass: the packed delta lives only in registers/
    VMEM — never written to HBM (the reference pays a packed round-trip
    between its two kernels and fights the launch gap with a CUDA-graph
    SM split, csp_mlp_mm2_and_scatter_add.cu:96-259; fusing is the TPU
    answer to both).

    ``a8``: dynamically quantize the activations to int8 per token row and
    run both matmuls int8 x int8 -> int32 on the MXU — v5e executes int8
    matmul at ~1.7x the bf16 rate (scripts/bench_int8_mxu.py), the TPU
    analogue of the reference's fp8 Triton mm1 (triton/csp_mlp_mm1.py;
    the reference quantizes mm1's input with a calibrated scale — here the
    scale is exact per-row).  x is quantized once per token block (j==0,
    scratch); the mm2 operand (the activation delta) is quantized per
    neuron-block step with fc2's per-row scale pre-folded so the int32
    accumulator dequantizes with one per-token scalar.  Requires int8 or
    int4-packed weights."""
    if a8:
        *refs, x8_ref, sx_ref = refs
    else:
        x8_ref = sx_ref = None
    if wq:
        (x_ref, w1t_ref, w1s_ref, b1_ref, w2_ref, w2s_ref, cache_ref,
         outin_ref, out_ref, newcache_ref, acc_ref) = refs
    else:
        w1s_ref = w2s_ref = None
        (x_ref, w1t_ref, b1_ref, w2_ref, cache_ref,
         outin_ref, out_ref, newcache_ref, acc_ref) = refs
    m, j = pl.program_id(0), pl.program_id(1)
    valid = j < counts_ref[m]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = outin_ref[:].astype(jnp.float32)
        if a8:
            xf = x_ref[:].astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                             1e-6) * (1.0 / 127.0)
            sx_ref[:] = sx
            x8_ref[:] = jnp.clip(jnp.round(xf / sx), -127, 127
                                 ).astype(jnp.int8)

    x = x_ref[:]                                  # [BM, C]
    w1 = w1t_ref[:]                               # [bn, C] (or [bn, C/2])
    if a8:
        x8 = x8_ref[:]
        if w4:
            # int4 planes dequantize to int8 exactly ([-8, 7] nibbles) —
            # the plane matmuls stay on the MXU int8 path
            lo, hi = _dq4_planes(w1, jnp.int8)
            h = x8.shape[1] // 2
            mid = (jax.lax.dot_general(
                       x8[:, :h], lo, (((1,), (1,)), ((), ())),
                       preferred_element_type=jnp.int32)
                   + jax.lax.dot_general(
                       x8[:, h:], hi, (((1,), (1,)), ((), ())),
                       preferred_element_type=jnp.int32))
        else:
            mid = jax.lax.dot_general(x8, w1, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
        mid = mid.astype(jnp.float32) * (sx_ref[:] * w1s_ref[0])
    elif w4:
        lo, hi = _dq4_planes(w1, x.dtype)
        h = x.shape[1] // 2
        mid = (jax.lax.dot_general(x[:, :h], lo, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(x[:, h:], hi, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32))
        mid = mid * w1s_ref[0]
    else:
        if wq:
            w1 = w1.astype(x.dtype)
        mid = jax.lax.dot_general(x, w1, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if wq:
            mid = mid * w1s_ref[0]
    mid = mid + b1_ref[0].astype(jnp.float32)
    act = jax.nn.gelu(mid, approximate=True).astype(cache_ref.dtype)

    @pl.when(valid)
    def _():
        delta_f = (act.astype(jnp.float32)
                   - cache_ref[:].astype(jnp.float32))
        newcache_ref[:] = act
        w2 = w2_ref[:]
        if a8:
            # fold fc2's per-contraction-row scale into the delta, then
            # quantize per token row: acc dequant is one [bm,1] multiply
            ds = delta_f * w2s_ref[0]
            sd = jnp.maximum(jnp.max(jnp.abs(ds), axis=1, keepdims=True),
                             1e-12) * (1.0 / 127.0)
            d8 = jnp.clip(jnp.round(ds / sd), -127, 127).astype(jnp.int8)
            if w4:
                lo, hi = _dq4_planes(w2, jnp.int8)
                h = lo.shape[1]
                acc_ref[:, :h] += jax.lax.dot_general(
                    d8, lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32) \
                    * sd
                acc_ref[:, h:] += jax.lax.dot_general(
                    d8, hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32) \
                    * sd
            else:
                acc_ref[:] += jax.lax.dot_general(
                    d8, w2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32) \
                    * sd
        elif w4:
            delta = delta_f.astype(x.dtype) * w2s_ref[0].astype(x.dtype)
            lo, hi = _dq4_planes(w2, delta.dtype)
            h = lo.shape[1]
            acc_ref[:, :h] += jax.lax.dot_general(
                delta, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[:, h:] += jax.lax.dot_general(
                delta, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            delta = delta_f.astype(x.dtype)
            if wq:
                delta = delta * w2s_ref[0].astype(delta.dtype)
                w2 = w2.astype(delta.dtype)
            acc_ref[:] += jax.lax.dot_general(
                delta, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('bn', 'bm', 'interpret', 'a8'))
def csp_mlp_fused(x: jnp.ndarray, w1t, b1: jnp.ndarray, w2,
                  act_cache: jnp.ndarray, out_cache: jnp.ndarray,
                  inds: jnp.ndarray, counts: jnp.ndarray,
                  bn: int = 128, bm: int = DEFAULT_BM,
                  interpret: bool = False, a8: bool = False,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-kernel sparse MLP step: per token block, loop the selected
    neuron blocks — gather fc1 rows, recompute activations, delta vs
    cache (refreshing it in place), and accumulate delta @ fc2 rows into
    the donated out_cache, all in VMEM.  w1t/w2 may be QTensors.
    ``a8`` runs the matmuls on the MXU's 2x-rate int8 path with per-row
    dynamically quantized activations (requires int8/int4 weights; the TPU
    analogue of the reference's fp8 mm1, see _fused_kernel).
    Returns (new_out_cache, new_act_cache)."""
    from ..utils.quant import QTensor
    _check_kernel_weight(w1t, 'csp_mlp_fused')
    _check_kernel_weight(w2, 'csp_mlp_fused')
    T, C = x.shape
    wq = isinstance(w1t, QTensor)
    assert wq == isinstance(w2, QTensor), "quantize both or neither"
    w4 = wq and w1t.pack_axis is not None
    if a8:
        assert wq and (w4 or (w1t.q.dtype == jnp.int8
                              and w2.q.dtype == jnp.int8)), \
            "a8 needs int8 or int4-packed weights (got %s)" % (
                w1t.q.dtype if wq else type(w1t).__name__)
    if wq:
        assert (w1t.pack_axis is None) == (w2.pack_axis is None), \
            "int4-pack both or neither"
        w1q, w1s, w2q, w2s = w1t.q, w1t.scale, w2.q, w2.scale
    else:
        w1q, w2q = w1t, w2
    N = w1q.shape[0]
    Cout = w2q.shape[1] * (2 if w4 else 1)
    wC = C // 2 if w4 else C
    assert T % bm == 0 and N % bn == 0
    M, jmax = inds.shape
    assert M == T // bm, (M, T, bm)
    counts = jnp.clip(counts, 1, jmax).astype(jnp.int32)
    inds = pad_block_indices(inds, counts).astype(jnp.int32)
    b1r = b1.reshape(N // bn, 1, bn)
    ins = [x, w1q]
    in_specs = [
        pl.BlockSpec((bm, C), lambda m, j, I, c: (m, 0)),
        pl.BlockSpec((bn, wC), lambda m, j, I, c: (I[m, j], 0)),
    ]
    if wq:
        ins.append(w1s.astype(jnp.float32).reshape(N // bn, 1, bn))
        in_specs.append(pl.BlockSpec((1, 1, bn),
                                     lambda m, j, I, c: (I[m, j], 0, 0)))
    ins += [b1r, w2q]
    in_specs += [
        pl.BlockSpec((1, 1, bn), lambda m, j, I, c: (I[m, j], 0, 0)),
        pl.BlockSpec((bn, Cout // 2 if w4 else Cout),
                     lambda m, j, I, c: (I[m, j], 0)),
    ]
    if wq:
        ins.append(w2s.astype(jnp.float32).reshape(N // bn, 1, bn))
        in_specs.append(pl.BlockSpec((1, 1, bn),
                                     lambda m, j, I, c: (I[m, j], 0, 0)))
    ins += [act_cache, out_cache]
    in_specs += [
        pl.BlockSpec((bm, bn), lambda m, j, I, c: (m, I[m, j])),
        pl.BlockSpec((bm, Cout), lambda m, j, I, c: (m, 0)),
    ]
    n_in = len(ins)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(M, jmax),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bm, Cout), lambda m, j, I, c: (m, 0)),
            pl.BlockSpec((bm, bn), lambda m, j, I, c: (m, I[m, j])),
        ],
        scratch_shapes=[pltpu.VMEM((bm, Cout), jnp.float32)]
        + ([pltpu.VMEM((bm, C), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32)] if a8 else []),
    )
    new_out, new_cache = pl.pallas_call(
        functools.partial(_fused_kernel, wq=wq, nj=jmax, w4=w4, a8=a8),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, Cout), out_cache.dtype),
            jax.ShapeDtypeStruct((T, N), act_cache.dtype),
        ],
        # out_cache -> new_out, act_cache -> new_cache (offsets skip the
        # two scalar-prefetch operands)
        input_output_aliases={n_in + 1: 0, n_in: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(inds, counts, *ins)
    return new_out, new_cache


def csp_mlp(x: jnp.ndarray, w1t: jnp.ndarray, b1: jnp.ndarray,
            w2: jnp.ndarray, act_cache: jnp.ndarray, out_cache: jnp.ndarray,
            inds: jnp.ndarray, counts: jnp.ndarray,
            bn: int = 128, bm: int = DEFAULT_BM,
            fused: bool = True,   # single-kernel path (csp_mlp_fused)
            interpret: bool = False, a8: bool = False,
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full sparse MLP step (reference ops/mlp.py run_e2e:63-92).
    Returns (new_out_cache, new_act_cache)."""
    if fused:
        return csp_mlp_fused(x, w1t, b1, w2, act_cache, out_cache,
                             inds, counts, bn=bn, bm=bm,
                             interpret=interpret, a8=a8)
    assert not a8, "int8 activations are implemented on the fused path"
    packed, new_cache = csp_mlp_mm1(x, w1t, b1, act_cache, inds, counts,
                                    bn=bn, bm=bm, interpret=interpret)
    new_out = csp_mlp_mm2(packed, w2, out_cache, inds, counts,
                          bn=bn, bm=bm, interpret=interpret)
    return new_out, new_cache
