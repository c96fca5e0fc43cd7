"""Quantized weight residency: fp8 / int8 / int4 storage with per-channel
scales and dequantize-at-use.

Why this exists (TPU-first rationale, not in the reference): the reference
runs FLUX-12B on an 80GB H100 with bf16 weights; a single TPU v5e chip has
~16GB HBM, so full-depth models fit only with quantized weight storage.
XLA fuses the `astype(bf16) * scale` dequant into the consuming matmul (we
measured 69.3 vs 70.6 TFLOP/s for dequant-int8 vs pure bf16), so quantized
residency costs ~nothing in throughput while halving/quartering weight HBM.

Relationship to the reference's fp8 (src/chipmunk/modules/mlp_fp8.py):
the reference quantizes weights e4m3 AND computes the matmul in fp8 via
torch._scaled_mm for Hopper fp8-tensor-core speed (mlp_fp8.py:247-270).
TPU v5e has no fp8 MXU (fp8 matmuls upcast, measured iso-speed with bf16),
so here fp8 serves memory capacity/bandwidth: weights stored fp8, matmul
bf16.  The calibrated-input-scale machinery lives in modules/mlp_fp8.py.

Formats:
  * fp8:  q float8_e4m3fn, original shape.
  * int8: q int8, original shape.
  * int4: q uint8 **plane-packed along ``pack_axis``**: position r holds
    the low nibbles of original position r and the high nibbles of position
    r + n//2 along that axis, so dequant is two shifts + one concat (no
    lane interleave, which TPU layouts hate).  Stored offset-binary (+8).

Scales are per-output-channel absmax, shaped to broadcast against the
ORIGINAL (unpacked) array, fp32.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from .offload import chunked_device_put

F8 = jnp.float8_e4m3fn
F8_MAX = 448.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QTensor:
    """Quantized array + broadcastable scale.  ``pack_axis`` (static
    metadata) is the int4 plane-packing axis, -1 if unpacked; stacking
    (lax.scan over layers), sharding, and donation work unchanged."""
    q: jnp.ndarray
    scale: jnp.ndarray
    # NEGATIVE axis (or None): negative indexing survives lax.scan's
    # leading-axis slicing of stacked [L, ...] params
    pack_axis: Optional[int] = dataclasses.field(
        default=None, metadata=dict(static=True))


def _absmax(w: jnp.ndarray, keep_axes) -> jnp.ndarray:
    red = tuple(i for i in range(w.ndim) if i not in keep_axes)
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=red, keepdims=True)
    return jnp.maximum(a, 1e-8)


def quantize(w: jnp.ndarray, kind: str, keep_axes,
             pack_axis: Optional[int] = None) -> QTensor:
    """kind: 'fp8' | 'int8' | 'int4'.  keep_axes: axes the per-channel
    scale varies over — the output-channel axis, plus the leading stack
    axis for stacked [L, ...] params (scan slices both q and scale).
    int4 requires ``pack_axis`` (even length, not in keep_axes)."""
    if isinstance(keep_axes, int):
        keep_axes = (keep_axes,)
    keep_axes = tuple(a % w.ndim for a in keep_axes)
    wf = w.astype(jnp.float32)
    amax = _absmax(w, keep_axes)
    if kind == 'fp8':
        scale = amax / F8_MAX
        q = (wf / scale).astype(F8)
        pack_axis = None
    elif kind == 'int8':
        scale = amax / 127.0
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        pack_axis = None
    elif kind == 'int4':
        assert pack_axis is not None and pack_axis % w.ndim not in keep_axes
        assert w.shape[pack_axis] % 2 == 0, (w.shape, pack_axis)
        scale = amax / 7.0
        q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int32) + 8
        half = w.shape[pack_axis] // 2
        lo = jax.lax.slice_in_dim(q, 0, half, axis=pack_axis % w.ndim)
        hi = jax.lax.slice_in_dim(q, half, 2 * half, axis=pack_axis % w.ndim)
        q = (lo | (hi << 4)).astype(jnp.uint8)
        pack_axis = pack_axis - w.ndim if pack_axis >= 0 else pack_axis
    else:
        raise ValueError(kind)
    return QTensor(q=q, scale=scale.astype(jnp.float32),
                   pack_axis=pack_axis)


def dequant(w: Union[jnp.ndarray, QTensor, Any],
            dtype=jnp.bfloat16) -> jnp.ndarray:
    """QTensor -> dense array (XLA fuses this into the consuming matmul);
    plain arrays pass through."""
    if not isinstance(w, QTensor):
        return w
    q = w.q
    if w.pack_axis is not None:       # int4 plane-packed
        lo = (q & 0xF).astype(jnp.int8) - 8
        hi = (q >> 4).astype(jnp.int8) - 8
        q = jnp.concatenate([lo, hi], axis=w.pack_axis)
    return q.astype(dtype) * w.scale.astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, QTensor)


# --------------------------------------------------------------- model spec

class QuantSpec(NamedTuple):
    """Per-category storage dtypes for quantize_flux_params.  None = keep.

    attn:       qkv / proj / o_proj linears
    mod:        adaLN modulation linears
    mlp_sparse: weights read by the csp_mlp kernels (fp8/int8/int4 —
                int4 is plane-packed along the contraction axis and
                dequantized in-kernel, halving gather traffic)
    mlp_dense:  dense-path MLP weights (double-block txt MLP)
    """
    attn: Optional[str] = 'fp8'
    mod: Optional[str] = 'fp8'
    mlp_sparse: Optional[str] = 'fp8'
    mlp_dense: Optional[str] = 'fp8'


def quantize_flux_params(params, spec: QuantSpec = QuantSpec()):
    """Quantize a (stacked, [L, ...]) FLUX param pytree; returns a new tree.
    Embedders / norms / biases / final layer stay in model dtype (small).

    Reference parity: quantize_fp8 swaps every nn.Linear except modulation
    and the sparse img_mlp fc2 (mlp_fp8.py:294-349); here the sparse-path
    fc1 AND fc2 are kernel-dequantized so both can be stored quantized, and
    modulation quantization is a spec choice (default on — per-channel
    scales keep adaLN accurate enough; set mod=None for strict parity).
    """
    assert spec.mlp_sparse in (None, 'fp8', 'int8', 'int4'), spec.mlp_sparse

    def qlin(p, kind):
        if kind is None:
            return p
        out = dict(p)
        w = p['w']                     # [L, in, out] (or [in, out])
        keep = (0, w.ndim - 1) if w.ndim == 3 else (w.ndim - 1,)
        out['w'] = quantize(w, kind, keep_axes=keep,
                            pack_axis=w.ndim - 2 if kind == 'int4' else None)
        return out

    def qraw(w, kind):                 # [L, N, C] output-major (or [N, C])
        if kind is None:
            return w
        keep = (0, 1) if w.ndim == 3 else (0,)
        return quantize(w, kind, keep_axes=keep,
                        pack_axis=w.ndim - 1 if kind == 'int4' else None)

    p = dict(params)
    dbl = dict(p['double'])
    for k in ('img_qkv', 'txt_qkv', 'img_proj', 'txt_proj'):
        dbl[k] = qlin(dbl[k], spec.attn)
    for k in ('img_mod', 'txt_mod'):
        dbl[k] = qlin(dbl[k], spec.mod)
    for k in ('img_w1t', 'img_w2'):
        dbl[k] = qraw(dbl[k], spec.mlp_sparse)
    for k in ('txt_w1t', 'txt_w2'):
        dbl[k] = qraw(dbl[k], spec.mlp_dense)
    p['double'] = dbl
    sgl = dict(p['single'])
    for k in ('qkv', 'o_proj'):
        sgl[k] = qlin(sgl[k], spec.attn)
    sgl['mod'] = qlin(sgl['mod'], spec.mod)
    for k in ('w1t', 'w2'):
        sgl[k] = qraw(sgl[k], spec.mlp_sparse)
    p['single'] = sgl
    return p


def param_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))


# ------------------------------------------------- host-side quantization

def quantize_host(w, kind: str, keep_axes, pack_axis=None) -> QTensor:
    """Numpy-side quantize (same formats as quantize()) for weights that
    originate on the HOST (safetensors loads, synthetic benches).

    Why host-side: on the v5e tunnel, running large device-side
    init/transform programs degrades the allocator such that later big
    model programs fail with opaque RESOURCE_EXHAUSTED even when their
    declared footprint fits.  Quantizing in numpy and device_put-ing only
    the final arrays keeps the device heap pristine."""
    import numpy as np
    import ml_dtypes
    if isinstance(keep_axes, int):
        keep_axes = (keep_axes,)
    keep_axes = tuple(a % w.ndim for a in keep_axes)
    wf = np.asarray(w, np.float32)
    # hot path: [rows, cols] with per-row scales -> the native
    # multithreaded quantizers (csrc/chipmunk_host.cpp; bit-exact with
    # the numpy path below, parity-tested in tests/test_native.py)
    if (wf.ndim == 2 and keep_axes == (0,)
            and (kind != 'int4' or pack_axis in (1, -1))):
        from .native import quantize_rows_native
        res = quantize_rows_native(wf, kind)
        if res is not None:
            q, scale = res
            return QTensor(q=jax.device_put(q),
                           scale=jax.device_put(scale[:, None]),
                           pack_axis=(-1 if kind == 'int4' else None))
    red = tuple(i for i in range(w.ndim) if i not in keep_axes)
    amax = np.maximum(np.abs(wf).max(axis=red, keepdims=True), 1e-8)
    if kind == 'fp8':
        scale = amax / F8_MAX
        q = (wf / scale).astype(ml_dtypes.float8_e4m3fn)
        pack_axis = None
    elif kind == 'int8':
        scale = amax / 127.0
        q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
        pack_axis = None
    elif kind == 'int4':
        assert pack_axis is not None and pack_axis % w.ndim not in keep_axes
        assert w.shape[pack_axis] % 2 == 0
        scale = amax / 7.0
        qi = (np.clip(np.round(wf / scale), -8, 7).astype(np.int32) + 8)
        half = w.shape[pack_axis] // 2
        sl = [slice(None)] * w.ndim
        sl[pack_axis] = slice(0, half)
        lo = qi[tuple(sl)]
        sl[pack_axis] = slice(half, 2 * half)
        hi = qi[tuple(sl)]
        q = (lo | (hi << 4)).astype(np.uint8)
        pack_axis = pack_axis - w.ndim if pack_axis >= 0 else pack_axis
    else:
        raise ValueError(kind)
    return QTensor(q=jax.device_put(q),
                   scale=jax.device_put(scale.astype(np.float32)),
                   pack_axis=pack_axis)


def synth_quantized_params(seed: int, shapes,
                           spec: QuantSpec = QuantSpec(
                               attn='int4', mod='int4',
                               mlp_sparse='int8', mlp_dense='int4')):
    """Synthesize a quantized param tree DIRECTLY on the host from a
    jax.eval_shape tree (random bytes in the quantized representations;
    scales set to fan-in-normalized constants) and device_put the
    results.  For speed benches with random weights this is
    exact-cost-equivalent to quantizing real weights, without ever
    materializing bf16 params on device (see quantize_host docstring
    for why that matters).  Works for any tree with FLUX-style block
    naming ('double'/'single' subtrees; extra subtrees like hunyuan's
    refiner stay unquantized bf16)."""
    import numpy as np
    import ml_dtypes
    rng = np.random.default_rng(seed)

    def fp8_qt(shape, fan_in, scale_axes):
        b = rng.integers(0, 0x3F, size=shape, dtype=np.uint8)
        sign = rng.integers(0, 2, size=shape, dtype=np.uint8) << 7
        q = (b | sign).view(ml_dtypes.float8_e4m3fn)
        ss = [1] * len(shape)
        for a in scale_axes:
            ss[a] = shape[a]
        scale = np.full(ss, fan_in ** -0.5 / 4.0, np.float32)
        return QTensor(q=chunked_device_put(q),
                       scale=jax.device_put(scale), pack_axis=None)

    def int4_qt(shape, fan_in, pack_axis, scale_axes):
        ps = list(shape)
        ps[pack_axis] //= 2
        q = rng.integers(0, 255, size=ps, dtype=np.uint8)
        ss = [1] * len(shape)
        for a in scale_axes:
            ss[a] = shape[a]
        scale = np.full(ss, fan_in ** -0.5 / 7.0, np.float32)
        return QTensor(q=chunked_device_put(q),
                       scale=jax.device_put(scale),
                       pack_axis=pack_axis - len(shape))

    def int8_qt(shape, fan_in, scale_axes):
        # uint8 draw + view: no x8 int64 intermediate for multi-GB leaves
        q = (rng.integers(0, 255, size=shape, dtype=np.uint8)
             .view(np.int8) + np.int8(0))
        np.clip(q, -127, 127, out=q)
        ss = [1] * len(shape)
        for a in scale_axes:
            ss[a] = shape[a]
        scale = np.full(ss, fan_in ** -0.5 / 127.0, np.float32)
        return QTensor(q=chunked_device_put(q),
                       scale=jax.device_put(scale), pack_axis=None)

    def qt(shape, fan_in, kind, pack_axis, scale_axes):
        if kind == 'int4':
            return int4_qt(shape, fan_in, pack_axis, scale_axes)
        if kind == 'int8':
            return int8_qt(shape, fan_in, scale_axes)
        return fp8_qt(shape, fan_in, scale_axes)

    def leaf(path, sd):
        names = [str(getattr(p, 'key', p)) for p in path]
        name = names[-1]
        shape, dtype = sd.shape, sd.dtype
        in_blocks = any("'double'" in n or "'single'" in n
                        or n in ('double', 'single') for n in names)
        is_lin_w = name.strip("'") == 'w' and len(shape) >= 2
        base = name.strip("'")
        is_raw = base.endswith(('w1t', 'w2')) and len(shape) >= 2
        if in_blocks and is_lin_w and (spec.attn or spec.mod):
            # [L, in, out]: pack along in; scale per (L, out)
            mod_like = 'mod' in ''.join(names)
            kind = spec.mod if mod_like else spec.attn
            if kind:
                return qt(shape, shape[-2], kind, len(shape) - 2,
                          ([0, len(shape) - 1] if len(shape) == 3
                           else [len(shape) - 1]))
        if in_blocks and is_raw:
            kind = spec.mlp_dense if base.startswith('txt_') else \
                spec.mlp_sparse
            if kind:
                # [L, N, C]: pack along C; scale per (L, N)
                return qt(shape, shape[-1], kind, len(shape) - 1,
                          ([0, 1] if len(shape) == 3 else [0]))
        arr = (rng.standard_normal(shape) * 0.02).astype(
            ml_dtypes.bfloat16 if dtype == jnp.bfloat16
            else np.dtype(dtype))
        return chunked_device_put(arr)

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def synth_quantized_flux_params(seed: int, model,
                                spec: QuantSpec = QuantSpec(
                                    attn='int4', mod='int4',
                                    mlp_sparse='int8', mlp_dense='int4')):
    from ..models import init_flux_params
    shapes = jax.eval_shape(lambda k: init_flux_params(k, model),
                            jax.random.PRNGKey(0))
    return synth_quantized_params(seed, shapes, spec)
