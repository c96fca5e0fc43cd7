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
    mlp_sparse: weights read by the csp_mlp kernels (fp8/int8 only — the
                gather path needs same-shape blocks, so no int4 packing)
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
    assert spec.mlp_sparse in (None, 'fp8', 'int8'), spec.mlp_sparse

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
