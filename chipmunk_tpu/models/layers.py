"""Shared DiT building blocks (functional, param-dict based).

These mirror the layer inventory of the reference's vendored FLUX repo
(examples/flux/src/flux/modules/layers.py) rebuilt as pure functions:
timestep embedding, MLPEmbedder, RMS QKNorm, adaLN modulation.
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..utils.quant import dequant


def linear(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ dequant(p['w'], x.dtype)
    if 'b' in p:
        y = y + p['b'].astype(y.dtype)
    return y


def init_linear(key, d_in, d_out, dtype, bias=True, scale=None) -> Dict:
    scale = scale if scale is not None else d_in ** -0.5
    p = {'w': (jax.random.normal(key, (d_in, d_out)) * scale).astype(dtype)}
    if bias:
        p['b'] = jnp.zeros((d_out,), dtype)
    return p


def layernorm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Non-affine LayerNorm (elementwise_affine=False in the reference)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def rmsnorm(x: jnp.ndarray, scale: jnp.ndarray,
            eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    n = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * n).astype(x.dtype) * scale.astype(x.dtype)


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0,
                       time_factor: float = 1000.0) -> jnp.ndarray:
    """Sinusoidal embedding (reference flux math: t scaled by 1000)."""
    t = t * time_factor
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def mlp_embedder(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return linear(p['out'], jax.nn.silu(linear(p['in'], x)))


def init_mlp_embedder(key, d_in, d_hidden, dtype) -> Dict:
    k1, k2 = jax.random.split(key)
    return {'in': init_linear(k1, d_in, d_hidden, dtype),
            'out': init_linear(k2, d_hidden, d_hidden, dtype)}


def modulation(p: Dict, vec: jnp.ndarray, n_sets: int) -> Tuple:
    """adaLN modulation: silu(vec) -> linear -> n_sets x (shift, scale, gate).
    Returns tuple of (shift, scale, gate) triples, each [B, 1, C]."""
    out = linear(p, jax.nn.silu(vec))[:, None, :]
    parts = jnp.split(out, 3 * n_sets, axis=-1)
    return tuple(tuple(parts[3 * i:3 * i + 3]) for i in range(n_sets))


# ------------------------------------------------------------------- RoPE

def rope_angles(pos: jnp.ndarray, dim: int, theta: float) -> jnp.ndarray:
    """pos [..., n] -> angles [..., n, dim//2]."""
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta ** scale)
    return pos.astype(jnp.float32)[..., None] * omega


def build_rope(ids: jnp.ndarray, axes_dim, theta: float
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ids: [B, S, n_axes] integer positions.  Returns (cos, sin) each
    [B, 1, S, D//2] (broadcast over heads)."""
    angs = [rope_angles(ids[..., i], d, theta)
            for i, d in enumerate(axes_dim)]
    ang = jnp.concatenate(angs, axis=-1)          # [B, S, D//2]
    return (jnp.cos(ang)[:, None], jnp.sin(ang)[:, None])


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
               ) -> jnp.ndarray:
    """x: [B, H, S, D] with D//2 rotation pairs in interleaved layout
    (reference flux math.py:24-29 rotates (x[2i], x[2i+1]) pairs)."""
    xf = x.astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape).astype(x.dtype)
