"""FLUX autoencoder (decode path) in pure JAX.

Re-implements the reference's vendored BFL AutoEncoder decoder
(examples/flux/src/flux/modules/autoencoder.py) so generations end in
pixels, not latents: z [B, 16, H/8, W/8] -> image [B, 3, H, W].
Weight keys match the BFL safetensors layout (decoder.*), loaded host-side
via models/loaders.py.

Architecture (BFL ae params): ch=128, ch_mult=(1,2,4,4), 2 res blocks per
level (+1 in the decoder), z_channels=16, GroupNorm(32)+swish, one
single-head spatial attention block at the bottleneck, nearest-neighbor
2x upsampling, scale_factor=0.3611 / shift_factor=0.1159.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SCALE_FACTOR = 0.3611
SHIFT_FACTOR = 0.1159


def _conv(p: Dict, x: jnp.ndarray, stride: int = 1,
          padding: int = 1) -> jnp.ndarray:
    """NCHW conv with OIHW weights (torch layout in the safetensors)."""
    y = jax.lax.conv_general_dilated(
        x, p['weight'].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return y + p['bias'].astype(x.dtype)[None, :, None, None]


def _group_norm(p: Dict, x: jnp.ndarray, groups: int = 32,
                eps: float = 1e-6) -> jnp.ndarray:
    B, C, H, W = x.shape
    xf = x.astype(jnp.float32).reshape(B, groups, C // groups, H, W)
    mu = xf.mean(axis=(2, 3, 4), keepdims=True)
    var = xf.var(axis=(2, 3, 4), keepdims=True)
    xf = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(B, C, H, W)
    return (xf * p['weight'].astype(jnp.float32)[None, :, None, None]
            + p['bias'].astype(jnp.float32)[None, :, None, None]
            ).astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def _resnet(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    h = _conv(p['conv1'], _swish(_group_norm(p['norm1'], x)))
    h = _conv(p['conv2'], _swish(_group_norm(p['norm2'], h)))
    if 'nin_shortcut' in p:
        x = _conv(p['nin_shortcut'], x, padding=0)
    return x + h


def _attn(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    B, C, H, W = x.shape
    h = _group_norm(p['norm'], x)
    q = _conv(p['q'], h, padding=0).reshape(B, C, H * W)
    k = _conv(p['k'], h, padding=0).reshape(B, C, H * W)
    v = _conv(p['v'], h, padding=0).reshape(B, C, H * W)
    s = jnp.einsum('bci,bcj->bij', q.astype(jnp.float32),
                   k.astype(jnp.float32)) * C ** -0.5
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum('bij,bcj->bci', a, v.astype(jnp.float32))
    o = o.reshape(B, C, H, W).astype(x.dtype)
    return x + _conv(p['proj_out'], o, padding=0)


def _upsample(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    B, C, H, W = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return _conv(p['conv'], x)


@dataclass(frozen=True)
class AutoEncoderParams:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16


def decode(params: Dict, z: jnp.ndarray,
           cfg: AutoEncoderParams = AutoEncoderParams()) -> jnp.ndarray:
    """z [B, z_ch, h, w] (pre-scaled latents) -> image [B, 3, 8h, 8w]
    in [-1, 1] (reference autoencoder.py Decoder.forward)."""
    z = z / SCALE_FACTOR + SHIFT_FACTOR
    d = params['decoder']
    h = _conv(d['conv_in'], z)
    h = _resnet(d['mid']['block_1'], h)
    h = _attn(d['mid']['attn_1'], h)
    h = _resnet(d['mid']['block_2'], h)
    n_levels = len(cfg.ch_mult)
    for i in reversed(range(n_levels)):
        up = d['up'][i]
        for j in range(cfg.num_res_blocks + 1):
            h = _resnet(up['block'][j], h)
        if i > 0:
            h = _upsample(up['upsample'], h)
    h = _conv(d['conv_out'], _swish(_group_norm(d['norm_out'], h)))
    return h


def init_decoder_params(key: jax.Array,
                        cfg: AutoEncoderParams = AutoEncoderParams(),
                        dtype=jnp.float32) -> Dict:
    """Random decoder params with the BFL layout (tests / smoke)."""
    rng = np.random.default_rng(0)

    def conv(cin, cout, k=3):
        return {'weight': jnp.asarray(
                    rng.standard_normal((cout, cin, k, k)) * 0.02, dtype),
                'bias': jnp.zeros((cout,), dtype)}

    def norm(c):
        return {'weight': jnp.ones((c,), dtype),
                'bias': jnp.zeros((c,), dtype)}

    def res(cin, cout):
        p = {'norm1': norm(cin), 'conv1': conv(cin, cout),
             'norm2': norm(cout), 'conv2': conv(cout, cout)}
        if cin != cout:
            p['nin_shortcut'] = conv(cin, cout, k=1)
        return p

    def attn(c):
        return {'norm': norm(c), 'q': conv(c, c, 1), 'k': conv(c, c, 1),
                'v': conv(c, c, 1), 'proj_out': conv(c, c, 1)}

    block_in = cfg.ch * cfg.ch_mult[-1]
    d = {'conv_in': conv(cfg.z_channels, block_in),
         'mid': {'block_1': res(block_in, block_in),
                 'attn_1': attn(block_in),
                 'block_2': res(block_in, block_in)}}
    up = {}
    cur = block_in
    for i in reversed(range(len(cfg.ch_mult))):
        cout = cfg.ch * cfg.ch_mult[i]
        blocks = []
        for j in range(cfg.num_res_blocks + 1):
            blocks.append(res(cur, cout))
            cur = cout
        lvl = {'block': blocks}
        if i > 0:
            lvl['upsample'] = {'conv': conv(cur, cur)}
        up[i] = lvl
    d['up'] = up
    d['norm_out'] = norm(cur)
    d['conv_out'] = conv(cur, 3)
    return {'decoder': d}
