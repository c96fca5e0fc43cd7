"""Video VAE decoders: HunyuanVideo causal-3D VAE and Wan2.1 VAE.

TPU-first rebuilds of the reference decoders so the video CLIs can end in
pixels like flux_generate does (VERDICT r3 missing #3):

  * HunyuanVideo ``AutoencoderKLCausal3D`` decoder — reference
    examples/hunyuan/hyvideo/vae/autoencoder_kl_causal_3d.py +
    vae/unet_causal_3d_blocks.py: causal 3-D convs (replicate padding,
    time pad (k-1, 0)), GroupNorm/SiLU resnets, a mid block with
    frame-causal single-head attention, nearest upsampling where the
    FIRST frame upsamples spatially only (time compression 4 = 2 temporal
    doublings on up blocks 1-2; spatial 8 = doublings on blocks 0-2).
  * Wan2.1 ``Decoder3d`` — reference examples/wan/wan/modules/vae.py:
    zero-padded causal convs, channel-RMS norms, per-frame spatial
    attention in the middle stack, and ``upsample3d`` stages whose
    time_conv doubles every frame EXCEPT the first.

Design deltas from the reference (behavior-preserving):
  * channels-last layout ([B, T, H, W, C]) so XLA tiles convs onto the
    MXU without transposes; weights are transposed once at load.
  * the reference streams the Wan decoder frame-by-frame through a
    ``feat_cache`` of per-conv sliding windows (vae.py:544-568) — a CUDA
    memory-residency tactic, not semantics.  A full-sequence causal conv
    (zero left-pad in time) computes the identical function, so here the
    whole clip decodes in one jitted program; the cached ``upsample3d``
    time path reduces to: first frame passes through, frames 2..T run a
    causally-padded (3,1,1) conv to 2C channels that interleave into
    2(T-1) frames (derived from the cache recurrence, vae.py:101-137).
    Total output frames = 4*(T-1)+1 after two such stages — matching the
    reference's 81 frames from 21 latents.
  * everything is a pure function over a param pytree; fp32 by default
    (decode runs once per generation; numerics > bf16 speed here).

Loaders map the reference checkpoints (diffusers-style safetensors for
Hunyuan, WanVAE_ state dict for Wan) onto these pytrees; smoke tests
drive synthesized weights end-to-end at tiny shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------- primitives

def causal_conv3d(x: jnp.ndarray, w: jnp.ndarray,
                  b: Optional[jnp.ndarray] = None,
                  stride: Tuple[int, int, int] = (1, 1, 1),
                  pad_mode: str = 'constant') -> jnp.ndarray:
    """Causal 3-D conv, channels-last x [B,T,H,W,C], w [kt,kh,kw,Cin,Cout].
    Time pads (kt-1, 0); space pads symmetric k//2.  pad_mode 'edge'
    replicates (Hunyuan, unet_causal_3d_blocks.py:48-75); 'constant'
    zero-pads (Wan, vae.py:17-37)."""
    kt, kh, kw = w.shape[:3]
    pads = ((0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2),
            (0, 0))
    x = jnp.pad(x, pads, mode=pad_mode)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding='VALID',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    if b is not None:
        y = y + b
    return y


def conv2d_samepad(x: jnp.ndarray, w: jnp.ndarray, b=None) -> jnp.ndarray:
    """Per-frame 2-D conv on [B,T,H,W,C] (w [kh,kw,Cin,Cout], SAME pad)."""
    B, T, H, W, C = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(B * T, H, W, C), w, window_strides=(1, 1), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if b is not None:
        y = y + b
    return y.reshape(B, T, *y.shape[1:])


def group_norm(x: jnp.ndarray, gamma, beta, groups: int,
               eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm over the channel (last) axis of [..., C] in fp32."""
    C = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (groups, C // groups))
    red = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
    mean = xf.mean(axis=red, keepdims=True)
    var = xf.var(axis=red, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(x.shape)
    return (xf * gamma + beta).astype(x.dtype)


def channel_rms_norm(x: jnp.ndarray, gamma) -> jnp.ndarray:
    """Wan RMS_norm (vae.py:39-54): L2-normalize the channel vector,
    rescale by sqrt(C) * gamma."""
    C = x.shape[-1]
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True)) + 1e-12
    return ((xf / n) * (C ** 0.5) * gamma).astype(x.dtype)


def nearest_up2d(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample of [B,T,H,W,C]."""
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


# ------------------------------------------------- Hunyuan causal-3D VAE

@dataclass(frozen=True)
class HyVaeConfig:
    """Decoder shape (HF hunyuan-video VAE config: block_out_channels
    (128, 256, 512, 512), layers_per_block 2, latent 16ch, GN groups 32,
    time x4 / space x8)."""
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 16
    out_channels: int = 3
    norm_groups: int = 32
    scaling_factor: float = 0.476986


def _hy_resnet(p: Dict, x, groups: int):
    """ResnetBlockCausal3D (unet_causal_3d_blocks.py:249-430), group-norm
    flavor (no temb)."""
    h = group_norm(x, p['norm1_w'], p['norm1_b'], groups)
    h = causal_conv3d(jax.nn.silu(h), p['conv1_w'], p['conv1_b'],
                      pad_mode='edge')
    h = group_norm(h, p['norm2_w'], p['norm2_b'], groups)
    h = causal_conv3d(jax.nn.silu(h), p['conv2_w'], p['conv2_b'],
                      pad_mode='edge')
    if 'short_w' in p:
        x = causal_conv3d(x, p['short_w'], p.get('short_b'),
                          pad_mode='edge')
    return x + h


def _hy_mid_attn(p: Dict, x, groups: int):
    """Mid-block attention (single head, frame-causal mask, residual;
    unet_causal_3d_blocks.py:615-629 + prepare_causal_attention_mask)."""
    B, T, H, W, C = x.shape
    hw = H * W
    h = group_norm(x, p['gn_w'], p['gn_b'], groups)
    tok = h.reshape(B, T * hw, C)
    q = tok @ p['q_w'] + p['q_b']
    k = tok @ p['k_w'] + p['k_b']
    v = tok @ p['v_w'] + p['v_b']
    s = (q @ k.swapaxes(-1, -2)).astype(jnp.float32) * (C ** -0.5)
    fi = jnp.arange(T * hw) // hw
    causal = fi[:, None] >= fi[None, :]          # query frame >= key frame
    s = jnp.where(causal[None], s, -jnp.inf)
    o = jax.nn.softmax(s, axis=-1).astype(x.dtype) @ v
    o = o @ p['o_w'] + p['o_b']
    return x + o.reshape(B, T, H, W, C)


def _hy_upsample(p: Dict, x, time: bool):
    """UpsampleCausal3D (unet_causal_3d_blocks.py:129-184): nearest 2x
    spatial; temporal doubling skips the FIRST frame; then causal conv."""
    first, rest = x[:, :1], x[:, 1:]
    first = nearest_up2d(first)
    if rest.shape[1]:
        rest = nearest_up2d(rest)
        if time:
            rest = jnp.repeat(rest, 2, axis=1)
        x = jnp.concatenate([first, rest], axis=1)
    else:
        x = first
    return causal_conv3d(x, p['conv_w'], p['conv_b'], pad_mode='edge')


def hunyuan_vae_decode(params: Dict, z: jnp.ndarray,
                       cfg: HyVaeConfig = HyVaeConfig(),
                       scale_latents: bool = True) -> jnp.ndarray:
    """z: [B, Cz, T, H, W] (model-native channels-first latents) ->
    pixels [B, 3, 4(T-1)+1, 8H, 8W] in [-1, 1].  DecoderCausal3D
    (vae/vae.py:136-293): conv_in -> mid(res, attn, res) -> 4 up blocks
    (3 resnets + upsample: spatial on 0-2, temporal on 1-2) -> GN/SiLU/
    conv_out.  ``scale_latents`` divides by the VAE scaling_factor first
    (diffusers convention; pipeline_hunyuan_video.py decode path)."""
    if scale_latents:
        z = z / cfg.scaling_factor
    x = jnp.transpose(z, (0, 2, 3, 4, 1)).astype(jnp.float32)
    g = cfg.norm_groups
    x = causal_conv3d(x, params['conv_in_w'], params['conv_in_b'],
                      pad_mode='edge')
    mid = params['mid']
    x = _hy_resnet(mid['res0'], x, g)
    x = _hy_mid_attn(mid['attn'], x, g)
    x = _hy_resnet(mid['res1'], x, g)
    n_blocks = len(cfg.block_out_channels)
    for i, blk in enumerate(params['up']):
        for rp in blk['resnets']:
            x = _hy_resnet(rp, x, g)
        if 'upsample' in blk:
            # spatial on blocks < log2(8)=3; temporal on blocks >= 1 and
            # not final (vae/vae.py:216-228 with time_compression 4)
            x = _hy_upsample(blk['upsample'], x, time=(1 <= i < n_blocks - 1))
    x = group_norm(x, params['out_norm_w'], params['out_norm_b'], g)
    x = causal_conv3d(jax.nn.silu(x), params['conv_out_w'],
                      params['conv_out_b'], pad_mode='edge')
    return jnp.transpose(x, (0, 4, 1, 2, 3))


def init_hunyuan_vae_decoder(key: jax.Array,
                             cfg: HyVaeConfig = HyVaeConfig()) -> Dict:
    """Random decoder params (synthesized-weight smoke tests; same tree
    the loader fills)."""
    ks = iter(jax.random.split(key, 256))

    def conv(ci, co, k=3):
        w = jax.random.normal(next(ks), (k if k == 1 else 3,) * 3 + (ci, co)
                              ) * (ci * 27) ** -0.5
        return w.astype(jnp.float32), jnp.zeros((co,), jnp.float32)

    def res(ci, co):
        c1w, c1b = conv(ci, co)
        c2w, c2b = conv(co, co)
        p = {'norm1_w': jnp.ones((ci,)), 'norm1_b': jnp.zeros((ci,)),
             'conv1_w': c1w, 'conv1_b': c1b,
             'norm2_w': jnp.ones((co,)), 'norm2_b': jnp.zeros((co,)),
             'conv2_w': c2w, 'conv2_b': c2b}
        if ci != co:
            sw, sb = conv(ci, co, k=1)
            p['short_w'], p['short_b'] = sw, sb
        return p

    ch = cfg.block_out_channels
    top = ch[-1]
    ciw, cib = conv(cfg.latent_channels, top)
    attn_c = top

    def lin(c):
        return (jax.random.normal(next(ks), (c, c)) * c ** -0.5,
                jnp.zeros((c,)))

    qw, qb = lin(attn_c)
    kw, kb = lin(attn_c)
    vw, vb = lin(attn_c)
    ow, ob = lin(attn_c)
    mid = {'res0': res(top, top), 'res1': res(top, top),
           'attn': {'gn_w': jnp.ones((attn_c,)),
                    'gn_b': jnp.zeros((attn_c,)),
                    'q_w': qw, 'q_b': qb, 'k_w': kw, 'k_b': kb,
                    'v_w': vw, 'v_b': vb, 'o_w': ow, 'o_b': ob}}
    up = []
    rev = list(reversed(ch))
    prev = rev[0]
    n = len(ch)
    for i in range(n):
        out = rev[i]
        resnets = []
        for j in range(cfg.layers_per_block + 1):
            resnets.append(res(prev if j == 0 else out, out))
        blk = {'resnets': resnets}
        spatial, temporal = i < 3, (1 <= i < n - 1)
        if spatial or temporal:
            uw, ub = conv(out, out)
            blk['upsample'] = {'conv_w': uw, 'conv_b': ub}
        up.append(blk)
        prev = out
    cow, cob = conv(ch[0], cfg.out_channels)
    return {'conv_in_w': ciw, 'conv_in_b': cib, 'mid': mid, 'up': up,
            'out_norm_w': jnp.ones((ch[0],)),
            'out_norm_b': jnp.zeros((ch[0],)),
            'conv_out_w': cow, 'conv_out_b': cob}


def load_hunyuan_vae_decoder(sd: Dict[str, Any],
                             cfg: HyVaeConfig = HyVaeConfig()) -> Dict:
    """Map a diffusers-style AutoencoderKLCausal3D state dict (decoder.*
    keys; torch Conv3d [Co,Ci,kt,kh,kw] -> [kt,kh,kw,Ci,Co]) onto the
    decode pytree."""
    def cw(name):
        return jnp.asarray(np.asarray(sd[f'{name}.weight']).transpose(
            2, 3, 4, 1, 0), jnp.float32)

    def cb(name):
        return jnp.asarray(np.asarray(sd[f'{name}.bias']), jnp.float32)

    def a(name):
        return jnp.asarray(np.asarray(sd[name]), jnp.float32)

    def res(pre):
        p = {'norm1_w': a(f'{pre}.norm1.weight'),
             'norm1_b': a(f'{pre}.norm1.bias'),
             'conv1_w': cw(f'{pre}.conv1.conv'),
             'conv1_b': cb(f'{pre}.conv1.conv'),
             'norm2_w': a(f'{pre}.norm2.weight'),
             'norm2_b': a(f'{pre}.norm2.bias'),
             'conv2_w': cw(f'{pre}.conv2.conv'),
             'conv2_b': cb(f'{pre}.conv2.conv')}
        if f'{pre}.conv_shortcut.conv.weight' in sd:
            p['short_w'] = cw(f'{pre}.conv_shortcut.conv')
            p['short_b'] = cb(f'{pre}.conv_shortcut.conv')
        return p

    def linw(name):  # torch Linear [out, in] -> [in, out]
        return jnp.asarray(np.asarray(sd[f'{name}.weight']).T, jnp.float32)

    d = 'decoder'
    at = f'{d}.mid_block.attentions.0'
    mid = {'res0': res(f'{d}.mid_block.resnets.0'),
           'res1': res(f'{d}.mid_block.resnets.1'),
           'attn': {'gn_w': a(f'{at}.group_norm.weight'),
                    'gn_b': a(f'{at}.group_norm.bias'),
                    'q_w': linw(f'{at}.to_q'), 'q_b': cb(f'{at}.to_q'),
                    'k_w': linw(f'{at}.to_k'), 'k_b': cb(f'{at}.to_k'),
                    'v_w': linw(f'{at}.to_v'), 'v_b': cb(f'{at}.to_v'),
                    'o_w': linw(f'{at}.to_out.0'),
                    'o_b': cb(f'{at}.to_out.0')}}
    up = []
    for i in range(len(cfg.block_out_channels)):
        blk = {'resnets': [res(f'{d}.up_blocks.{i}.resnets.{j}')
                           for j in range(cfg.layers_per_block + 1)]}
        uname = f'{d}.up_blocks.{i}.upsamplers.0.conv.conv'
        if f'{uname}.weight' in sd:
            blk['upsample'] = {'conv_w': cw(uname), 'conv_b': cb(uname)}
        up.append(blk)
    return {'conv_in_w': cw(f'{d}.conv_in.conv'),
            'conv_in_b': cb(f'{d}.conv_in.conv'),
            'mid': mid, 'up': up,
            'out_norm_w': a(f'{d}.conv_norm_out.weight'),
            'out_norm_b': a(f'{d}.conv_norm_out.bias'),
            'conv_out_w': cw(f'{d}.conv_out.conv'),
            'conv_out_b': cb(f'{d}.conv_out.conv')}


def load_hunyuan_vae_safetensors(path: str,
                                 cfg: HyVaeConfig = HyVaeConfig()) -> Dict:
    from safetensors import safe_open
    sd = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            if k.startswith('decoder.'):
                sd[k] = f.get_tensor(k)
    return load_hunyuan_vae_decoder(sd, cfg)


# ------------------------------------------------------------ Wan2.1 VAE

# per-channel latent normalization (reference vae.py:629-639)
WAN_LATENT_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921)
WAN_LATENT_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160)


@dataclass(frozen=True)
class WanVaeConfig:
    """Decoder3d shape (reference vae.py:369-421 defaults with z_dim=16
    for Wan2.1)."""
    dim: int = 128
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_upsample: Tuple[bool, ...] = (False, True, True)
    out_channels: int = 3

    @property
    def dims(self):
        m = list(self.dim_mult)
        return tuple(self.dim * u for u in [m[-1]] + m[::-1])


def _wan_res(p: Dict, x):
    """ResidualBlock (vae.py:186-221): RMS/SiLU/conv x2 + shortcut."""
    h = channel_rms_norm(x, p['norm1_g'])
    h = causal_conv3d(jax.nn.silu(h), p['conv1_w'], p['conv1_b'])
    h = channel_rms_norm(h, p['norm2_g'])
    h = causal_conv3d(jax.nn.silu(h), p['conv2_w'], p['conv2_b'])
    if 'short_w' in p:
        x = causal_conv3d(x, p['short_w'], p['short_b'])
    return x + h


def _wan_attn(p: Dict, x):
    """AttentionBlock (vae.py:223-263): per-frame single-head spatial
    attention; qkv/proj are 1x1 convs."""
    B, T, H, W, C = x.shape
    h = channel_rms_norm(x, p['norm_g'])
    qkv = h.reshape(B * T, H * W, C) @ p['qkv_w'] + p['qkv_b']
    q, k, v = jnp.split(qkv, 3, axis=-1)
    s = (q @ k.swapaxes(-1, -2)).astype(jnp.float32) * (C ** -0.5)
    o = jax.nn.softmax(s, axis=-1).astype(x.dtype) @ v
    o = o @ p['proj_w'] + p['proj_b']
    return x + o.reshape(B, T, H, W, C)


def _wan_upsample(p: Dict, x, temporal: bool):
    """Resample upsample2d/3d (vae.py:66-141).  Full-sequence equivalent
    of the cached time path (module docstring): first frame unexpanded;
    frames 2..T -> causal (3,1,1) conv to 2C -> interleaved pairs."""
    if temporal and x.shape[1] > 1:
        first, rest = x[:, :1], x[:, 1:]
        y = causal_conv3d(rest, p['time_w'], p['time_b'])   # [B,T-1,..,2C]
        B, Tm1, H, W, C2 = y.shape
        C = C2 // 2
        # channel 2C splits pair-major (first C = even frame of the pair,
        # reference vae.py:133-136 reshape(b,2,c,...)); interleave pairs
        # along time
        y = y.reshape(B, Tm1, H, W, 2, C)
        y = y.transpose(0, 1, 4, 2, 3, 5).reshape(B, 2 * Tm1, H, W, C)
        x = jnp.concatenate([first, y], axis=1)
    x = nearest_up2d(x)
    return conv2d_samepad(x, p['conv_w'], p['conv_b'])


def wan_vae_decode(params: Dict, z: jnp.ndarray,
                   cfg: WanVaeConfig = WanVaeConfig(),
                   scale_latents: bool = True) -> jnp.ndarray:
    """z: [B, Cz, T, H, W] -> pixels [B, 3, 4(T-1)+1, 8H, 8W], clamped to
    [-1, 1] like the reference (vae.py:657-663).  ``scale_latents``
    applies z*std + mean (inverting the encoder normalization)."""
    if scale_latents:
        mean = jnp.asarray(WAN_LATENT_MEAN, jnp.float32)[:cfg.z_dim]
        std = jnp.asarray(WAN_LATENT_STD, jnp.float32)[:cfg.z_dim]
        z = z * std[None, :, None, None, None] + \
            mean[None, :, None, None, None]
    x = jnp.transpose(z, (0, 2, 3, 4, 1)).astype(jnp.float32)
    # conv2 (the z-space 1x1, vae.py:506) then the decoder proper
    x = causal_conv3d(x, params['conv2_w'], params['conv2_b'])
    x = causal_conv3d(x, params['conv1_w'], params['conv1_b'])
    x = _wan_res(params['mid_res0'], x)
    x = _wan_attn(params['mid_attn'], x)
    x = _wan_res(params['mid_res1'], x)
    n = len(cfg.dim_mult)
    for i, blk in enumerate(params['up']):
        for rp in blk['resnets']:
            x = _wan_res(rp, x)
        if 'upsample' in blk:
            x = _wan_upsample(blk['upsample'], x,
                              temporal=cfg.temporal_upsample[i])
    x = channel_rms_norm(x, params['head_norm_g'])
    x = causal_conv3d(jax.nn.silu(x), params['head_w'], params['head_b'])
    return jnp.clip(jnp.transpose(x, (0, 4, 1, 2, 3)), -1.0, 1.0)


def init_wan_vae_decoder(key: jax.Array,
                         cfg: WanVaeConfig = WanVaeConfig()) -> Dict:
    ks = iter(jax.random.split(key, 256))

    def conv(ci, co, k=(3, 3, 3)):
        fan = ci * int(np.prod(k))
        w = jax.random.normal(next(ks), tuple(k) + (ci, co)) * fan ** -0.5
        return w.astype(jnp.float32), jnp.zeros((co,), jnp.float32)

    def res(ci, co):
        c1w, c1b = conv(ci, co)
        c2w, c2b = conv(co, co)
        p = {'norm1_g': jnp.ones((ci,)), 'conv1_w': c1w, 'conv1_b': c1b,
             'norm2_g': jnp.ones((co,)), 'conv2_w': c2w, 'conv2_b': c2b}
        if ci != co:
            sw, sb = conv(ci, co, k=(1, 1, 1))
            p['short_w'], p['short_b'] = sw, sb
        return p

    dims = cfg.dims
    d0 = dims[0]
    c2w, c2b = conv(cfg.z_dim, cfg.z_dim, k=(1, 1, 1))
    c1w, c1b = conv(cfg.z_dim, d0)
    qkvw = jax.random.normal(next(ks), (d0, 3 * d0)) * d0 ** -0.5
    projw = jnp.zeros((d0, d0))     # reference zero-inits proj (vae.py:238)
    params = {'conv2_w': c2w, 'conv2_b': c2b,
              'conv1_w': c1w, 'conv1_b': c1b,
              'mid_res0': res(d0, d0), 'mid_res1': res(d0, d0),
              'mid_attn': {'norm_g': jnp.ones((d0,)),
                           'qkv_w': qkvw, 'qkv_b': jnp.zeros((3 * d0,)),
                           'proj_w': projw, 'proj_b': jnp.zeros((d0,))}}
    up = []
    n = len(cfg.dim_mult)
    pairs = list(zip(dims[:-1], dims[1:]))
    for i, (ci, co) in enumerate(pairs):
        if i >= 1:
            ci = ci // 2     # previous Resample conv halved the channels
        resnets = []
        for j in range(cfg.num_res_blocks + 1):
            resnets.append(res(ci if j == 0 else co, co))
        blk = {'resnets': resnets}
        if i != n - 1:
            cw_, cb_ = conv(co, co // 2, k=(3, 3))
            u = {'conv_w': cw_, 'conv_b': cb_}
            if cfg.temporal_upsample[i]:
                tw, tb = conv(co, co * 2, k=(3, 1, 1))
                u['time_w'], u['time_b'] = tw, tb
            blk['upsample'] = u
        up.append(blk)
    params['up'] = up
    hw, hb = conv(dims[-1], cfg.out_channels)
    params['head_norm_g'] = jnp.ones((dims[-1],))
    params['head_w'], params['head_b'] = hw, hb
    return params


def load_wan_vae_decoder(sd: Dict[str, Any],
                         cfg: WanVaeConfig = WanVaeConfig()) -> Dict:
    """Map a WanVAE_ state dict (reference vae.py:483-508 layout; keys
    ``decoder.*`` + ``conv2.*``) onto the decode pytree.  Conv3d weights
    [Co,Ci,kt,kh,kw] -> [kt,kh,kw,Ci,Co]; Conv2d [Co,Ci,kh,kw] ->
    [kh,kw,Ci,Co]; RMS gammas [C,1,1(,1)] -> [C]."""
    def c3(name):
        return (jnp.asarray(np.asarray(sd[f'{name}.weight']).transpose(
                    2, 3, 4, 1, 0), jnp.float32),
                jnp.asarray(np.asarray(sd[f'{name}.bias']), jnp.float32))

    def c2(name):
        return (jnp.asarray(np.asarray(sd[f'{name}.weight']).transpose(
                    2, 3, 1, 0), jnp.float32),
                jnp.asarray(np.asarray(sd[f'{name}.bias']), jnp.float32))

    def gamma(name):
        return jnp.asarray(np.asarray(sd[f'{name}.gamma']).reshape(-1),
                           jnp.float32)

    def res(pre):
        c1w, c1b = c3(f'{pre}.residual.2')
        c2w_, c2b_ = c3(f'{pre}.residual.6')
        p = {'norm1_g': gamma(f'{pre}.residual.0'),
             'conv1_w': c1w, 'conv1_b': c1b,
             'norm2_g': gamma(f'{pre}.residual.3'),
             'conv2_w': c2w_, 'conv2_b': c2b_}
        if f'{pre}.shortcut.weight' in sd:
            sw, sb = c3(f'{pre}.shortcut')
            p['short_w'], p['short_b'] = sw, sb
        return p

    d = 'decoder'
    qkvw, qkvb = c2(f'{d}.middle.1.to_qkv')
    projw, projb = c2(f'{d}.middle.1.proj')
    c2w, c2b = c3('conv2')
    c1w, c1b = c3(f'{d}.conv1')
    params = {'conv2_w': c2w, 'conv2_b': c2b,
              'conv1_w': c1w, 'conv1_b': c1b,
              'mid_res0': res(f'{d}.middle.0'),
              'mid_res1': res(f'{d}.middle.2'),
              'mid_attn': {'norm_g': gamma(f'{d}.middle.1.norm'),
                           'qkv_w': qkvw.reshape(qkvw.shape[-2:]),
                           'qkv_b': qkvb,
                           'proj_w': projw.reshape(projw.shape[-2:]),
                           'proj_b': projb}}
    up = []
    n = len(cfg.dim_mult)
    k = 0
    for i in range(n):
        resnets = []
        for _ in range(cfg.num_res_blocks + 1):
            resnets.append(res(f'{d}.upsamples.{k}'))
            k += 1
        blk = {'resnets': resnets}
        if i != n - 1:
            cw_, cb_ = c2(f'{d}.upsamples.{k}.resample.1')
            u = {'conv_w': cw_, 'conv_b': cb_}
            if cfg.temporal_upsample[i]:
                tw, tb = c3(f'{d}.upsamples.{k}.time_conv')
                u['time_w'], u['time_b'] = tw, tb
            blk['upsample'] = u
            k += 1
        up.append(blk)
    params['up'] = up
    params['head_norm_g'] = gamma(f'{d}.head.0')
    hw, hb = c3(f'{d}.head.2')
    params['head_w'], params['head_b'] = hw, hb
    return params


def load_wan_vae(path: str, cfg: WanVaeConfig = WanVaeConfig()) -> Dict:
    """Load the Wan VAE checkpoint (.pth via torch-cpu, or .safetensors)."""
    if path.endswith('.safetensors'):
        from safetensors import safe_open
        sd = {}
        with safe_open(path, framework="np") as f:
            for key in f.keys():
                sd[key] = f.get_tensor(key)
    else:
        import torch
        raw = torch.load(path, map_location='cpu', weights_only=True)
        sd = {key: v.float().numpy() for key, v in raw.items()}
    return load_wan_vae_decoder(sd, cfg)
