"""Video VAE decoders at tiny dims on CPU: output geometry, temporal
causality (the defining property of both reference decoders), and
checkpoint key-mapping loaders."""
import jax
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.models.video_vae import (
    HyVaeConfig, WanVaeConfig, hunyuan_vae_decode, wan_vae_decode,
    init_hunyuan_vae_decoder, init_wan_vae_decoder,
    load_hunyuan_vae_decoder, load_wan_vae_decoder)

HY_TINY = HyVaeConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                      latent_channels=4, norm_groups=4)
WAN_TINY = WanVaeConfig(dim=8, z_dim=4, num_res_blocks=1)


def test_hunyuan_vae_decode_geometry():
    p = init_hunyuan_vae_decoder(jax.random.PRNGKey(0), HY_TINY)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3, 4, 6))
    x = hunyuan_vae_decode(p, z, HY_TINY)
    # time x4 with unexpanded first frame; space x8 (vae/vae.py:216-228)
    assert x.shape == (1, 3, 4 * (3 - 1) + 1, 32, 48), x.shape
    assert np.isfinite(np.asarray(x)).all()


def test_wan_vae_decode_geometry():
    p = init_wan_vae_decoder(jax.random.PRNGKey(0), WAN_TINY)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3, 4, 6))
    x = wan_vae_decode(p, z, WAN_TINY)
    assert x.shape == (1, 3, 4 * (3 - 1) + 1, 32, 48), x.shape
    xr = np.asarray(x)
    assert np.isfinite(xr).all() and xr.min() >= -1 and xr.max() <= 1


def test_wan_vae_temporal_causality():
    """Perturbing latent frames > t must not change output frames from
    latents <= t.  Wan's decoder is EXACTLY frame-causal (zero-pad causal
    convs, per-frame spatial attention, per-location RMS norm — the
    property the reference's feat_cache streaming loop relies on,
    wan vae.py:544-568).  NOTE: the Hunyuan decoder is deliberately NOT
    under this test — its torch.nn.GroupNorm normalizes over (C/G,T,H,W)
    i.e. across time (unet_causal_3d_blocks.py:301), so the full decoder
    is only conv-causal; the reference streams it by temporal tiling
    with overlap-blend (autoencoder_kl_causal_3d.py:300-301), not exact
    causal streaming.  Hunyuan's causal pieces are tested individually
    below."""
    cfg = WAN_TINY
    params = init_wan_vae_decoder(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.z_dim, 4, 4, 4))
    z2 = z.at[:, :, 2:].add(100.0)
    a = np.asarray(wan_vae_decode(params, z, cfg))
    b = np.asarray(wan_vae_decode(params, z2, cfg))
    # latent frames 0..1 map to output frames 0..4*1 (first frame 1:1,
    # each later latent frame contributes 4)
    keep = 4 * (2 - 1) + 1
    np.testing.assert_allclose(a[:, :, :keep], b[:, :, :keep],
                               atol=1e-4, rtol=1e-4)
    assert np.abs(a[:, :, keep:] - b[:, :, keep:]).max() > 1e-3


def test_hunyuan_causal_primitives():
    """The Hunyuan decoder's time-mixing pieces are individually causal:
    causal_conv3d (replicate pad (kt-1,0)), _hy_upsample, and the
    frame-causal mid attention (prepare_causal_attention_mask)."""
    from chipmunk_tpu.models.video_vae import (
        causal_conv3d, _hy_upsample, _hy_mid_attn)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 5, 4, 4, 8))
    x2 = x.at[:, 3:].add(100.0)

    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 8, 8)) * 0.1
    a = causal_conv3d(x, w, pad_mode='edge')
    b = causal_conv3d(x2, w, pad_mode='edge')
    np.testing.assert_allclose(np.asarray(a[:, :3]), np.asarray(b[:, :3]),
                               atol=1e-4, rtol=1e-4)

    up = {'conv_w': w, 'conv_b': jnp.zeros(8)}
    a = _hy_upsample(up, x, time=True)
    b = _hy_upsample(up, x2, time=True)
    # frames 0..2 -> output frames 0..4 (first unexpanded, then pairs)
    np.testing.assert_allclose(np.asarray(a[:, :5]), np.asarray(b[:, :5]),
                               atol=1e-4, rtol=1e-4)

    lin = jax.random.normal(jax.random.PRNGKey(2), (8, 8)) * 0.1
    ap = {'gn_w': jnp.ones(8), 'gn_b': jnp.zeros(8),
          'q_w': lin, 'q_b': jnp.zeros(8), 'k_w': lin, 'k_b': jnp.zeros(8),
          'v_w': lin, 'v_b': jnp.zeros(8), 'o_w': lin, 'o_b': jnp.zeros(8)}
    # the attention itself is frame-causal, but its group norm is
    # time-global — so probe the mask with a perturbation that is
    # invisible to the norm: time-reversing later frames preserves the
    # per-group (T,H,W) statistics exactly, hence frame-0 normalized
    # tokens are unchanged and any frame-0 output change could only come
    # from attending to later-frame keys.
    perm = x.at[:, 1:].set(x[:, 1:][:, ::-1])
    a = _hy_mid_attn(ap, x, groups=4)
    b = _hy_mid_attn(ap, perm, groups=4)
    np.testing.assert_allclose(np.asarray(a[:, 0]), np.asarray(b[:, 0]),
                               atol=1e-4, rtol=1e-4)
    assert np.abs(np.asarray(a[:, 1:]) - np.asarray(b[:, 1:])).max() > 1e-3


def _torch_conv3d_layout(rng, co, ci, k):
    return rng.standard_normal((co, ci) + k).astype(np.float32) * 0.05


def test_hunyuan_vae_loader_mapping():
    """Synthesized diffusers-layout state dict loads, decodes, and the
    conv transpose is exact (torch [Co,Ci,kt,kh,kw] -> [kt,kh,kw,Ci,Co])."""
    cfg = HY_TINY
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, ci, co, k=(3, 3, 3)):
        sd[f'{name}.weight'] = _torch_conv3d_layout(rng, co, ci, k)
        sd[f'{name}.bias'] = rng.standard_normal(co).astype(np.float32) * .01

    def norm(name, c):
        sd[f'{name}.weight'] = np.ones(c, np.float32)
        sd[f'{name}.bias'] = np.zeros(c, np.float32)

    def lin(name, c):
        sd[f'{name}.weight'] = rng.standard_normal((c, c)).astype(
            np.float32) * 0.05
        sd[f'{name}.bias'] = np.zeros(c, np.float32)

    def res(pre, ci, co):
        norm(f'{pre}.norm1', ci)
        conv(f'{pre}.conv1.conv', ci, co)
        norm(f'{pre}.norm2', co)
        conv(f'{pre}.conv2.conv', co, co)
        if ci != co:
            conv(f'{pre}.conv_shortcut.conv', ci, co, k=(1, 1, 1))

    ch = cfg.block_out_channels
    top = ch[-1]
    d = 'decoder'
    conv(f'{d}.conv_in.conv', cfg.latent_channels, top)
    res(f'{d}.mid_block.resnets.0', top, top)
    res(f'{d}.mid_block.resnets.1', top, top)
    at = f'{d}.mid_block.attentions.0'
    norm(f'{at}.group_norm', top)
    for nm in ('to_q', 'to_k', 'to_v', 'to_out.0'):
        lin(f'{at}.{nm}', top)
    rev = list(reversed(ch))
    prev = rev[0]
    for i in range(len(ch)):
        out = rev[i]
        for j in range(cfg.layers_per_block + 1):
            res(f'{d}.up_blocks.{i}.resnets.{j}',
                prev if j == 0 else out, out)
        if i < 3 or (1 <= i < len(ch) - 1):
            conv(f'{d}.up_blocks.{i}.upsamplers.0.conv.conv', out, out)
        prev = out
    norm(f'{d}.conv_norm_out', ch[0])
    conv(f'{d}.conv_out.conv', ch[0], 3)

    p = load_hunyuan_vae_decoder(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(p['conv_in_w']),
        sd['decoder.conv_in.conv.weight'].transpose(2, 3, 4, 1, 0))
    z = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.latent_channels,
                                                  2, 4, 4))
    x = hunyuan_vae_decode(p, z, cfg)
    assert x.shape == (1, 3, 5, 32, 32)
    assert np.isfinite(np.asarray(x)).all()


def test_wan_vae_loader_mapping():
    cfg = WAN_TINY
    rng = np.random.default_rng(1)
    sd = {}

    def conv3(name, ci, co, k=(3, 3, 3)):
        sd[f'{name}.weight'] = _torch_conv3d_layout(rng, co, ci, k)
        sd[f'{name}.bias'] = rng.standard_normal(co).astype(np.float32) * .01

    def conv2(name, ci, co, k=(3, 3)):
        sd[f'{name}.weight'] = rng.standard_normal(
            (co, ci) + k).astype(np.float32) * 0.05
        sd[f'{name}.bias'] = rng.standard_normal(co).astype(np.float32) * .01

    def gam(name, c):
        sd[f'{name}.gamma'] = np.ones((c, 1, 1, 1), np.float32)

    def res(pre, ci, co):
        gam(f'{pre}.residual.0', ci)
        conv3(f'{pre}.residual.2', ci, co)
        gam(f'{pre}.residual.3', co)
        conv3(f'{pre}.residual.6', co, co)
        if ci != co:
            conv3(f'{pre}.shortcut', ci, co, k=(1, 1, 1))

    dims = cfg.dims
    d0 = dims[0]
    d = 'decoder'
    conv3('conv2', cfg.z_dim, cfg.z_dim, k=(1, 1, 1))
    conv3(f'{d}.conv1', cfg.z_dim, d0)
    res(f'{d}.middle.0', d0, d0)
    sd[f'{d}.middle.1.norm.gamma'] = np.ones((d0, 1, 1), np.float32)
    conv2(f'{d}.middle.1.to_qkv', d0, 3 * d0, k=(1, 1))
    conv2(f'{d}.middle.1.proj', d0, d0, k=(1, 1))
    res(f'{d}.middle.2', d0, d0)
    k = 0
    n = len(cfg.dim_mult)
    pairs = list(zip(dims[:-1], dims[1:]))
    for i, (ci, co) in enumerate(pairs):
        if i >= 1:
            ci //= 2
        for j in range(cfg.num_res_blocks + 1):
            res(f'{d}.upsamples.{k}', ci if j == 0 else co, co)
            k += 1
        if i != n - 1:
            conv2(f'{d}.upsamples.{k}.resample.1', co, co // 2)
            if cfg.temporal_upsample[i]:
                conv3(f'{d}.upsamples.{k}.time_conv', co, co * 2,
                      k=(3, 1, 1))
            k += 1
    sd[f'{d}.head.0.gamma'] = np.ones((dims[-1], 1, 1, 1), np.float32)
    conv3(f'{d}.head.2', dims[-1], 3)

    p = load_wan_vae_decoder(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(p['conv1_w']),
        sd['decoder.conv1.weight'].transpose(2, 3, 4, 1, 0))
    z = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.z_dim, 2, 4, 4))
    x = wan_vae_decode(p, z, cfg)
    assert x.shape == (1, 3, 5, 32, 32)
    assert np.isfinite(np.asarray(x)).all()
