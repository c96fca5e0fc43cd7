"""Weight-loading: BFL state-dict layout -> our param pytree, including the
single-block linear1/linear2 sparsify split algebra."""
import jax
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.models import FluxModelConfig, init_flux_params
from chipmunk_tpu.models.loaders import load_flux_params
from chipmunk_tpu.models.layers import linear


def synth_state_dict(cfg: FluxModelConfig, rng):
    h, mh = cfg.hidden_size, cfg.mlp_hidden
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[f'{name}.weight'] = rng.standard_normal((dout, din)).astype(
            np.float32) * 0.02
        if bias:
            sd[f'{name}.bias'] = rng.standard_normal((dout,)).astype(
                np.float32) * 0.02

    lin('img_in', cfg.in_channels, h)
    lin('txt_in', cfg.context_in_dim, h)
    for e in ('time_in', 'vector_in', 'guidance_in'):
        din = 256 if e != 'vector_in' else cfg.vec_in_dim
        lin(f'{e}.in_layer', din, h)
        lin(f'{e}.out_layer', h, h)
    for i in range(cfg.depth):
        p = f'double_blocks.{i}'
        lin(f'{p}.img_mod.lin', h, 6 * h)
        lin(f'{p}.txt_mod.lin', h, 6 * h)
        lin(f'{p}.img_attn.qkv', h, 3 * h)
        lin(f'{p}.txt_attn.qkv', h, 3 * h)
        for n in ('img_attn', 'txt_attn'):
            sd[f'{p}.{n}.norm.query_norm.scale'] = np.ones(
                (cfg.head_dim,), np.float32)
            sd[f'{p}.{n}.norm.key_norm.scale'] = np.ones(
                (cfg.head_dim,), np.float32)
        lin(f'{p}.img_attn.proj', h, h)
        lin(f'{p}.txt_attn.proj', h, h)
        lin(f'{p}.img_mlp.0', h, mh)
        lin(f'{p}.img_mlp.2', mh, h)
        lin(f'{p}.txt_mlp.0', h, mh)
        lin(f'{p}.txt_mlp.2', mh, h)
    for i in range(cfg.depth_single_blocks):
        p = f'single_blocks.{i}'
        lin(f'{p}.modulation.lin', h, 3 * h)
        lin(f'{p}.linear1', h, 3 * h + mh)
        lin(f'{p}.linear2', h + mh, h)
        sd[f'{p}.norm.query_norm.scale'] = np.ones((cfg.head_dim,),
                                                   np.float32)
        sd[f'{p}.norm.key_norm.scale'] = np.ones((cfg.head_dim,), np.float32)
    lin('final_layer.adaLN_modulation.1', h, 2 * h)
    lin('final_layer.linear', h, cfg.in_channels)
    return sd


def tiny_cfg():
    return FluxModelConfig(in_channels=8, vec_in_dim=16, context_in_dim=16,
                           hidden_size=64, num_heads=2, mlp_ratio=2.0,
                           depth=2, depth_single_blocks=2,
                           axes_dim=(8, 12, 12), guidance_embed=True,
                           txt_len=128, dtype=jnp.float32)


def test_loader_tree_matches_init():
    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    loaded = load_flux_params(synth_state_dict(cfg, rng), cfg)
    ref = init_flux_params(jax.random.PRNGKey(0), cfg)
    ls = jax.tree_util.tree_structure(loaded)
    rs = jax.tree_util.tree_structure(ref)
    assert ls == rs, (ls, rs)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(loaded),
            jax.tree_util.tree_leaves_with_path(ref)):
        assert a.shape == b.shape, (pa, a.shape, b.shape)


def test_single_block_split_algebra():
    """Our pre-split qkv/fc1 + o_proj/fc2 must reproduce the fused
    linear1/linear2 computation exactly (reference sparsify contract,
    layers.py:239-291)."""
    cfg = tiny_cfg()
    h, mh = cfg.hidden_size, cfg.mlp_hidden
    rng = np.random.default_rng(1)
    sd = synth_state_dict(cfg, rng)
    params = load_flux_params(sd, cfg)
    x = jnp.asarray(rng.standard_normal((4, h)).astype(np.float32))

    # fused computation (reference SingleStreamBlock pre-sparsify)
    W1 = jnp.asarray(sd['single_blocks.0.linear1.weight'])
    B1 = jnp.asarray(sd['single_blocks.0.linear1.bias'])
    W2 = jnp.asarray(sd['single_blocks.0.linear2.weight'])
    B2 = jnp.asarray(sd['single_blocks.0.linear2.bias'])
    fused = x @ W1.T + B1
    qkv_f, mlp_f = fused[:, :3 * h], fused[:, 3 * h:]
    act_f = jax.nn.gelu(mlp_f, approximate=True)
    # pretend attention output == qkv_f's first h columns, for algebra only
    attn_out = qkv_f[:, :h]
    out_fused = jnp.concatenate([attn_out, act_f], -1) @ W2.T + B2

    p0 = jax.tree_util.tree_map(lambda z: z[0], params['single'])
    qkv_s = linear(p0['qkv'], x)
    np.testing.assert_allclose(np.asarray(qkv_s), np.asarray(qkv_f),
                               atol=1e-5)
    mlp_s = x @ p0['w1t'].T + p0['b1']
    np.testing.assert_allclose(np.asarray(mlp_s), np.asarray(mlp_f),
                               atol=1e-5)
    out_split = (linear(p0['o_proj'], attn_out)
                 + jax.nn.gelu(mlp_s, approximate=True) @ p0['w2'])
    np.testing.assert_allclose(np.asarray(out_split), np.asarray(out_fused),
                               atol=1e-4)


def test_ae_decoder_shapes_and_finiteness():
    """FLUX autoencoder decoder (models/autoencoder.py): z [B,16,h,w] ->
    [B,3,8h,8w], finite, at random BFL-layout params."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from chipmunk_tpu.models.autoencoder import (decode,
                                                 init_decoder_params)
    params = init_decoder_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 8, 12),
                          jnp.float32)
    img = decode(params, z)
    assert img.shape == (1, 3, 64, 96)
    assert bool(jnp.isfinite(img).all())


def test_ae_decoder_upsample_doubles():
    import jax
    import jax.numpy as jnp
    from chipmunk_tpu.models.autoencoder import _upsample
    import numpy as np
    p = {'conv': {'weight': jnp.eye(4).reshape(4, 4, 1, 1) *
                  jnp.ones((1, 1, 3, 3)) / 9.0,
                  'bias': jnp.zeros((4,))}}
    x = jnp.ones((1, 4, 5, 7))
    y = _upsample(p, x)
    assert y.shape == (1, 4, 10, 14)


# --------------------------------------------------- HunyuanVideo / Wan2.1

def synth_hunyuan_state_dict(cfg, rng):
    """Reference hyvideo transformer key layout (models.py:541-620)."""
    core = cfg.core()
    h, mh = core.hidden_size, core.mlp_hidden
    hd = h // core.num_heads
    pt, ph, pw = cfg.patch_size
    sd = {}

    def lin(name, din, dout):
        sd[f'{name}.weight'] = rng.standard_normal((dout, din)).astype(
            np.float32) * 0.02
        sd[f'{name}.bias'] = rng.standard_normal((dout,)).astype(
            np.float32) * 0.02

    sd['img_in.proj.weight'] = rng.standard_normal(
        (h, cfg.in_channels, pt, ph, pw)).astype(np.float32) * 0.02
    sd['img_in.proj.bias'] = np.zeros((h,), np.float32)
    lin('txt_in.input_embedder', cfg.text_dim, h)
    lin('txt_in.t_embedder.mlp.0', 256, h)
    lin('txt_in.t_embedder.mlp.2', h, h)
    lin('txt_in.c_embedder.linear_1', cfg.text_dim, h)
    lin('txt_in.c_embedder.linear_2', h, h)
    for i in range(2):
        p = f'txt_in.individual_token_refiner.blocks.{i}'
        lin(f'{p}.self_attn_qkv', h, 3 * h)
        lin(f'{p}.self_attn_proj', h, h)
        lin(f'{p}.mlp.fc1', h, 4 * h)
        lin(f'{p}.mlp.fc2', 4 * h, h)
        lin(f'{p}.adaLN_modulation.1', h, 2 * h)
        for n in ('norm1', 'norm2'):
            sd[f'{p}.{n}.weight'] = np.ones((h,), np.float32)
            sd[f'{p}.{n}.bias'] = np.zeros((h,), np.float32)
    lin('time_in.mlp.0', 256, h)
    lin('time_in.mlp.2', h, h)
    lin('vector_in.in_layer', cfg.vec_in_dim, h)
    lin('vector_in.out_layer', h, h)
    lin('guidance_in.mlp.0', 256, h)
    lin('guidance_in.mlp.2', h, h)
    for i in range(cfg.depth_double):
        p = f'double_blocks.{i}'
        lin(f'{p}.img_mod.linear', h, 6 * h)
        lin(f'{p}.txt_mod.linear', h, 6 * h)
        lin(f'{p}.img_attn_qkv', h, 3 * h)
        lin(f'{p}.txt_attn_qkv', h, 3 * h)
        for n in ('img_attn', 'txt_attn'):
            sd[f'{p}.{n}_q_norm.weight'] = np.ones((hd,), np.float32)
            sd[f'{p}.{n}_k_norm.weight'] = np.ones((hd,), np.float32)
        lin(f'{p}.img_attn_proj', h, h)
        lin(f'{p}.txt_attn_proj', h, h)
        lin(f'{p}.img_mlp.fc1', h, mh)
        lin(f'{p}.img_mlp.fc2', mh, h)
        lin(f'{p}.txt_mlp.fc1', h, mh)
        lin(f'{p}.txt_mlp.fc2', mh, h)
    for i in range(cfg.depth_single):
        p = f'single_blocks.{i}'
        lin(f'{p}.modulation.linear', h, 3 * h)
        lin(f'{p}.linear1', h, 3 * h + mh)
        lin(f'{p}.linear2', h + mh, h)
        sd[f'{p}.q_norm.weight'] = np.ones((hd,), np.float32)
        sd[f'{p}.k_norm.weight'] = np.ones((hd,), np.float32)
    lin('final_layer.adaLN_modulation.1', h, 2 * h)
    lin('final_layer.linear', h, pt * ph * pw * cfg.in_channels)
    return sd


def test_hunyuan_loader_tree_matches_init():
    from chipmunk_tpu.models.hunyuan import (HunyuanModelConfig,
                                             init_hunyuan_params)
    from chipmunk_tpu.models.loaders import load_hunyuan_params
    cfg = HunyuanModelConfig(latent_t=2, latent_h=8, latent_w=8,
                             hidden_size=128, num_heads=2, depth_double=2,
                             depth_single=2, axes_dim=(16, 24, 24),
                             txt_len=128, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    loaded = load_hunyuan_params(synth_hunyuan_state_dict(cfg, rng), cfg)
    ref = init_hunyuan_params(jax.random.PRNGKey(0), cfg)
    assert (jax.tree_util.tree_structure(loaded)
            == jax.tree_util.tree_structure(ref))
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(loaded),
            jax.tree_util.tree_leaves_with_path(ref)):
        assert a.shape == b.shape, (pa, a.shape, b.shape)


def test_hunyuan_loader_forward_runs():
    """Loaded weights drive a full forward (conv-as-linear patchify map
    and identity txt_in included)."""
    from chipmunk_tpu.config import config_from_dict
    from chipmunk_tpu.models.hunyuan import HunyuanModelConfig, HunyuanModel
    from chipmunk_tpu.models.loaders import load_hunyuan_params
    from chipmunk_tpu.models.flux import FluxStep
    cfg = HunyuanModelConfig(latent_t=2, latent_h=8, latent_w=8,
                             hidden_size=128, num_heads=2, depth_double=1,
                             depth_single=1, axes_dim=(16, 24, 24),
                             txt_len=128, dtype=jnp.float32)
    params = load_hunyuan_params(
        synth_hunyuan_state_dict(cfg, np.random.default_rng(1)), cfg)
    ck = config_from_dict({'attn': {'is_enabled': False},
                           'mlp': {'is_enabled': False}})
    m = HunyuanModel(cfg=cfg, ck=ck, use_kernels=False)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    lat = jax.random.normal(ks[0], (1, cfg.in_channels, 2, 8, 8),
                            jnp.float32)
    txt = jax.random.normal(ks[1], (1, cfg.txt_len, cfg.text_dim),
                            jnp.float32)
    y = jax.random.normal(ks[2], (1, cfg.vec_in_dim), jnp.float32)
    step = FluxStep(index=0, full_attn=True, full_mlp=True, colsum=False,
                    recompute_mlp_mask=False)
    out, _ = m.forward(params, lat, txt, jnp.full((1,), 0.5), y,
                       m.init_state(1), step,
                       guidance=jnp.full((1,), 4.0))
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()


def synth_wan_state_dict(cfg, rng):
    """Reference wan/modules/model.py:392-496 key layout."""
    d, f = cfg.dim, cfg.ffn_dim
    pt, ph, pw = cfg.patch_size
    sd = {}

    def lin(name, din, dout):
        sd[f'{name}.weight'] = rng.standard_normal((dout, din)).astype(
            np.float32) * 0.02
        sd[f'{name}.bias'] = rng.standard_normal((dout,)).astype(
            np.float32) * 0.02

    sd['patch_embedding.weight'] = rng.standard_normal(
        (d, cfg.in_channels, pt, ph, pw)).astype(np.float32) * 0.02
    sd['patch_embedding.bias'] = np.zeros((d,), np.float32)
    lin('text_embedding.0', cfg.text_dim, d)
    lin('text_embedding.2', d, d)
    lin('time_embedding.0', cfg.freq_dim, d)
    lin('time_embedding.2', d, d)
    lin('time_projection.1', d, 6 * d)
    for i in range(cfg.num_layers):
        p = f'blocks.{i}'
        sd[f'{p}.modulation'] = rng.standard_normal((1, 6, d)).astype(
            np.float32) * 0.02
        for n in ('q', 'k', 'v', 'o'):
            lin(f'{p}.self_attn.{n}', d, d)
            lin(f'{p}.cross_attn.{n}', d, d)
        for at in ('self_attn', 'cross_attn'):
            sd[f'{p}.{at}.norm_q.weight'] = np.ones((d,), np.float32)
            sd[f'{p}.{at}.norm_k.weight'] = np.ones((d,), np.float32)
        sd[f'{p}.norm3.weight'] = np.ones((d,), np.float32)
        sd[f'{p}.norm3.bias'] = np.zeros((d,), np.float32)
        lin(f'{p}.ffn.0', d, f)
        lin(f'{p}.ffn.2', f, d)
    sd['head.modulation'] = rng.standard_normal((1, 2, d)).astype(
        np.float32) * 0.02
    lin('head.head', d, pt * ph * pw * cfg.in_channels)
    return sd


def test_wan_loader_tree_matches_init():
    from chipmunk_tpu.models.wan import WanModelConfig, init_wan_params
    from chipmunk_tpu.models.loaders import load_wan_params
    cfg = WanModelConfig(latent_t=2, latent_h=8, latent_w=8, dim=128,
                         ffn_dim=256, num_heads=2, num_layers=2,
                         axes_dim=(22, 21, 21), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    loaded = load_wan_params(synth_wan_state_dict(cfg, rng), cfg)
    ref = init_wan_params(jax.random.PRNGKey(0), cfg)
    assert (jax.tree_util.tree_structure(loaded)
            == jax.tree_util.tree_structure(ref))
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(loaded),
            jax.tree_util.tree_leaves_with_path(ref)):
        assert a.shape == b.shape, (pa, a.shape, b.shape)
