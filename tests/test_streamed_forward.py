"""Streamed (host-offloaded, layer-chunked) forward == resident forward
(models/streamed.py; VERDICT r1 item 2).  Tolerance is ~float-ulp: the math
and keys are identical, but chunked programs fuse differently than the
monolithic one, so exact bit equality across XLA programs is not
guaranteed."""
import jax
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.config import config_from_dict
from chipmunk_tpu.models import (FluxModelConfig, init_flux_params,
                                 FluxSparse)
from chipmunk_tpu.models.flux import flux_forward, FluxStep
from chipmunk_tpu.models.sampling import FluxSampler
from chipmunk_tpu.models.streamed import (StreamedFluxRunner,
                                          StreamedFluxState)
from chipmunk_tpu.utils.offload import OffloadPolicy
from chipmunk_tpu.schedule import step_plan


def test_streamed_forward_matches_resident():
    cfg = FluxModelConfig(in_channels=16, vec_in_dim=32, context_in_dim=32,
                          hidden_size=128, num_heads=2, depth=4,
                          depth_single_blocks=4, axes_dim=(16, 24, 24),
                          guidance_embed=False, txt_len=128,
                          dtype=jnp.float32)
    ck = config_from_dict({
        'steps': 6,
        'attn': {'top_keys': 0.4, 'kv_block': 32, 'counts_multiple_of': 32,
                 'first_n_dense_layers': 1, 'full_step_schedule': [0, 1, 3],
                 'should_compress_indices': False, 'recompute_mask': True},
        'mlp': {'top_keys': 0.5, 'neuron_block': 32,
                'counts_multiple_of': 32, 'first_n_dense_layers': 1,
                'full_step_every': 3, 'block_mask_cache': 2},
        'step_caching': {'is_enabled': False},
    })
    h_img, w_img = 16, 24
    seq = cfg.txt_len + h_img * w_img
    sp = FluxSparse.build(ck, cfg, seq, use_kernels=False)
    params = init_flux_params(jax.random.PRNGKey(0), cfg)
    sampler = FluxSampler(cfg=cfg, ck=ck, sp=sp, h_img=h_img, w_img=w_img)
    pe = sampler.rope(1)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (1, h_img * w_img, 16), jnp.float32)
    txt = jax.random.normal(ks[1], (1, 128, 32), jnp.float32)
    y = jax.random.normal(ks[2], (1, 32), jnp.float32)

    # resident: multi-step run carrying state
    state = sp.init_state(cfg, 1)
    # streamed: offload EVERYTHING policy, 2 chunks per family
    policy = OffloadPolicy(attn_out_cache=True, attn_indices=True,
                           attn_counts=True, attn_lse=True,
                           mlp_out_cache=True, mlp_act_cache=True,
                           mlp_indices=True, mlp_counts=True,
                           mlp_bm_mid=True)
    runner = StreamedFluxRunner(cfg=cfg, sp=sp, n_chunks_double=2,
                                n_chunks_single=2)
    sst = StreamedFluxState.create(sp.init_state(cfg, 1), 2, 2, policy)

    plan = step_plan(ck)
    for i, kind in enumerate(plan[:5]):
        step = FluxStep.of(kind, i)
        t = jnp.full((1,), 1.0 - 0.1 * i, jnp.float32)
        key = jax.random.PRNGKey(100 + i)
        pred_r, state = flux_forward(params, cfg, sp, img, txt, t, y, pe,
                                     state, step, key=key)
        pred_s = runner.forward(params, sst, img, txt, t, y, pe, step,
                                key=key)
        np.testing.assert_allclose(np.asarray(pred_r),
                                   np.asarray(pred_s),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"step {i} diverged")
    # gathered streamed state equals resident state bit-for-bit
    gathered = sst.gather()
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(gathered)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-4, rtol=1e-3)


def test_streamed_partial_policy():
    """Only attn out_cache/indices host-side (the reference hunyuan
    default, chipmunk-config.yml offloading block) — still exact."""
    cfg = FluxModelConfig(in_channels=16, vec_in_dim=32, context_in_dim=32,
                          hidden_size=128, num_heads=2, depth=2,
                          depth_single_blocks=2, axes_dim=(16, 24, 24),
                          guidance_embed=False, txt_len=128,
                          dtype=jnp.float32)
    ck = config_from_dict({
        'steps': 4,
        'attn': {'top_keys': 0.4, 'kv_block': 32, 'counts_multiple_of': 32,
                 'first_n_dense_layers': 0, 'full_step_schedule': [0, 1],
                 'should_compress_indices': False, 'recompute_mask': False},
        'mlp': {'is_enabled': False},
        'step_caching': {'is_enabled': False},
    })
    h_img, w_img = 16, 24
    seq = cfg.txt_len + h_img * w_img
    sp = FluxSparse.build(ck, cfg, seq, use_kernels=False)
    params = init_flux_params(jax.random.PRNGKey(0), cfg)
    sampler = FluxSampler(cfg=cfg, ck=ck, sp=sp, h_img=h_img, w_img=w_img)
    pe = sampler.rope(1)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (1, h_img * w_img, 16), jnp.float32)
    txt = jax.random.normal(ks[1], (1, 128, 32), jnp.float32)
    y = jax.random.normal(ks[2], (1, 32), jnp.float32)
    state = sp.init_state(cfg, 1)
    policy = OffloadPolicy()   # reference default: attn out_cache + indices
    runner = StreamedFluxRunner(cfg=cfg, sp=sp, n_chunks_double=1,
                                n_chunks_single=2)
    sst = StreamedFluxState.create(sp.init_state(cfg, 1), 1, 2, policy)
    # placement: policy-selected leaves must carry the host memory kind
    # (on backends that have one; the CPU test backend may not)
    from chipmunk_tpu.utils.offload import _mem_kind_supported
    if _mem_kind_supported():
        attn0, mlp0 = sst.single[0]
        assert attn0.out_cache.sharding.memory_kind == 'pinned_host'
        assert attn0.lse.sharding.memory_kind != 'pinned_host'
    for i in range(3):
        step = FluxStep(index=i, full_attn=i < 2, full_mlp=True,
                        colsum=i == 1, recompute_mlp_mask=False)
        t = jnp.full((1,), 1.0 - 0.2 * i, jnp.float32)
        key = jax.random.PRNGKey(7 + i)
        pred_r, state = flux_forward(params, cfg, sp, img, txt, t, y, pe,
                                     state, step, key=key)
        pred_s = runner.forward(params, sst, img, txt, t, y, pe, step,
                                key=key)
        np.testing.assert_allclose(np.asarray(pred_r),
                                   np.asarray(pred_s),
                                   atol=1e-4, rtol=1e-4)


def test_hunyuan_denoise_streamed_matches_resident():
    """hunyuan_denoise with streamed=(runner, state) honoring the config's
    offloading block equals the resident sampler (VERDICT r1 item 2)."""
    from chipmunk_tpu.models.hunyuan import (HunyuanModelConfig,
                                             HunyuanModel,
                                             init_hunyuan_params)
    from chipmunk_tpu.models.video_sampling import hunyuan_denoise
    cfg = HunyuanModelConfig(
        latent_t=8, latent_h=8, latent_w=16, in_channels=4,
        patch_size=(1, 2, 2), hidden_size=128, num_heads=2, mlp_ratio=4.0,
        depth_double=2, depth_single=2, axes_dim=(16, 24, 24), theta=256,
        text_dim=64, txt_len=72, vec_in_dim=32, guidance_embed=False,
        voxel_shape=(4, 4, 8), dtype=jnp.float32)
    ck = config_from_dict({
        'steps': 5,
        'attn': {'top_keys': 0.3, 'kv_block': 32, 'counts_multiple_of': 32,
                 'random_keys': 0.0, 'local_voxels': 1,
                 'first_n_dense_layers': 1, 'full_step_schedule': [0, 1, 3],
                 'should_compress_indices': True, 'recompute_mask': True},
        'mlp': {'is_enabled': False},
        'step_caching': {'is_enabled': True, 'skip_step_schedule': [2]},
        # reference hunyuan offload set: attn out_cache + indices
        'offloading': {'attn.out_cache': True, 'attn.indices': True},
    })
    m = HunyuanModel(cfg=cfg, ck=ck, use_kernels=False)
    params = init_hunyuan_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (1, 4, 8, 8, 16), jnp.float32)
    txt = jax.random.normal(ks[1], (1, 72, 64), jnp.float32)
    y = jax.random.normal(ks[2], (1, 32), jnp.float32)
    ts = jnp.linspace(1.0, 0.0, 6)
    out_r = hunyuan_denoise(m, params, lat, txt, y, ts,
                            key=jax.random.PRNGKey(5))
    streamed = m.make_streamed(n_chunks_double=2, n_chunks_single=2)
    out_s = hunyuan_denoise(m, params, lat, txt, y, ts,
                            key=jax.random.PRNGKey(5), streamed=streamed)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_s),
                               atol=2e-4, rtol=2e-4)


def test_create_hostwise_matches_create():
    """create_hostwise (no full device FluxState materialization — the
    full-depth video state OOMs before the first offload otherwise)
    builds the identical chunked init state."""
    cfg = FluxModelConfig(in_channels=16, vec_in_dim=32, context_in_dim=32,
                          hidden_size=128, num_heads=2, depth=2,
                          depth_single_blocks=4, axes_dim=(16, 24, 24),
                          guidance_embed=False, txt_len=128,
                          dtype=jnp.float32)
    ck = config_from_dict({
        'steps': 4,
        'attn': {'top_keys': 0.4, 'kv_block': 32, 'counts_multiple_of': 32,
                 'first_n_dense_layers': 0, 'full_step_schedule': [0, 1],
                 'should_compress_indices': False, 'recompute_mask': False},
        'mlp': {'top_keys': 0.5, 'neuron_block': 32,
                'counts_multiple_of': 32, 'first_n_dense_layers': 0,
                'full_step_every': 2, 'block_mask_cache': 2},
        'step_caching': {'is_enabled': False},
    })
    seq = cfg.txt_len + 16 * 24
    sp = FluxSparse.build(ck, cfg, seq, use_kernels=False)
    policy = OffloadPolicy()
    a = StreamedFluxState.create(sp.init_state(cfg, 1), 2, 2, policy)
    b = StreamedFluxState.create_hostwise(sp, cfg, 1, 2, 2, policy)
    la, lb = (jax.tree_util.tree_leaves((s.double, s.single))
              for s in (a, b))
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert x.shape == y.shape and x.dtype == y.dtype, (x.shape,
                                                           y.shape)
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))


def test_hunyuan_streamed_honors_txt_mask():
    """The streamed branch must thread txt_mask to the masked text
    refiner exactly like the resident path (ADVICE r4 medium: it was
    silently dropped).  With a real padding mask the masked and
    unmasked refiners differ, so streamed-with-mask must match
    resident-with-mask and NOT match resident-without-mask."""
    from chipmunk_tpu.models.hunyuan import (HunyuanModelConfig,
                                             HunyuanModel,
                                             init_hunyuan_params)
    from chipmunk_tpu.models.video_sampling import hunyuan_denoise
    cfg = HunyuanModelConfig(
        latent_t=8, latent_h=8, latent_w=16, in_channels=4,
        patch_size=(1, 2, 2), hidden_size=128, num_heads=2, mlp_ratio=4.0,
        depth_double=2, depth_single=2, axes_dim=(16, 24, 24), theta=256,
        text_dim=64, txt_len=72, vec_in_dim=32, guidance_embed=False,
        voxel_shape=(4, 4, 8), dtype=jnp.float32)
    ck = config_from_dict({
        'steps': 3,
        'attn': {'top_keys': 0.3, 'kv_block': 32, 'counts_multiple_of': 32,
                 'random_keys': 0.0, 'local_voxels': 1,
                 'first_n_dense_layers': 1, 'full_step_schedule': [0, 1],
                 'should_compress_indices': True, 'recompute_mask': True},
        'mlp': {'is_enabled': False},
        'step_caching': {'is_enabled': False},
        'offloading': {'attn.out_cache': True, 'attn.indices': True},
    })
    m = HunyuanModel(cfg=cfg, ck=ck, use_kernels=False)
    params = init_hunyuan_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (1, 4, 8, 8, 16), jnp.float32)
    txt = jax.random.normal(ks[1], (1, 72, 64), jnp.float32)
    y = jax.random.normal(ks[2], (1, 32), jnp.float32)
    mask = jnp.arange(72)[None, :] < 40           # realistic padded prompt
    ts = jnp.linspace(1.0, 0.0, 4)
    out_masked = hunyuan_denoise(m, params, lat, txt, y, ts,
                                 key=jax.random.PRNGKey(5), txt_mask=mask)
    out_unmasked = hunyuan_denoise(m, params, lat, txt, y, ts,
                                   key=jax.random.PRNGKey(5))
    streamed = m.make_streamed(n_chunks_double=2, n_chunks_single=2)
    out_s = hunyuan_denoise(m, params, lat, txt, y, ts,
                            key=jax.random.PRNGKey(5), streamed=streamed,
                            txt_mask=mask)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_masked),
                               atol=2e-4, rtol=2e-4)
    assert np.abs(np.asarray(out_masked)
                  - np.asarray(out_unmasked)).max() > 1e-4
