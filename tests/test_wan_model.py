"""Wan2.1-architecture model at tiny config on CPU: CFG dual-invocation
caches, cross-attention, text-free self-attention sequence."""
import jax
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.config import config_from_dict
from chipmunk_tpu.models.wan import (WanModelConfig, WanModel,
                                     init_wan_params)
from chipmunk_tpu.models.flux import FluxStep
from chipmunk_tpu.schedule import step_plan


def tiny_wan(sparse=True):
    cfg = WanModelConfig(
        latent_t=4, latent_h=8, latent_w=16, in_channels=4,
        patch_size=(1, 2, 2), dim=128, ffn_dim=512, num_heads=2,
        num_layers=2, text_dim=64, txt_len=64, freq_dim=64,
        axes_dim=(16, 24, 24), voxel_shape=(4, 4, 8), dtype=jnp.float32)
    ck = config_from_dict({
        'steps': 4,
        'num_model_invocations_per_inference_step': 2,
        'attn': {'top_keys': 0.3, 'kv_block': 32, 'counts_multiple_of': 32,
                 'random_keys': 0.0, 'local_voxels': 1,
                 'first_n_dense_layers': 1, 'is_enabled': sparse,
                 'full_step_schedule': [0, 1, 3]},
        'mlp': {'is_enabled': sparse, 'top_keys': 0.5, 'neuron_block': 32,
                'counts_multiple_of': 32, 'first_n_dense_layers': 1,
                'full_step_every': 3, 'random_keys': 0.0},
        'step_caching': {'is_enabled': False},
    })
    return WanModel(cfg=cfg, ck=ck, use_kernels=False)


def test_wan_cfg_denoise_loop():
    """Full CFG loop: cond + uncond invocations with separate caches
    (reference text2video.py:246-252)."""
    m = tiny_wan()
    params = init_wan_params(jax.random.PRNGKey(0), m.cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    lat = jax.random.normal(ks[0], (1, 4, 4, 8, 16), jnp.float32)
    ctx_c = jax.random.normal(ks[1], (1, 64, 64), jnp.float32)
    ctx_u = jax.random.normal(ks[2], (1, 64, 64), jnp.float32)
    st_c, st_u = m.init_cfg_states(1)
    plan = step_plan(m.ck)
    pe = m.rope(1)
    guide = 5.0
    for i, kind in enumerate(plan):
        t = jnp.full((1,), 1.0 - i / 4, jnp.float32)
        step = FluxStep.of(kind, i)
        p_c, st_c = m.forward(params, lat, ctx_c, t, st_c, step,
                              key=jax.random.PRNGKey(i), pe=pe)
        p_u, st_u = m.forward(params, lat, ctx_u, t, st_u, step,
                              key=jax.random.PRNGKey(i), pe=pe)
        pred = p_u + guide * (p_c - p_u)
        lat = lat - 0.25 * pred
        assert np.isfinite(np.asarray(lat)).all(), f"step {i}"
    # the two invocation states must have diverged (different contexts)
    d = np.abs(np.asarray(st_c.attn.out_cache)
               - np.asarray(st_u.attn.out_cache)).max()
    assert d > 0


def test_wan_sparse_close_to_dense():
    ms, md = tiny_wan(True), tiny_wan(False)
    params = init_wan_params(jax.random.PRNGKey(0), ms.cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    lat = jax.random.normal(ks[0], (1, 4, 4, 8, 16), jnp.float32)
    ctx = jax.random.normal(ks[1], (1, 64, 64), jnp.float32)
    st_s, st_d = ms.init_state(1), md.init_state(1)
    plan = step_plan(ms.ck)
    pe = ms.rope(1)
    lat_s = lat_d = lat
    for i, kind in enumerate(plan):
        t = jnp.full((1,), 1.0 - i / 4, jnp.float32)
        step = FluxStep.of(kind, i)
        p_s, st_s = ms.forward(params, lat_s, ctx, t, st_s, step,
                               key=jax.random.PRNGKey(i), pe=pe)
        p_d, st_d = md.forward(params, lat_d, ctx, t, st_d, step,
                               key=jax.random.PRNGKey(i), pe=pe)
        lat_s = lat_s - 0.25 * p_s
        lat_d = lat_d - 0.25 * p_d
    denom = np.abs(np.asarray(lat_d)).mean()
    rel = np.abs(np.asarray(lat_s) - np.asarray(lat_d)).mean() / denom
    assert rel < 0.2, rel


def test_wan_compiled_loop_matches():
    from chipmunk_tpu.models.video_sampling import (wan_denoise,
                                                    wan_denoise_compiled)
    from chipmunk_tpu.models.sampling import get_schedule
    m = tiny_wan()
    params = init_wan_params(jax.random.PRNGKey(0), m.cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (1, 4, 4, 8, 16), jnp.float32)
    ctx_c = jax.random.normal(ks[1], (1, 64, 64), jnp.float32)
    ctx_u = jax.random.normal(ks[2], (1, 64, 64), jnp.float32)
    ts = get_schedule(4, m.cfg.seq_len, shift=False)
    out_l = wan_denoise(m, params, lat, ctx_c, ctx_u, ts,
                        key=jax.random.PRNGKey(5))
    out_c = wan_denoise_compiled(m, params, lat, ctx_c, ctx_u, ts,
                                 key=jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_l),
                               atol=2e-4, rtol=2e-4)
    # chunked dispatch threads the (latents, cache-state) carry across
    # windows; chunk=3 over 4 computed steps exercises the remainder
    # runner (windows of 3 + 1) — must match the single dispatch exactly
    # (same compiled step math, only the dispatch granularity differs)
    out_ck = wan_denoise_compiled(m, params, lat, ctx_c, ctx_u, ts,
                                  key=jax.random.PRNGKey(5), chunk=3)
    np.testing.assert_allclose(np.asarray(out_ck), np.asarray(out_c),
                               atol=1e-6, rtol=1e-6)


def test_wan_batch2_matches_two_singles():
    """Batched CFG generation: B=2 through the full wan_denoise loop must
    equal two independent B=1 runs (per-element caches for BOTH the cond
    and uncond invocation states)."""
    from chipmunk_tpu.models.video_sampling import wan_denoise
    m1 = tiny_wan()
    # batched model: MLP caches fold batch into the token axis, so the
    # module is built for B*seq tokens (static shapes — the TPU way)
    m2 = WanModel(cfg=m1.cfg, ck=m1.ck, use_kernels=False, batch=2)
    params = init_wan_params(jax.random.PRNGKey(0), m1.cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (2, 4, 4, 8, 16), jnp.float32)
    ctx_c = jax.random.normal(ks[1], (2, 64, 64), jnp.float32)
    ctx_u = jax.random.normal(ks[2], (2, 64, 64), jnp.float32)
    ts = jnp.linspace(1.0, 0.0, 5)
    key = jax.random.PRNGKey(5)
    out2 = wan_denoise(m2, params, lat, ctx_c, ctx_u, ts, key=key)
    outa = wan_denoise(m1, params, lat[:1], ctx_c[:1], ctx_u[:1], ts, key=key)
    outb = wan_denoise(m1, params, lat[1:], ctx_c[1:], ctx_u[1:], ts, key=key)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(outa[0]),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out2[1]), np.asarray(outb[0]),
                               atol=2e-4, rtol=2e-4)
