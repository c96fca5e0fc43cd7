"""End-to-end FLUX-shaped model tests at tiny config on CPU (SURVEY.md §7.2
slice 3: prove the full 50-step plumbing before kernel work)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chipmunk_tpu.config import ChipmunkConfig, config_from_dict
from chipmunk_tpu.models import (FluxModelConfig, init_flux_params,
                                 FluxSparse)
from chipmunk_tpu.models.sampling import FluxSampler, get_schedule


def tiny_setup(steps=6, sparse=True, skip=()):
    model = FluxModelConfig(
        in_channels=16, vec_in_dim=32, context_in_dim=32, hidden_size=128,
        num_heads=2, mlp_ratio=4.0, depth=2, depth_single_blocks=2,
        axes_dim=(16, 24, 24), guidance_embed=False, txt_len=128,
        dtype=jnp.float32)
    ck = config_from_dict({
        'steps': steps,
        'attn': {'top_keys': 0.4, 'kv_block': 32, 'counts_multiple_of': 32,
                 'first_n_dense_layers': 1, 'full_step_every': 3,
                 'is_enabled': sparse, 'should_compress_indices': False,
                 'recompute_mask': True, 'mbm': 128},
        'mlp': {'top_keys': 0.5, 'neuron_block': 32, 'counts_multiple_of': 32,
                'first_n_dense_layers': 1, 'full_step_every': 3,
                'is_enabled': sparse},
        'patchify': {'chunk_size_1': 4, 'chunk_size_2': 2},
        'step_caching': {'is_enabled': bool(skip),
                         'skip_step_schedule': set(skip)},
    })
    h_img, w_img = 16, 24  # 384 img tokens; seq = 128 + 384 = 512
    seq = model.txt_len + h_img * w_img
    sp = FluxSparse.build(ck, model, seq, use_kernels=False)
    sampler = FluxSampler(cfg=model, ck=ck, sp=sp, h_img=h_img, w_img=w_img)
    params = init_flux_params(jax.random.PRNGKey(0), model)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (1, h_img * w_img, 16))
    txt = jax.random.normal(ks[1], (1, 128, 32))
    y = jax.random.normal(ks[2], (1, 32))
    return sampler, params, img, txt, y


def test_flux_denoise_runs_and_is_finite():
    sampler, params, img, txt, y = tiny_setup()
    ts = get_schedule(6, 384, shift=False)
    out = sampler.denoise(params, img, txt, y, ts)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def test_flux_sparse_close_to_dense():
    """Sparse-pipeline output should track the dense model closely — the
    quality-parity smoke test (real acceptance is ImageReward/VBench,
    SURVEY.md §7.3)."""
    sampler_s, params, img, txt, y = tiny_setup(sparse=True)
    sampler_d, _, _, _, _ = tiny_setup(sparse=False)
    ts = get_schedule(6, 384, shift=False)
    out_s = sampler_s.denoise(params, img, txt, y, ts)
    out_d = sampler_d.denoise(params, img, txt, y, ts)
    denom = np.abs(np.asarray(out_d)).mean()
    rel = np.abs(np.asarray(out_s) - np.asarray(out_d)).mean() / denom
    assert rel < 0.15, rel


def test_flux_step_caching_skips():
    calls = []
    sampler, params, img, txt, y = tiny_setup(skip=(2, 4))
    ts = get_schedule(6, 384, shift=False)
    out = sampler.denoise(params, img, txt, y, ts,
                          callback=lambda i, skipped: calls.append(
                              (i, skipped)))
    assert [c[1] for c in calls] == [False, False, True, False, True, False]
    assert np.isfinite(np.asarray(out)).all()


def test_flux_patchify_consistency():
    """Patchify must round-trip through the sampler exactly (dense model:
    token order is irrelevant to attention without sparsity but RoPE must
    be permuted consistently)."""
    sampler_p, params, img, txt, y = tiny_setup(sparse=False)
    sampler_n, _, _, _, _ = tiny_setup(sparse=False)
    sampler_n.use_patchify = False
    ts = get_schedule(2, 384, shift=False)
    out_p = sampler_p.denoise(params, img, txt, y, ts)
    out_n = sampler_n.denoise(params, img, txt, y, ts)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_n),
                               atol=2e-3, rtol=2e-3)


def test_flux_batch2_matches_two_singles():
    """MLP caches fold batch into the token axis: a B=2 sparse run must
    equal two independent B=1 runs (CFG correctness)."""
    import jax
    from chipmunk_tpu.models.flux import flux_forward, FluxStep, FluxSparse
    from chipmunk_tpu.models import init_flux_params, FluxModelConfig
    from chipmunk_tpu.config import config_from_dict

    model = FluxModelConfig(
        in_channels=16, vec_in_dim=32, context_in_dim=32, hidden_size=128,
        num_heads=2, mlp_ratio=4.0, depth=1, depth_single_blocks=1,
        axes_dim=(16, 24, 24), guidance_embed=False, txt_len=128,
        dtype=jnp.float32)
    ck = config_from_dict({
        'attn': {'top_keys': 0.4, 'kv_block': 32, 'counts_multiple_of': 32,
                 'first_n_dense_layers': 0, 'should_compress_indices': False},
        'mlp': {'top_keys': 0.5, 'neuron_block': 32, 'counts_multiple_of': 32,
                'first_n_dense_layers': 0, 'random_keys': 0.0},
    })
    h_img, w_img = 16, 24
    seq = model.txt_len + h_img * w_img
    params = init_flux_params(jax.random.PRNGKey(0), model)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    img = jax.random.normal(ks[0], (2, h_img * w_img, 16))
    txt = jax.random.normal(ks[1], (2, 128, 32))
    y = jax.random.normal(ks[2], (2, 32))
    t = jnp.full((2,), 0.7)
    from chipmunk_tpu.models.flux import flux_rope_ids
    from chipmunk_tpu.models.layers import build_rope
    pe2 = build_rope(flux_rope_ids(2, h_img, w_img, 128), model.axes_dim,
                     model.theta)
    pe1 = build_rope(flux_rope_ids(1, h_img, w_img, 128), model.axes_dim,
                     model.theta)

    def run(img, txt, y, t, B):
        sp = FluxSparse.build(ck, model, seq, batch=B, use_kernels=False)
        st = sp.init_state(model, B)
        key = jax.random.PRNGKey(7)
        # step 0 full, step 1 colsum, step 2 sparse
        p0, st = flux_forward(params, model, sp, img, txt, t, y,
                              pe2 if B == 2 else pe1, st,
                              FluxStep(0, True, True, False, False), key=key)
        p1, st = flux_forward(params, model, sp, img, txt, t, y,
                              pe2 if B == 2 else pe1, st,
                              FluxStep(1, True, False, True, False), key=key)
        p2, st = flux_forward(params, model, sp, img, txt, t, y,
                              pe2 if B == 2 else pe1, st,
                              FluxStep(2, False, False, False, True), key=key)
        return p2

    out2 = run(img, txt, y, t, 2)
    outa = run(img[:1], txt[:1], y[:1], t[:1], 1)
    outb = run(img[1:], txt[1:], y[1:], t[1:], 1)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(outa[0]),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out2[1]), np.asarray(outb[0]),
                               atol=2e-4, rtol=2e-4)


def test_flux_denoise_compiled_matches_loop():
    """The single-dispatch scanned loop must match the host loop exactly."""
    sampler, params, img, txt, y = tiny_setup(steps=6, skip=(3,))
    ts = get_schedule(6, 384, shift=False)
    out_loop = sampler.denoise(params, img, txt, y, ts,
                               key=jax.random.PRNGKey(3))
    out_comp = sampler.denoise_compiled(params, img, txt, y, ts,
                                        key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out_comp), np.asarray(out_loop),
                               atol=2e-4, rtol=2e-4)
