"""Quantized weight residency (utils/quant.py): roundtrip accuracy, scan
compatibility, quantized flux params, and kernel parity with QTensor
weights + fp8 activation cache."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chipmunk_tpu.utils.quant import (QTensor, quantize, dequant,
                                      quantize_flux_params, QuantSpec,
                                      param_bytes)

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize('kind,tol', [('fp8', 0.04), ('int8', 0.005),
                                      ('int4', 0.08)])
def test_quant_roundtrip(kind, tol):
    w = jax.random.normal(KEY, (4, 64, 32)) * 0.3
    qt = quantize(w, kind, keep_axes=(0, 2),
                  pack_axis=1 if kind == 'int4' else None)
    wd = dequant(qt, jnp.float32)
    rel = float(jnp.abs(wd - w).max() / jnp.abs(w).max())
    assert rel < tol, (kind, rel)


def test_quant_scan_slicing():
    """Stacked QTensor params slice correctly under lax.scan (negative
    pack_axis survives the leading-axis removal)."""
    w = jax.random.normal(KEY, (4, 64, 32)) * 0.3
    qt = quantize(w, 'int4', keep_axes=(0, 2), pack_axis=1)

    def body(c, x):
        return c, dequant(x, jnp.float32).sum()

    _, sums = jax.lax.scan(body, 0, qt)
    np.testing.assert_allclose(np.asarray(sums),
                               np.asarray(dequant(qt, jnp.float32
                                                  ).sum(axis=(1, 2))),
                               rtol=1e-5)


def test_quantize_flux_params_shapes_and_size():
    from chipmunk_tpu.models import FluxModelConfig, init_flux_params
    cfg = FluxModelConfig(in_channels=16, vec_in_dim=32, context_in_dim=32,
                          hidden_size=128, num_heads=2, depth=2,
                          depth_single_blocks=2, axes_dim=(16, 24, 24),
                          guidance_embed=False, txt_len=128,
                          dtype=jnp.float32)
    params = init_flux_params(KEY, cfg)
    qp = quantize_flux_params(params, QuantSpec(attn='int4', mod='fp8',
                                                mlp_sparse='fp8',
                                                mlp_dense='int4'))
    assert isinstance(qp['double']['img_qkv']['w'], QTensor)
    assert qp['double']['img_qkv']['w'].pack_axis == -2
    assert isinstance(qp['single']['w1t'], QTensor)
    assert qp['single']['w1t'].q.dtype == jnp.float8_e4m3fn
    assert param_bytes(qp) < 0.55 * param_bytes(params)
    # dequantized matmul close to original
    w = params['single']['w1t'][0]
    wd = dequant(qp['single']['w1t'], jnp.float32)[0]
    assert float(jnp.abs(w - wd).max() / jnp.abs(w).max()) < 0.04


# fp8 is intentionally absent: the sparse kernels refuse fp8 QTensor
# weights (tests/test_kernels.py::test_csp_mlp_rejects_fp8_weights)
@pytest.mark.parametrize('wkind', ['int8'])
def test_csp_mlp_kernels_quantized_weights(wkind):
    """Kernel chain with QTensor weights matches the eager reference run
    on the dequantized weights (f32 cache isolates weight quantization)."""
    from chipmunk_tpu.kernels import csp_mlp
    from chipmunk_tpu.ops import mlp_ref
    T, C, N, bn, bm = 256, 128, 512, 128, 128
    ks = jax.random.split(KEY, 6)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    w1t = jax.random.normal(ks[1], (N, C)) * C ** -0.5
    b1 = jax.random.normal(ks[2], (N,)) * 0.1
    w2 = jax.random.normal(ks[3], (N, C)) * N ** -0.5
    act_cache = jax.random.normal(ks[4], (T, N), jnp.float32) * 0.1
    out_cache = jax.random.normal(ks[5], (T, C), jnp.float32) * 0.1
    M = T // bm
    inds = jnp.tile(jnp.asarray([[0, 2, 3]], jnp.int32), (M, 1))
    counts = jnp.full((M,), 3, jnp.int32)
    q1 = quantize(w1t, wkind, keep_axes=(0,))
    q2 = quantize(w2, wkind, keep_axes=(0,))
    new_out, new_act = csp_mlp(x, q1, b1, q2, act_cache, out_cache,
                               inds, counts, bn=bn, bm=bm, interpret=True)
    tinds = (inds[..., None] * bn + jnp.arange(bn)).reshape(M, -1)
    ref_out, ref_act = mlp_ref.csp_mlp_ref(
        x, dequant(q1, jnp.float32).T, b1, dequant(q2, jnp.float32),
        tinds.astype(jnp.int32), counts * bn,
        act_cache, out_cache, bm=bm,
        act=lambda z: jax.nn.gelu(z, approximate=True))
    np.testing.assert_allclose(np.asarray(new_out), np.asarray(ref_out),
                               atol=5e-3, rtol=5e-3)


def test_csp_mlp_fp8_act_cache_self_consistent():
    """With an fp8 act cache, the kernel quantizes the fresh activation
    FIRST and uses the quantized value in the delta, so out_cache tracks
    fc2(stored acts) exactly (no quantization drift across sparse steps)."""
    from chipmunk_tpu.kernels import csp_mlp
    F8 = jnp.float8_e4m3fn
    T, C, N, bn, bm = 128, 128, 256, 128, 128
    ks = jax.random.split(KEY, 6)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    w1t = jax.random.normal(ks[1], (N, C)) * C ** -0.5
    b1 = jnp.zeros((N,))
    w2 = jax.random.normal(ks[3], (N, C)) * N ** -0.5
    act_cache = (jax.random.normal(ks[4], (T, N)) * 0.1).astype(F8)
    out_cache = jax.random.normal(ks[5], (T, C), jnp.float32) * 0.1
    inds = jnp.asarray([[0, 1]], jnp.int32)
    counts = jnp.asarray([2], jnp.int32)
    new_out, new_act = csp_mlp(x, w1t, b1, w2, act_cache, out_cache,
                               inds, counts, bn=bn, bm=bm, interpret=True)
    assert new_act.dtype == F8
    act_full = jax.nn.gelu((x @ w1t.T).astype(jnp.float32),
                           approximate=True)
    act_q = act_full.astype(F8)  # what the kernel stores
    np.testing.assert_allclose(np.asarray(new_act.astype(jnp.float32)),
                               np.asarray(act_q.astype(jnp.float32)))
    delta = (act_q.astype(jnp.float32)
             - act_cache.astype(jnp.float32))  # quantize-then-delta
    ref_out = out_cache + delta @ w2
    np.testing.assert_allclose(np.asarray(new_out), np.asarray(ref_out),
                               atol=2e-3, rtol=2e-3)


def test_flux_forward_quantized_close_to_bf16():
    """Quantized-weights forward stays close to the unquantized forward."""
    from chipmunk_tpu.config import config_from_dict
    from chipmunk_tpu.models import (FluxModelConfig, init_flux_params,
                                     FluxSparse)
    from chipmunk_tpu.models.flux import flux_forward, FluxStep
    from chipmunk_tpu.models.sampling import FluxSampler
    cfg = FluxModelConfig(in_channels=16, vec_in_dim=32, context_in_dim=32,
                          hidden_size=128, num_heads=2, depth=2,
                          depth_single_blocks=2, axes_dim=(16, 24, 24),
                          guidance_embed=False, txt_len=128,
                          dtype=jnp.float32)
    ck = config_from_dict({
        'attn': {'is_enabled': False}, 'mlp': {'is_enabled': False}})
    h_img, w_img = 16, 24
    seq = cfg.txt_len + h_img * w_img
    sp = FluxSparse.build(ck, cfg, seq, use_kernels=False)
    params = init_flux_params(KEY, cfg)
    qparams = quantize_flux_params(params, QuantSpec())
    sampler = FluxSampler(cfg=cfg, ck=ck, sp=sp, h_img=h_img, w_img=w_img)
    pe = sampler.rope(1)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (1, h_img * w_img, 16), jnp.float32)
    txt = jax.random.normal(ks[1], (1, 128, 32), jnp.float32)
    y = jax.random.normal(ks[2], (1, 32), jnp.float32)
    t = jnp.full((1,), 0.7, jnp.float32)
    step = FluxStep(index=0, full_attn=True, full_mlp=True, colsum=False,
                    recompute_mlp_mask=False)
    st = sp.init_state(cfg, 1)
    p1, _ = flux_forward(params, cfg, sp, img, txt, t, y, pe, st, step)
    p2, _ = flux_forward(qparams, cfg, sp, img, txt, t, y, pe, st, step)
    ref = float(jnp.abs(p1).mean())
    err = float(jnp.abs(p1 - p2).mean())
    assert err < 0.1 * ref, (err, ref)


@pytest.mark.parametrize('kind', ['fp8', 'int8', 'int4'])
def test_quantize_host_matches_device(kind):
    """quantize_host (numpy) produces the same quantized values/scales as
    the device-side quantize()."""
    from chipmunk_tpu.utils.quant import quantize_host
    w = np.asarray(jax.random.normal(KEY, (6, 64, 32)) * 0.3)
    pack = 1 if kind == 'int4' else None
    qd = quantize(jnp.asarray(w), kind, keep_axes=(0, 2), pack_axis=pack)
    qh = quantize_host(w, kind, keep_axes=(0, 2), pack_axis=pack)
    assert qh.pack_axis == qd.pack_axis
    np.testing.assert_allclose(np.asarray(qh.scale), np.asarray(qd.scale),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dequant(qh, jnp.float32)),
        np.asarray(dequant(qd, jnp.float32)), rtol=1e-5, atol=1e-6)


def test_synth_quantized_params_forward_finite():
    """A synthesized quantized tree runs through flux_forward finitely."""
    from chipmunk_tpu.utils.quant import synth_quantized_flux_params
    from chipmunk_tpu.config import config_from_dict
    from chipmunk_tpu.models import FluxModelConfig, FluxSparse
    from chipmunk_tpu.models.flux import flux_forward, FluxStep
    from chipmunk_tpu.models.sampling import FluxSampler
    cfg = FluxModelConfig(in_channels=16, vec_in_dim=32, context_in_dim=32,
                          hidden_size=128, num_heads=2, depth=2,
                          depth_single_blocks=2, axes_dim=(16, 24, 24),
                          guidance_embed=False, txt_len=128,
                          dtype=jnp.float32)
    params = synth_quantized_flux_params(0, cfg)
    ck = config_from_dict({'attn': {'is_enabled': False},
                           'mlp': {'is_enabled': False}})
    h_img, w_img = 16, 24
    sp = FluxSparse.build(ck, cfg, cfg.txt_len + h_img * w_img,
                          use_kernels=False)
    sampler = FluxSampler(cfg=cfg, ck=ck, sp=sp, h_img=h_img, w_img=w_img)
    pe = sampler.rope(1)
    ks = jax.random.split(KEY, 3)
    img = jax.random.normal(ks[0], (1, h_img * w_img, 16), jnp.float32)
    txt = jax.random.normal(ks[1], (1, 128, 32), jnp.float32)
    y = jax.random.normal(ks[2], (1, 32), jnp.float32)
    st = sp.init_state(cfg, 1)
    step = FluxStep(index=0, full_attn=True, full_mlp=True, colsum=False,
                    recompute_mlp_mask=False)
    pred, _ = flux_forward(params, cfg, sp, img, txt,
                           jnp.full((1,), 0.5, jnp.float32), y, pe, st,
                           step)
    assert bool(jnp.isfinite(pred).all())
