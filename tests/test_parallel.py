"""Multi-device (8 virtual CPU devices) tests for the Ulysses head-parallel
path — the coverage the reference cannot have without GPUs (SURVEY.md §4)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from chipmunk_tpu.parallel import (collect_tokens, collect_heads,
                                   ulysses_attention, make_mesh)
from chipmunk_tpu.config import AttnConfig
from chipmunk_tpu.modules import SparseDiffAttn


def test_collect_tokens_roundtrip():
    mesh = make_mesh({'sp': 4})
    B, H, S, D = 1, 8, 64, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D))

    def rt(x):
        return collect_heads(collect_tokens(x, 'sp'), 'sp')

    out = jax.shard_map(rt, mesh=mesh,
                        in_specs=P(None, None, 'sp', None),
                        out_specs=P(None, None, 'sp', None))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_collect_tokens_layout():
    """After collect_tokens each device holds the full sequence for its
    head shard (reference head_parallel.py:42-87 semantics)."""
    mesh = make_mesh({'sp': 4})
    B, H, S, D = 1, 4, 16, 2
    x = jnp.arange(B * H * S * D, dtype=jnp.float32).reshape(B, H, S, D)

    def probe(xl):
        xg = collect_tokens(xl, 'sp')  # [B, 1, S, D] local
        return xg

    out = jax.shard_map(probe, mesh=mesh,
                        in_specs=P(None, None, 'sp', None),
                        out_specs=P(None, 'sp', None, None))(x)
    # global result should equal x exactly (heads gathered across devices)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_ulysses_sparse_attention_matches_single_device():
    mesh = make_mesh({'sp': 4})
    B, H, S, D = 1, 8, 512, 32
    cfg = AttnConfig(top_keys=0.4, kv_block=32, counts_multiple_of=32,
                     random_keys=0.0, should_compress_indices=False)
    mod = SparseDiffAttn.build(cfg, S, use_kernels=False)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D)) for kk in ks)
    st = mod.init_state(B, H, D, jnp.float32)

    def full_then_sparse(q, k, v, st):
        o1, st = mod(q, k, v, st, step_index=0, is_full=True,
                     is_colsum=False, layer_is_dense=False)
        o2, st = mod(q, k, v, st, step_index=1, is_full=True, is_colsum=True,
                     layer_is_dense=False, key=jax.random.PRNGKey(5))
        o3, st = mod(q, k, v, st, step_index=2, is_full=False,
                     is_colsum=False, layer_is_dense=False)
        return o3, st

    # single device reference
    o_ref, _ = full_then_sparse(q, k, v, st)
    # ulysses: same computation, heads sharded — PRNG key is per-call
    # identical so per-head results must agree exactly
    o_par, _ = ulysses_attention(mesh, 'sp', full_then_sparse, q, k, v, st)
    np.testing.assert_allclose(np.asarray(o_par), np.asarray(o_ref),
                               atol=1e-4, rtol=1e-4)


def test_flux_forward_with_ulysses_matches_single():
    """Model-level Ulysses: flux_forward with head-parallel attention over a
    4-way mesh equals the unsharded run (deterministic top-k config)."""
    import jax.numpy as jnp
    from chipmunk_tpu.models.flux import (flux_forward, FluxStep, FluxSparse,
                                          flux_rope_ids)
    from chipmunk_tpu.models import init_flux_params, FluxModelConfig
    from chipmunk_tpu.models.layers import build_rope
    from chipmunk_tpu.config import config_from_dict

    model = FluxModelConfig(
        in_channels=16, vec_in_dim=32, context_in_dim=32, hidden_size=256,
        num_heads=4, mlp_ratio=2.0, depth=1, depth_single_blocks=1,
        axes_dim=(16, 24, 24), guidance_embed=False, txt_len=128,
        dtype=jnp.float32)
    ck = config_from_dict({
        'attn': {'top_keys': 0.4, 'kv_block': 32, 'counts_multiple_of': 32,
                 'first_n_dense_layers': 0,
                 'should_compress_indices': False},
        'mlp': {'is_enabled': False},
    })
    h_img, w_img = 16, 24
    seq = model.txt_len + h_img * w_img
    params = init_flux_params(jax.random.PRNGKey(0), model)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (1, h_img * w_img, 16))
    txt = jax.random.normal(ks[1], (1, 128, 32))
    y = jax.random.normal(ks[2], (1, 32))
    t = jnp.full((1,), 0.7)
    pe = build_rope(flux_rope_ids(1, h_img, w_img, 128), model.axes_dim,
                    model.theta)
    key = jax.random.PRNGKey(7)

    def steps(sp):
        st = sp.init_state(model, 1)
        outs = []
        for fs in [FluxStep(0, True, True, False, False),
                   FluxStep(1, True, False, True, False),
                   FluxStep(2, False, False, False, False)]:
            p, st = flux_forward(params, model, sp, img, txt, t, y, pe, st,
                                 fs, key=key)
            outs.append(p)
        return outs

    sp0 = FluxSparse.build(ck, model, seq, use_kernels=False)
    ref = steps(sp0)
    mesh = make_mesh({'sp': 4})
    spu = sp0.with_ulysses(mesh, 'sp')
    with mesh:
        par = steps(spu)
    for a, b in zip(ref, par):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_ring_attention_matches_dense():
    """Ring attention over an 8-device token-sharded mesh == dense
    reference (exact online softmax; parallel/ring.py)."""
    from chipmunk_tpu.parallel.ring import ring_attention
    from chipmunk_tpu.parallel.comm import make_mesh
    from chipmunk_tpu.ops import dense_attn_ref
    mesh = make_mesh({'ring': 8})
    B, H, S, D = 1, 4, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.float32) for kk in ks)
    o = ring_attention(mesh, 'ring', q, k, v)
    o_ref, _ = dense_attn_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               atol=2e-5, rtol=2e-5)


def test_usp_attention_matches_dense():
    """Ulysses x ring (2x4) == dense reference — the reference's xDiT USP
    composition (xdit_context_parallel.py:160-192), dense-only."""
    from chipmunk_tpu.parallel.ring import usp_attention
    from chipmunk_tpu.parallel.comm import make_mesh
    from chipmunk_tpu.ops import dense_attn_ref
    mesh = make_mesh({'sp': 2, 'ring': 4})
    B, H, S, D = 1, 4, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.float32) for kk in ks)
    o = usp_attention(mesh, 'sp', 'ring', q, k, v)
    o_ref, _ = dense_attn_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               atol=2e-5, rtol=2e-5)


def test_initialize_multihost_single_process():
    """Flag-gated DCN bring-up (parallel/comm.initialize_multihost): a
    single-process coordinator init must succeed and be idempotent.  Run
    in a subprocess — jax.distributed owns process-global state."""
    import subprocess, sys, os
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax\n"
        "from chipmunk_tpu.parallel.comm import initialize_multihost\n"
        "pid = initialize_multihost('localhost:12731', 1, 0)\n"
        "assert pid == 0, pid\n"
        "assert initialize_multihost('localhost:12731', 1, 0) == 0\n"
        "assert len(jax.devices()) >= 1\n"
        "print('MULTIHOST_OK', flush=True)\n"
        "os._exit(0)\n")  # skip the coordinator's noisy grpc shutdown
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('XLA_FLAGS', None)
    r = subprocess.run([sys.executable, '-c', code], capture_output=True,
                       text=True, timeout=300, env=env,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert 'MULTIHOST_OK' in r.stdout, (r.stdout, r.stderr[-2000:])


def test_sharded_sampler_matches_single_device():
    """FluxSampler.sharded(mesh, sp, dp): the user-facing multi-device
    denoise must match the single-device result (Ulysses attention +
    dp CFG batch + sharded chipmunk state end-to-end)."""
    import numpy as np
    from jax.sharding import Mesh
    from chipmunk_tpu.config import config_from_dict
    from chipmunk_tpu.models import (FluxModelConfig, init_flux_params,
                                     FluxSparse)
    from chipmunk_tpu.models.sampling import FluxSampler, get_schedule
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ('dp', 'sp'))
    heads = 8
    model = FluxModelConfig(
        in_channels=16, vec_in_dim=32, context_in_dim=32,
        hidden_size=64 * heads, num_heads=heads, mlp_ratio=2.0, depth=2,
        depth_single_blocks=2, axes_dim=(16, 24, 24), guidance_embed=False,
        txt_len=128, dtype=jnp.float32)
    h_img, w_img = 16, 16
    seq = model.txt_len + h_img * w_img
    ck = config_from_dict({
        'steps': 4,
        'attn': {'top_keys': 0.4, 'kv_block': 32, 'counts_multiple_of': 32,
                 'first_n_dense_layers': 1,
                 'should_compress_indices': False, 'random_keys': 0.0},
        'mlp': {'top_keys': 0.5, 'neuron_block': 32,
                'counts_multiple_of': 32, 'first_n_dense_layers': 1,
                'random_keys': 0.0},
        'patchify': {'chunk_size_1': 4, 'chunk_size_2': 2},
        'step_caching': {'is_enabled': False},
    })
    B = 2
    params = init_flux_params(jax.random.PRNGKey(0), model)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (B, h_img * w_img, 16), jnp.float32)
    txt = jax.random.normal(ks[1], (B, model.txt_len, 32), jnp.float32)
    y = jax.random.normal(ks[2], (B, 32), jnp.float32)
    ts = get_schedule(4, h_img * w_img)

    def build(sharded):
        sp = FluxSparse.build(ck, model, seq, batch=B, use_kernels=False)
        s = FluxSampler(cfg=model, ck=ck, sp=sp, h_img=h_img, w_img=w_img)
        return s.sharded(mesh, sp='sp', dp='dp') if sharded else s

    out1 = build(False).denoise(params, img, txt, y, ts,
                                key=jax.random.PRNGKey(3))
    out8 = build(True).denoise(params, img, txt, y, ts,
                               key=jax.random.PRNGKey(3))
    # random-mask keys are decorrelated per head shard, so selections
    # differ -> compare loosely; the dense layers and full steps dominate
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize('loop', ['host', 'compiled'])
def test_hunyuan_sharded_denoise_matches_single_device(loop):
    """HunyuanModel.sharded(mesh, sp, dp): multi-chip video denoise ==
    single-device (Ulysses head-parallel attention with head-sharded
    AttnState — the reference's actual multi-GPU use case,
    hyvideo/modules/head_parallel.py:42-115 + models.py:225-236) — for
    both the host loop and the single-dispatch lax.scan loop."""
    from jax.sharding import Mesh
    from chipmunk_tpu.config import config_from_dict
    from chipmunk_tpu.models.hunyuan import (HunyuanModelConfig,
                                             HunyuanModel,
                                             init_hunyuan_params)
    from chipmunk_tpu.models.video_sampling import (hunyuan_denoise,
                                                    hunyuan_denoise_compiled)
    from chipmunk_tpu.models.sampling import get_schedule
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    cfg = HunyuanModelConfig(
        latent_t=8, latent_h=8, latent_w=16, in_channels=4,
        patch_size=(1, 2, 2), hidden_size=256, num_heads=4, mlp_ratio=4.0,
        depth_double=2, depth_single=2, axes_dim=(16, 24, 24), theta=256,
        text_dim=64, txt_len=128, vec_in_dim=32, guidance_embed=False,
        voxel_shape=(4, 4, 8), dtype=jnp.float32)
    ck = config_from_dict({
        'steps': 4,
        'attn': {'top_keys': 0.3, 'kv_block': 32, 'counts_multiple_of': 32,
                 'random_keys': 0.0, 'local_voxels': 1,
                 'first_n_dense_layers': 1,
                 'full_step_schedule': [0, 1, 3],
                 'should_compress_indices': True, 'recompute_mask': True},
        'mlp': {'is_enabled': False},
        'step_caching': {'is_enabled': False},
    })
    B = 2
    params = init_hunyuan_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (B, 4, 8, 8, 16), jnp.float32)
    txt = jax.random.normal(ks[1], (B, 128, 64), jnp.float32)
    y = jax.random.normal(ks[2], (B, 32), jnp.float32)
    ts = get_schedule(4, cfg.img_len, shift=False)

    m1 = HunyuanModel(cfg=cfg, ck=ck, use_kernels=False)
    out1 = hunyuan_denoise(m1, params, lat, txt, y, ts,
                           key=jax.random.PRNGKey(3))
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ('dp', 'sp'))
    m8 = HunyuanModel(cfg=cfg, ck=ck, use_kernels=False
                      ).sharded(mesh, sp='sp', dp='dp')
    den = hunyuan_denoise if loop == 'host' else hunyuan_denoise_compiled
    out8 = den(m8, params, lat, txt, y, ts, key=jax.random.PRNGKey(3))
    # random_keys=0.0: top-k selection is deterministic, so the sharded
    # run computes the same math per head shard -> near-exact match
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1),
                               atol=1e-3, rtol=1e-3)


def test_wan_sharded_denoise_matches_single_device():
    """WanModel.sharded(mesh, sp): CFG video denoise head-parallel over
    4 devices == single-device (the reference's Wan multi-GPU is dense
    xDiT USP which bypasses chipmunk; here the sparse path is
    head-parallel)."""
    from chipmunk_tpu.config import config_from_dict
    from chipmunk_tpu.models.wan import (WanModelConfig, WanModel,
                                         init_wan_params)
    from chipmunk_tpu.models.video_sampling import wan_denoise
    from chipmunk_tpu.models.sampling import get_schedule
    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs 4 virtual devices")
    cfg = WanModelConfig(
        latent_t=4, latent_h=8, latent_w=16, in_channels=4,
        patch_size=(1, 2, 2), dim=256, ffn_dim=512, num_heads=4,
        num_layers=2, text_dim=64, txt_len=64, freq_dim=64,
        axes_dim=(16, 24, 24), voxel_shape=(4, 4, 8), dtype=jnp.float32)
    ck = config_from_dict({
        'steps': 4,
        'num_model_invocations_per_inference_step': 2,
        'attn': {'top_keys': 0.3, 'kv_block': 32, 'counts_multiple_of': 32,
                 'random_keys': 0.0, 'local_voxels': 1,
                 'first_n_dense_layers': 1,
                 'full_step_schedule': [0, 1, 3]},
        'mlp': {'is_enabled': True, 'top_keys': 0.5, 'neuron_block': 32,
                'counts_multiple_of': 32, 'first_n_dense_layers': 1,
                'full_step_every': 3, 'random_keys': 0.0},
        'step_caching': {'is_enabled': False},
    })
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (1, 4, 4, 8, 16), jnp.float32)
    ctx_c = jax.random.normal(ks[1], (1, 64, 64), jnp.float32)
    ctx_u = jax.random.normal(ks[2], (1, 64, 64), jnp.float32)
    ts = get_schedule(4, cfg.seq_len, shift=False)

    m1 = WanModel(cfg=cfg, ck=ck, use_kernels=False)
    out1 = wan_denoise(m1, params, lat, ctx_c, ctx_u, ts,
                       key=jax.random.PRNGKey(3))
    mesh = make_mesh({'sp': 4})
    m4 = WanModel(cfg=cfg, ck=ck, use_kernels=False).sharded(mesh, sp='sp')
    out4 = wan_denoise(m4, params, lat, ctx_c, ctx_u, ts,
                       key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out4), np.asarray(out1),
                               atol=1e-3, rtol=1e-3)
