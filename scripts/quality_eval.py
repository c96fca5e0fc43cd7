"""Quality evaluation harness (VERDICT r1 item 5): end-to-end output
deviation of the chipmunk sparse pipeline vs the dense baseline over the
full 50-step schedule, measured on final latents (cosine similarity, PSNR,
relative L2).  No model weights / egress needed: deviation under matched
random weights and inputs bounds the numerical effect of each sparsity /
quantization knob.  (With real weights, ImageReward/VBench per reference
README.md:84-95 are the gold metrics; this harness measures the same
operating points.)

Usage:
  python scripts/quality_eval.py --model flux   [--steps 50] [--depth 4 8]
  python scripts/quality_eval.py --model hunyuan [--steps 50]

Prints one TSV row per ablation: name, cosine, psnr_db, rel_l2.
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import numpy as np
import jax
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass
import jax.numpy as jnp

from chipmunk_tpu.config import config_from_dict


def filter_only(ablations, args, aliases=None):
    """--only filter that FAILS LOUDLY on names matching no ablation
    (a silent skip hides typos and renames — ADVICE r3).  ``aliases``
    maps old names kept for CLI compatibility to current ones."""
    if not getattr(args, 'only', None):
        return ablations
    aliases = aliases or {}
    keep = {aliases.get(k, k) for k in args.only.split(',')}
    unknown = keep - set(ablations)
    if unknown:
        raise SystemExit(f"--only: unknown ablation names {sorted(unknown)}"
                         f"; available: {sorted(ablations)}")
    return {k: v for k, v in ablations.items() if k in keep}


def metrics(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    mse = float(np.mean((a - b) ** 2))
    rng = float(b.max() - b.min() + 1e-12)
    psnr = 10 * np.log10(rng * rng / (mse + 1e-20))
    rel = float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))
    return cos, psnr, rel


# ----------------------------------------------------------------- FLUX

def run_flux(args):
    from chipmunk_tpu.models import (FluxModelConfig, init_flux_params,
                                     FluxSparse)
    from chipmunk_tpu.models.sampling import FluxSampler, get_schedule
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    d, ds = args.depth
    model = FluxModelConfig(depth=d, depth_single_blocks=ds,
                            guidance_embed=True, dtype=dtype)
    h_img, w_img = 48, 80
    seq = model.txt_len + h_img * w_img
    params = init_flux_params(jax.random.PRNGKey(0), model)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (1, h_img * w_img, 64), dtype)
    txt = jax.random.normal(ks[1], (1, model.txt_len, 4096), dtype)
    y = jax.random.normal(ks[2], (1, 768), dtype)
    ts = get_schedule(args.steps, h_img * w_img)

    def denoise(ck, prm=None):
        sp = FluxSparse.build(ck, model, seq, use_kernels=on_tpu)
        sampler = FluxSampler(cfg=model, ck=ck, sp=sp, h_img=h_img,
                              w_img=w_img)
        out = sampler.denoise(prm if prm is not None else params,
                              img, txt, y, ts)
        return np.asarray(out.astype(jnp.float32))

    base_attn = {'top_keys': 0.165, 'full_step_every': 10,
                 'first_n_dense_layers': min(2, d),
                 'recompute_mask': False,
                 'should_compress_indices': False}
    base_mlp = {'top_keys': 0.3, 'full_step_every': 10,
                'block_mask_cache': 2,
                'first_n_dense_layers': min(2, d), 'bm': 512}
    dense_ck = config_from_dict({'steps': args.steps,
                                 'attn': {'is_enabled': False},
                                 'mlp': {'is_enabled': False},
                                 'step_caching': {'is_enabled': False}})
    ref = denoise(dense_ck)

    ablations = {
        'sparse-default(+stepcache)': {
            'attn': dict(base_attn), 'mlp': dict(base_mlp),
            'step_caching': {'is_enabled': True}},
        'sparse-no-stepcache': {
            'attn': dict(base_attn), 'mlp': dict(base_mlp),
            'step_caching': {'is_enabled': False}},
        'attn-only': {
            'attn': dict(base_attn), 'mlp': {'is_enabled': False},
            'step_caching': {'is_enabled': False}},
        'mlp-only': {
            'attn': {'is_enabled': False}, 'mlp': dict(base_mlp),
            'step_caching': {'is_enabled': False}},
        'kv_block=32': {
            'attn': dict(base_attn, kv_block=32, counts_multiple_of=32),
            'mlp': dict(base_mlp),
            'step_caching': {'is_enabled': True}},
        # coarser neuron selection granularity (the reference's own
        # counts_multiple_of=256); the r3 perf lever for bm<=256
        'neuron_block=256': {
            'attn': dict(base_attn),
            'mlp': dict(base_mlp, neuron_block=256),
            'step_caching': {'is_enabled': True}},
        'fp8-caches': {
            'attn': dict(base_attn, out_cache_dtype='float8_e4m3fn'),
            'mlp': dict(base_mlp, act_cache_dtype='float8_e4m3fn'),
            'step_caching': {'is_enabled': True}},
    }
    ablations = filter_only(ablations, args)
    print("name\tcosine\tpsnr_db\trel_l2", flush=True)
    for name, cfg in ablations.items():
        cfg = dict(cfg)
        cfg['steps'] = args.steps
        t0 = time.perf_counter()
        out = denoise(config_from_dict(cfg))
        cos, psnr, rel = metrics(out, ref)
        print(f"{name}\t{cos:.5f}\t{psnr:.1f}\t{rel:.4f}"
              f"\t({time.perf_counter()-t0:.0f}s)", flush=True)

    # fp8/int4 weight quantization deviation (dense pipeline, so the
    # number isolates weight storage, not sparsity)
    if getattr(args, 'only', None):
        return
    from chipmunk_tpu.utils.quant import quantize_flux_params, QuantSpec
    for name, spec in [
            ('weights-fp8(dense)', QuantSpec()),
            ('weights-int4attn-fp8mlp(dense)',
             QuantSpec(attn='int4', mod='int4', mlp_sparse='fp8',
                       mlp_dense='fp8'))]:
        qp = quantize_flux_params(params, spec)
        out = denoise(dense_ck, prm=qp)
        cos, psnr, rel = metrics(out, ref)
        print(f"{name}\t{cos:.5f}\t{psnr:.1f}\t{rel:.4f}", flush=True)


# ------------------------------------------------- FLUX full-depth (19+38)

def run_flux_full(args):
    """Quality at the exact headline operating point of bench.py: FULL
    depth (19+38, 11.9B params), quantized weight residency (int4
    attn/mod + int8 sparse-MLP + int4 dense-MLP), fp8 act/out caches,
    bm=512, step caching.  Dense reference uses the SAME quantized
    weights, so every row isolates the sparsity/caching knobs, exactly
    like bench.py's speedup comparison (and the reference's
    torch.compile-vs-chipmunk one, /root/reference/README.md:93-95)."""
    from chipmunk_tpu.models import FluxModelConfig, FluxSparse
    from chipmunk_tpu.models.sampling import FluxSampler, get_schedule
    from chipmunk_tpu.utils.quant import (synth_quantized_flux_params,
                                          QuantSpec)
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    d, ds = 19, 38
    model = FluxModelConfig(depth=d, depth_single_blocks=ds,
                            guidance_embed=True, dtype=dtype)
    # --attn-quant int8: int4 attn weights are the largest isolated
    # deviation source (QUALITY.md 4+8 table); int8 costs ~2.6GiB more
    # residency — measure whether it fits + what it buys
    params = synth_quantized_flux_params(
        0, model, QuantSpec(attn=args.attn_quant, mod=args.attn_quant,
                            mlp_sparse='int8', mlp_dense='int4'))
    h_img, w_img = 48, 80
    seq = model.txt_len + h_img * w_img
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (1, h_img * w_img, 64), dtype)
    txt = jax.random.normal(ks[1], (1, model.txt_len, 4096), dtype)
    y = jax.random.normal(ks[2], (1, 768), dtype)
    ts = get_schedule(args.steps, h_img * w_img)

    def denoise(ck):
        sp = FluxSparse.build(ck, model, seq, use_kernels=on_tpu)
        sampler = FluxSampler(cfg=model, ck=ck, sp=sp, h_img=h_img,
                              w_img=w_img)
        out = sampler.denoise(params, img, txt, y, ts)
        return np.asarray(out.astype(jnp.float32))

    nd = 2
    attn = {'top_keys': 0.165, 'full_step_every': 10,
            'first_n_dense_layers': nd, 'recompute_mask': False,
            'should_compress_indices': False,
            'out_cache_dtype': 'float8_e4m3fn'}
    mlp = {'top_keys': 0.3, 'full_step_every': 10, 'block_mask_cache': 2,
           'first_n_dense_layers': nd, 'bm': 512,
           'act_cache_dtype': 'float8_e4m3fn',
           'out_cache_dtype': 'float8_e4m3fn'}
    dense_ck = config_from_dict({'steps': args.steps,
                                 'attn': {'is_enabled': False},
                                 'mlp': {'is_enabled': False},
                                 'step_caching': {'is_enabled': False}})
    t0 = time.perf_counter()
    ref = denoise(dense_ck)
    print(f"# dense ref done ({time.perf_counter()-t0:.0f}s)", flush=True)

    ablations = {
        'full-headline(+stepcache)': {
            'attn': dict(attn), 'mlp': dict(mlp),
            'step_caching': {'is_enabled': True}},
        'full-no-stepcache': {
            'attn': dict(attn), 'mlp': dict(mlp),
            'step_caching': {'is_enabled': False}},
        # int8-activation sparse MLP (mlp.int8_act, kernels/csp_mlp.py a8):
        # the MXU 2x-int8-rate lever on top of the int8 sparse weights
        'full-headline+int8act': {
            'attn': dict(attn), 'mlp': dict(mlp, int8_act=True),
            'step_caching': {'is_enabled': True}},
        'full-bf16-caches(+stepcache)': {
            'attn': {k: v for k, v in attn.items()
                     if k != 'out_cache_dtype'},
            'mlp': {k: v for k, v in mlp.items()
                    if not k.endswith('cache_dtype')},
            'step_caching': {'is_enabled': True}},
    }
    ablations = filter_only(ablations, args)
    print("name\tcosine\tpsnr_db\trel_l2", flush=True)
    for name, cfg in ablations.items():
        cfg = dict(cfg)
        cfg['steps'] = args.steps
        t0 = time.perf_counter()
        try:
            out = denoise(config_from_dict(cfg))
        except Exception as e:
            print(f"{name}\tFAILED({type(e).__name__})", flush=True)
            continue
        cos, psnr, rel = metrics(out, ref)
        print(f"{name}\t{cos:.5f}\t{psnr:.1f}\t{rel:.4f}"
              f"\t({time.perf_counter()-t0:.0f}s)", flush=True)


# --------------------------------------------------------------- Hunyuan

def run_hunyuan(args):
    from chipmunk_tpu.models.hunyuan import (HunyuanModelConfig,
                                             HunyuanModel,
                                             init_hunyuan_params)
    from chipmunk_tpu.models.video_sampling import hunyuan_denoise
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = HunyuanModelConfig(latent_t=6, latent_h=32, latent_w=56,
                             depth_double=args.depth[0],
                             depth_single=args.depth[1], dtype=dtype)
    params = init_hunyuan_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (1, 16, cfg.latent_t, cfg.latent_h,
                                    cfg.latent_w), dtype)
    txt = jax.random.normal(ks[1], (1, 256, 4096), dtype)
    y = jax.random.normal(ks[2], (1, 768), dtype)
    ts = jnp.linspace(1.0, 0.0, args.steps + 1)

    def denoise(ck):
        m = HunyuanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)
        out = hunyuan_denoise(m, params, lat, txt, y, ts,
                              key=jax.random.PRNGKey(7))
        return np.asarray(out.astype(jnp.float32))

    dense = {'steps': args.steps, 'attn': {'is_enabled': False},
             'mlp': {'is_enabled': False},
             'step_caching': {'is_enabled': False}}
    ref = denoise(config_from_dict(dense))
    base_attn = {'top_keys': 0.05, 'random_keys': 0.01, 'local_voxels': 3,
                 'first_n_dense_layers': 2,
                 'full_step_schedule': [0, 1, 10, 40],
                 'should_compress_indices': True, 'recompute_mask': True}
    ablations = {
        'hunyuan-default(frac0.25)': dict(max_selected_frac=0.25),
        'frac-uncapped(1.0)': dict(max_selected_frac=1.0),
        'kv_block=32': dict(max_selected_frac=0.25, kv_block=32,
                            counts_multiple_of=32),
    }
    print("name\tcosine\tpsnr_db\trel_l2", flush=True)
    for name, extra in ablations.items():
        ck = config_from_dict({
            'steps': args.steps,
            'attn': dict(base_attn, **extra),
            'mlp': {'is_enabled': False},
            'step_caching': {'is_enabled': True}})
        t0 = time.perf_counter()
        out = denoise(ck)
        cos, psnr, rel = metrics(out, ref)
        print(f"{name}\t{cos:.5f}\t{psnr:.1f}\t{rel:.4f}"
              f"\t({time.perf_counter()-t0:.0f}s)", flush=True)


# ------------------------------------------------------------------- Wan

def run_wan(args):
    """Wan2.1 operating point (configs/wan-chipmunk.yml: attention-only
    top_keys=0.1, local_voxels=3, full_step_schedule {0,1,10,40},
    recompute_mask, CFG dual-invocation = 2 model invocations/step with
    separate cond/uncond cache states) at reduced depth; dense reference
    under the identical CFG loop."""
    from chipmunk_tpu.config import load_config
    from chipmunk_tpu.models.wan import (WanModelConfig, WanModel,
                                         init_wan_params)
    from chipmunk_tpu.models.video_sampling import wan_denoise
    from chipmunk_tpu.models.sampling import get_schedule
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    # default latent = the REAL Wan2.1-1.3B grid (21,60,104 -> seq 32,760)
    # so the static-mask selection fraction matches the operating point
    # (at toy grids the local-voxel cube covers most of the sequence and
    # flatters sparse quality); depth is the reduced proxy dimension
    lt, lh, lw = args.latent if args.latent else (21, 60, 104)
    cfg = WanModelConfig(latent_t=lt, latent_h=lh, latent_w=lw,
                         num_layers=args.depth[0] + args.depth[1],
                         dtype=dtype)
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (1, cfg.in_channels, cfg.latent_t,
                                    cfg.latent_h, cfg.latent_w), dtype)
    ctx_c = jax.random.normal(ks[1], (1, cfg.txt_len, cfg.text_dim), dtype)
    ctx_u = jax.random.normal(ks[2], (1, cfg.txt_len, cfg.text_dim), dtype)
    ts = get_schedule(args.steps, cfg.seq_len, shift=False)

    def denoise(ck):
        m = WanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)
        out = wan_denoise(m, params, lat, ctx_c, ctx_u, ts,
                          key=jax.random.PRNGKey(7))
        return np.asarray(out.astype(jnp.float32))

    dense_ck = config_from_dict({
        'steps': args.steps,
        'num_model_invocations_per_inference_step': 2,
        'attn': {'is_enabled': False}, 'mlp': {'is_enabled': False},
        'step_caching': {'is_enabled': False}})
    ref = denoise(dense_ck)
    ship = load_config('configs/wan-chipmunk.yml').replace(steps=args.steps)
    # every row pins its FULL intent explicitly (ADVICE r4: rows that
    # implicitly inherited the shipped yml drifted when the yml moved to
    # lv3+fsched — labels no longer matched what ran).  Base = shipped
    # yml (lv=3, full_step_schedule {0,1,10,40}, 25-step skip schedule).
    ablations = {
        # the shipped operating point as-is
        'wan-shipped(lv3+fsched)': {},
        # ISOLATION rows (VERDICT r4 weak #2: the published table's rows
        # were identical because the step-caching deviation floor masks
        # the csp contribution):
        #  - csp alone, no step caching: the lv3 sparse-attention
        #    deviation as its own recorded number
        'csp-only(no-step-cache)': {'step_caching': {'is_enabled': False}},
        #  - step caching alone, attention dense: the skip-schedule
        #    deviation floor
        'skip-only(attn-off)': {'attn': {'is_enabled': False}},
        # knob sweeps around the shipped point (lv3+fsched base pinned)
        'lv3+fsched+top_keys=0.05': {
            'attn': {'local_voxels': 3, 'top_keys': 0.05,
                     'full_step_schedule': {0, 1, 10, 40}}},
        'lv2+fsched': {
            'attn': {'local_voxels': 2,
                     'full_step_schedule': {0, 1, 10, 40}}},
        # VERDICT r4 #6 lever: freeze the mask after the step-1 selection
        # (reference FLUX runs fixed indices the whole run,
        # modules/attn.py:140-150) — steps 10/40 become plain full steps
        # (cache re-prime, no colsum pass)
        'lv3+fsched+norecompute': {
            'attn': {'local_voxels': 3, 'recompute_mask': False,
                     'full_step_schedule': {0, 1, 10, 40}}},
        # the PRE-r4 shipping point: lv=5 statically selects ~49% of KV
        # blocks at the real grid, trips the dense-fallback cost gate
        # (0.45), and runs every attention layer exact-dense — this row
        # measures the step-caching schedule alone under the reference
        # wan yml's full_step_every=10 (no explicit schedule)
        'lv5(dense-gated)+fse10': {
            'attn': {'local_voxels': 5, 'full_step_schedule': None,
                     'full_step_every': 10}},
    }
    ablations = filter_only(ablations, args,
                            aliases={'wan-shipped': 'wan-shipped(lv3+fsched)'})
    print("name\tcosine\tpsnr_db\trel_l2", flush=True)
    for name, extra in ablations.items():
        ck = config_from_dict(extra, ship) if extra else ship
        t0 = time.perf_counter()
        out = denoise(ck)
        cos, psnr, rel = metrics(out, ref)
        print(f"{name}\t{cos:.5f}\t{psnr:.1f}\t{rel:.4f}"
              f"\t({time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='flux',
                    choices=['flux', 'flux-full', 'hunyuan', 'wan'])
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--only', default=None,
                    help='comma list: run only these ablation names')
    ap.add_argument('--depth', type=int, nargs=2, default=[4, 8])
    ap.add_argument('--latent', type=int, nargs=3, default=None,
                    help='wan: latent (t,h,w); default 21 60 104 (the '
                         'real seq-32,760 grid)')
    ap.add_argument('--attn-quant', default='int4',
                    choices=['int4', 'int8'],
                    help='flux-full attn/mod weight storage')
    args = ap.parse_args()
    if args.model == 'flux':
        run_flux(args)
    elif args.model == 'flux-full':
        run_flux_full(args)
    elif args.model == 'wan':
        run_wan(args)
    else:
        run_hunyuan(args)
