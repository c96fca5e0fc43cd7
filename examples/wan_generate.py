"""Wan2.1 text-to-video CLI (reference examples/wan/generate.py flow:
chipmunk yml + CFG generation with two model invocations per step,
text2video.py:239-252)."""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax

# Honor JAX_PLATFORMS even under the axon TPU-tunnel plugin, which
# force-sets jax_platforms at interpreter start (the env var alone is
# ignored there).  Lets CI / CPU smokes drive this CLI off-chip:
# JAX_PLATFORMS=cpu python examples/<cli>.py --tiny ...
import os as _os
if _os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', _os.environ['JAX_PLATFORMS'])
import jax.numpy as jnp

from chipmunk_tpu.config import load_config, ChipmunkConfig, config_from_dict
from chipmunk_tpu.models.wan import WanModelConfig, WanModel, init_wan_params
from chipmunk_tpu.models.video_sampling import wan_denoise, wan_denoise_compiled
from chipmunk_tpu.models.sampling import get_schedule


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--chipmunk-config', default=None)
    ap.add_argument('--size', nargs=2, type=int, default=[480, 832])
    ap.add_argument('--frames', type=int, default=81)
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--guide-scale', type=float, default=5.0)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--layers', type=int, default=30)
    ap.add_argument('--ckpt', default=None,
                    help='transformer .safetensors path (optional; random weights otherwise)')
    ap.add_argument('--vae', default=None,
                    help='Wan VAE checkpoint (.pth/.safetensors); decodes '
                         'latents to pixel frames (reference text2video.py '
                         'vae.decode step). Pass "random" to smoke the '
                         'decode path with synthesized weights.')
    ap.add_argument('--umt5', default=None,
                    help='UMT5-XXL encoder checkpoint (.pth/.safetensors; '
                         'reference models_t5_umt5-xxl-enc-bf16.pth)')
    ap.add_argument('--tokenizer', default=None,
                    help='umt5 tokenizer dir (google/umt5-xxl)')
    ap.add_argument('--prompt', default=None)
    ap.add_argument('--neg-prompt', default='',
                    help='negative prompt for the CFG uncond invocation '
                         '(reference sample_neg_prompt)')
    ap.add_argument('--tiny', action='store_true',
                    help='shrink dim/heads/ffn/txt for a CPU smoke run '
                         '(pipeline demo only; keeps head_dim=128)')
    ap.add_argument('--out', default='wan_latents.npy')
    ap.add_argument('--mesh', default=None,
                    help='multi-chip mesh, e.g. "sp=4": Ulysses '
                         'head-parallel sparse attention over sp '
                         '(reference head_parallel.py semantics; the '
                         'reference\'s own Wan multi-GPU is dense xDiT '
                         'USP which bypasses chipmunk).  num_heads must '
                         'be divisible by sp.')
    ap.add_argument('--loop', default='host', choices=['host', 'compiled'],
                    help='host = one jitted program per step kind; '
                         'compiled = the CFG loop as lax.scan dispatches '
                         '(fastest — with --chunk on runtimes that bound '
                         'single-program execution time; '
                         'results/bench_wan_chunked.log)')
    ap.add_argument('--chunk', type=int, default=None,
                    help='with --loop compiled: computed steps per scan '
                         'dispatch (None = the whole loop as one program; '
                         'small chunks suit runtimes that bound single-'
                         'program execution time while still amortizing '
                         'the per-step host dispatch residual)')
    args = ap.parse_args()

    ck = (load_config(args.chipmunk_config) if args.chipmunk_config
          else config_from_dict(
              {'num_model_invocations_per_inference_step': 2}))
    ck = ck.replace(steps=args.steps)

    # Wan has no streamed runner: 1.3B + chipmunk state fit resident on
    # one chip and streaming is a measured loss wherever residency fits
    # (BENCH_HUNYUAN.json xl-streamed).  Refuse silently-inert config.
    from chipmunk_tpu.utils.offload import OffloadPolicy
    policy = OffloadPolicy.from_config(ck.offloading)
    wanted = [n for n in ('attn_out_cache', 'attn_indices', 'attn_counts',
                          'mlp_out_cache', 'mlp_act_cache')
              if policy.enabled and policy.wants_host(n)]
    if wanted:
        print(f"WARNING: offloading keys {wanted} are ignored for Wan "
              f"(model fits resident; no streamed runner — see "
              f"configs/wan-chipmunk.yml note)", file=sys.stderr)

    h, w = args.size
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    tiny = (dict(dim=256, num_heads=2, ffn_dim=1024, txt_len=32)
            if args.tiny else {})
    cfg = WanModelConfig(
        latent_t=(args.frames - 1) // 4 + 1, latent_h=h // 8,
        latent_w=w // 8, num_layers=args.layers,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32, **tiny)
    model = WanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)
    if args.mesh:
        from hunyuan_generate import parse_mesh, build_mesh
        axes = parse_mesh(args.mesh)
        sp_n = axes.get('sp', 1)
        if cfg.num_heads % sp_n:
            raise SystemExit(f"num_heads={cfg.num_heads} not divisible "
                             f"by sp={sp_n}")
        mesh = build_mesh(axes)
        model = model.sharded(mesh, sp='sp',
                              dp='dp' if 'dp' in axes else None)
        print(f"mesh {dict(mesh.shape)}: Ulysses head-parallel attention "
              f"over sp={sp_n}, AttnState sharded per head shard")

    if args.ckpt:
        from chipmunk_tpu.models.loaders import load_wan_safetensors
        params = load_wan_safetensors(args.ckpt, cfg)
    else:
        params = init_wan_params(jax.random.PRNGKey(1), cfg)
    ks = jax.random.split(jax.random.PRNGKey(args.seed), 4)
    lat = jax.random.normal(ks[0], (1, cfg.in_channels, cfg.latent_t,
                                    cfg.latent_h, cfg.latent_w), cfg.dtype)
    if args.prompt and args.umt5 and args.tokenizer:
        # real prompts: UMT5-XXL embeddings for cond + negative (the
        # reference's T5EncoderModel call, wan/text2video.py:239-245)
        from chipmunk_tpu.models.video_encoders import WanTextEncoder
        enc = WanTextEncoder(args.umt5, args.tokenizer,
                             text_len=cfg.txt_len, dtype=cfg.dtype)
        ctx = enc.embed([args.prompt, args.neg_prompt])
        enc.release()      # drop encoder weights before the denoise loop
        ctx_c, ctx_u = ctx[:1].astype(cfg.dtype), ctx[1:].astype(cfg.dtype)
    else:
        if args.prompt:
            print("WARNING: --prompt given without --umt5/--tokenizer; "
                  "using zero embeddings", file=sys.stderr)
        ctx_c = jnp.zeros((1, cfg.txt_len, cfg.text_dim), cfg.dtype)
        ctx_u = jnp.zeros((1, cfg.txt_len, cfg.text_dim), cfg.dtype)
    ts = get_schedule(args.steps, cfg.seq_len, shift=False)

    t0 = time.perf_counter()
    # config-driven profiler gate (reference flux sampling.py:317:
    # should_profile AND generation_index >= 3; one generation per
    # process here, so the yml asks for a trace with both keys)
    from chipmunk_tpu.utils.profiling import profile_region
    if args.loop == 'compiled':
        def den(model, params, lat, ctx_c, ctx_u, ts, guide_scale, key):
            return wan_denoise_compiled(model, params, lat, ctx_c, ctx_u,
                                        ts, guide_scale=guide_scale,
                                        key=key, chunk=args.chunk)
    else:
        den = wan_denoise
    with profile_region('./profiles', enabled=ck.should_profile,
                        warmup_done=ck.generation_index >= 3):
        out = den(model, params, lat, ctx_c, ctx_u, ts,
                  guide_scale=args.guide_scale, key=ks[3])
        jax.block_until_ready(out)
    print(f"done in {time.perf_counter()-t0:.1f}s")
    import numpy as np
    if args.vae:
        from chipmunk_tpu.models.video_vae import (
            WanVaeConfig, wan_vae_decode, init_wan_vae_decoder, load_wan_vae)
        vcfg = WanVaeConfig()
        vp = (init_wan_vae_decoder(jax.random.PRNGKey(7), vcfg)
              if args.vae == 'random' else load_wan_vae(args.vae, vcfg))
        pix = wan_vae_decode(vp, out.astype(jnp.float32), vcfg)
        frames = np.asarray(jnp.clip((pix + 1.0) * 127.5, 0, 255)
                            ).astype(np.uint8)
        np.save(args.out, frames)
        print(f"pixels {frames.shape} -> {args.out}")
    else:
        np.save(args.out, np.asarray(out, np.float32))
        print(f"latents -> {args.out}")


if __name__ == '__main__':
    main()
