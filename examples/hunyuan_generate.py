"""HunyuanVideo generation CLI (reference examples/hunyuan/sample_video.py
flow: load chipmunk yml, build model, denoise with full-step schedule +
step caching)."""
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

from chipmunk_tpu.config import load_config, ChipmunkConfig
from chipmunk_tpu.models.hunyuan import (HunyuanModelConfig, HunyuanModel,
                                         init_hunyuan_params)
from chipmunk_tpu.models.video_sampling import (hunyuan_denoise,
                                                hunyuan_denoise_compiled)
from chipmunk_tpu.models.sampling import get_schedule
from chipmunk_tpu.utils.offload import OffloadPolicy


def parse_mesh(spec: str) -> dict:
    """'sp=4,dp=2' -> {'sp': 4, 'dp': 2}."""
    axes = {}
    for part in spec.split(','):
        k, v = part.split('=')
        axes[k.strip()] = int(v)
    return axes


def build_mesh(axes: dict):
    """Mesh with dp outermost (DCN/slower axis) then sp (ICI)."""
    from chipmunk_tpu.parallel.comm import make_mesh
    ordered = {k: axes[k] for k in ('dp', 'sp') if k in axes}
    need = 1
    for v in ordered.values():
        need *= v
    if need > len(jax.devices()):
        raise SystemExit(f"--mesh needs {need} devices, have "
                         f"{len(jax.devices())}")
    return make_mesh(ordered)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--chipmunk-config', default=None)
    ap.add_argument('--video-size', nargs=2, type=int, default=[720, 1280])
    ap.add_argument('--video-length', type=int, default=129)
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--depth', type=int, default=20)
    ap.add_argument('--depth-single', type=int, default=40)
    ap.add_argument('--ckpt', default=None,
                    help='transformer .safetensors path (optional; random weights otherwise)')
    ap.add_argument('--vae', default=None,
                    help='causal-3D VAE .safetensors path; decodes latents '
                         'to pixel frames (reference sample_video.py decode '
                         'step). Pass "random" to smoke the decode path '
                         'with synthesized weights.')
    ap.add_argument('--llm', default=None,
                    help='LLaVA-LLaMA text encoder dir (FlaxLlamaModel-'
                         'loadable); with --clip + --prompt, encodes real '
                         'prompts (reference text_encoder type "llm")')
    ap.add_argument('--clip', default=None,
                    help='CLIP-L text encoder dir (pooled vector)')
    ap.add_argument('--prompt', default=None)
    ap.add_argument('--out', default='hunyuan_latents.npy')
    # multi-host (DCN) bring-up — the analogue of the reference's
    # torchrun launcher flags (run_sample_video_multigpu.sh:34-46).  On
    # TPU pods all three autodetect; pass explicitly elsewhere.
    ap.add_argument('--tiny', action='store_true',
                    help='shrink hidden/heads/txt for a CPU smoke run '
                         '(pipeline demo only; keeps head_dim=128)')
    ap.add_argument('--multihost', action='store_true')
    ap.add_argument('--coordinator', default=None)
    ap.add_argument('--num-processes', type=int, default=None)
    ap.add_argument('--process-id', type=int, default=None)
    ap.add_argument('--mesh', default=None,
                    help='multi-chip mesh, e.g. "sp=4" or "sp=4,dp=2": '
                         'Ulysses head-parallel attention over sp '
                         '(the reference\'s multi-GPU path for THIS '
                         'model, hyvideo/modules/head_parallel.py), '
                         'batch data-parallel over dp.  num_heads must '
                         'be divisible by sp.')
    ap.add_argument('--interactive', action='store_true',
                    help='persistent prompt loop reusing the compiled '
                         'sampler across generations (reference '
                         'sample_video.py:61-117)')
    ap.add_argument('--chunk', type=int, default=None,
                    help='computed steps per scan dispatch in the '
                         'compiled denoise loop (None = the whole loop '
                         'as one program; small chunks suit runtimes '
                         'that bound single-program execution time '
                         'while still amortizing the per-step host '
                         'dispatch residual)')
    args = ap.parse_args()

    if args.multihost:
        from chipmunk_tpu.parallel.comm import initialize_multihost
        pid = initialize_multihost(args.coordinator, args.num_processes,
                                   args.process_id)
        print(f"multihost: process {pid}/{jax.process_count()}, "
              f"{len(jax.devices())} global devices")

    ck = (load_config(args.chipmunk_config) if args.chipmunk_config
          else ChipmunkConfig())
    ck = ck.replace(steps=args.steps)
    if args.mesh and not args.chipmunk_config:
        # the implicit default offloads attn caches (reference hunyuan
        # yml); with a mesh the caches shard 1/sp per chip instead —
        # residency replaces offload (see --mesh + offloading error below)
        import dataclasses
        ck = ck.replace(offloading=dataclasses.replace(
            ck.offloading, global_disable_offloading=True))

    h, w = args.video_size
    lat_t = (args.video_length - 1) // 4 + 1
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    tiny = (dict(hidden_size=256, num_heads=2, txt_len=32)
            if args.tiny else {})
    cfg = HunyuanModelConfig(
        latent_t=lat_t, latent_h=h // 8, latent_w=w // 8,
        depth_double=args.depth, depth_single=args.depth_single,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32, **tiny)
    model = HunyuanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)
    if args.mesh:
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

    print("initializing params (pass real weights via loaders for "
          "production use)")
    if args.ckpt:
        from chipmunk_tpu.models.loaders import load_hunyuan_safetensors
        params = load_hunyuan_safetensors(args.ckpt, cfg)
    else:
        params = init_hunyuan_params(jax.random.PRNGKey(1), cfg)
    # text encoders: kept alive across prompts in --interactive mode
    # (the reference JIT-offloads them between uses, inference.py:234-249)
    enc = None
    if args.llm and args.clip:
        from chipmunk_tpu.models.video_encoders import HunyuanTextEncoders
        enc = HunyuanTextEncoders(llm_path=args.llm, clip_path=args.clip,
                                  max_length=cfg.txt_len + 95)

    def encode(prompt):
        if prompt and enc is not None:
            # real prompts: LLaVA-LLaMA template encode (skip-layer +
            # crop, reference text_encoder/__init__.py:306-333) + CLIP
            txt, txt_mask, y = enc.embed([prompt])
            return (txt[:, :cfg.txt_len].astype(cfg.dtype),
                    txt_mask[:, :cfg.txt_len], y.astype(cfg.dtype))
        if prompt:
            import sys as _sys
            print("WARNING: --prompt given without --llm/--clip; using "
                  "zero embeddings", file=_sys.stderr)
        return (jnp.zeros((1, cfg.txt_len, cfg.text_dim), cfg.dtype),
                None, jnp.zeros((1, cfg.vec_in_dim), cfg.dtype))

    ts = get_schedule(args.steps, cfg.img_len, shift=False)

    # honor the config's offloading block (reference hunyuan
    # chipmunk-config.yml offloads attn out_cache + indices;
    # models.py:796-828): per-layer caches live host-side and the layer
    # loop streams them through a PIPELINE_DEPTH=2 window
    policy = OffloadPolicy.from_config(ck.offloading)
    use_streamed = policy.enabled and any(
        policy.wants_host(n) for n in
        ('attn_out_cache', 'attn_indices', 'mlp_out_cache',
         'mlp_act_cache'))
    if use_streamed and args.mesh:
        raise SystemExit("--mesh and offloading are mutually exclusive: "
                         "the streamed runner has no mesh path (sharding "
                         "the caches over sp removes the HBM pressure "
                         "that offloading works around — drop the "
                         "offloading: block instead)")
    streamed = None
    if use_streamed:
        print("offloading config active -> streamed (host-offload) runner")
        streamed = model.make_streamed()

    import numpy as np
    vp = vcfg = None
    if args.vae:
        from chipmunk_tpu.models.video_vae import (
            HyVaeConfig, hunyuan_vae_decode, init_hunyuan_vae_decoder,
            load_hunyuan_vae_safetensors)
        vcfg = HyVaeConfig()
        vp = (init_hunyuan_vae_decoder(jax.random.PRNGKey(7), vcfg)
              if args.vae == 'random'
              else load_hunyuan_vae_safetensors(args.vae, vcfg))

    # config-driven profiler gate (reference flux sampling.py:317:
    # should_profile AND generation_index >= 3); the counter advances
    # per generation so an --interactive session warms the compile
    # caches on the first generations and traces the steady state
    from chipmunk_tpu.utils.profiling import profile_region
    gen_counter = {'i': ck.generation_index}

    def generate(prompt, seed, out_path):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        lat = jax.random.normal(
            ks[0], (1, cfg.in_channels, cfg.latent_t, cfg.latent_h,
                    cfg.latent_w), cfg.dtype)
        txt, txt_mask, y = encode(prompt)
        t0 = time.perf_counter()
        with profile_region('./profiles', enabled=ck.should_profile,
                            warmup_done=gen_counter['i'] >= 3):
            if streamed is not None:
                out = hunyuan_denoise(model, params, lat, txt, y, ts,
                                      key=ks[2], streamed=streamed,
                                      txt_mask=txt_mask)
            else:
                out = hunyuan_denoise_compiled(model, params, lat, txt, y,
                                               ts, key=ks[2],
                                               txt_mask=txt_mask,
                                               chunk=args.chunk)
            jax.block_until_ready(out)
        gen_counter['i'] += 1
        print(f"done in {time.perf_counter()-t0:.1f}s")
        if vp is not None:
            pix = hunyuan_vae_decode(vp, out.astype(jnp.float32), vcfg)
            # [-1,1] -> uint8 frames [B, 3, T, H, W]
            frames = np.asarray(jnp.clip((pix + 1.0) * 127.5, 0, 255)
                                ).astype(np.uint8)
            np.save(out_path, frames)
            print(f"pixels {frames.shape} -> {out_path}")
        else:
            np.save(out_path, np.asarray(out, np.float32))
            print(f"latents -> {out_path}")

    generate(args.prompt, args.seed, args.out)
    if args.interactive:
        # persistent prompt loop over the already-compiled sampler
        # (reference sample_video.py:61-117's Ray-actor prompt loop);
        # each generation reuses the cached jitted denoise — only the
        # text encode + denoise execute, no recompilation
        gen_i = 1
        stem = args.out.rsplit('.npy', 1)[0]
        while True:
            try:
                prompt = input("prompt> ").strip()
            except EOFError:
                break
            if not prompt or prompt in ('exit', 'quit'):
                break
            generate(prompt, args.seed + gen_i, f"{stem}_{gen_i}.npy")
            gen_i += 1


if __name__ == '__main__':
    main()
