"""FLUX image generation CLI.

Mirrors the reference's flux CLI flow (examples/flux/src/flux/cli.py:96-247):
load the chipmunk config from --chipmunk-config, round the resolution,
build the sparsity context, run the 50-step denoise loop, report timing.

Weights: pass --ckpt /path/to/flux1-dev.safetensors to run the real model
(loaded via chipmunk_tpu.models.loaders); without it a randomly initialized
model of the requested depth runs so the pipeline is exercisable on any
machine (text encoders / VAE are out of scope here — the reference vendors
T5/CLIP/AE; plug your own and pass embeddings in).
"""
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
from chipmunk_tpu.models import FluxModelConfig, init_flux_params, FluxSparse
from chipmunk_tpu.models.sampling import FluxSampler, get_schedule
from chipmunk_tpu.utils.profiling import profile_region, StepTimer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--chipmunk-config', default=None)
    ap.add_argument('--width', type=int, default=1280)
    ap.add_argument('--height', type=int, default=768)
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--guidance', type=float, default=4.0)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--t5', default=None,
                    help='local T5-XXL encoder dir (transformers Flax)')
    ap.add_argument('--clip', default=None,
                    help='local CLIP-L text dir (transformers Flax)')
    ap.add_argument('--ae', default=None,
                    help='local ae.safetensors for pixel decode')
    ap.add_argument('--prompt', default=None)
    ap.add_argument('--ckpt', default=None,
                    help='flux1-dev.safetensors path (optional)')
    ap.add_argument('--depth', type=int, default=19)
    ap.add_argument('--depth-single', type=int, default=38)
    ap.add_argument('--batch', type=int, default=1,
                    help='images per generation (batched serving; each '
                         'batch element gets independent noise and its '
                         'own sparsity selections/caches)')
    ap.add_argument('--profile', action='store_true')
    ap.add_argument('--tiny', action='store_true',
                    help='shrink hidden/heads/txt for a CPU smoke run '
                         '(pipeline demo only; keeps head_dim=128)')
    ap.add_argument('--out', default='flux_latents.npy')
    ap.add_argument('--loop', default='host', choices=['host', 'compiled'],
                    help='host = one jitted program per step kind (the '
                         'measured-fastest default: 11.6s vs 16.7s for the '
                         'single-dispatch scan at full depth, '
                         'results/bench_flux_compiled_sparse.log); '
                         'compiled = whole loop as one lax.scan dispatch')
    args = ap.parse_args()

    ck = (load_config(args.chipmunk_config) if args.chipmunk_config
          else ChipmunkConfig())
    ck = ck.replace(steps=args.steps)

    # round resolution so latent grid is patch/chunk aligned (reference
    # cli.py:167-168 rounds to multiples of 128 pixels)
    width = args.width - args.width % 128
    height = args.height - args.height % 128
    h_img, w_img = height // 16, width // 16

    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    tiny = (dict(hidden_size=256, num_heads=2, txt_len=128)
            if args.tiny else {})
    model = FluxModelConfig(
        depth=args.depth, depth_single_blocks=args.depth_single,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32, **tiny)
    seq = model.txt_len + h_img * w_img
    B = max(1, args.batch)
    # MLP caches fold batch into the token axis -> static shapes per B
    sp = FluxSparse.build(ck, model, seq, batch=B, use_kernels=on_tpu)
    sampler = FluxSampler(cfg=model, ck=ck, sp=sp, h_img=h_img, w_img=w_img,
                          use_patchify=ck.patchify.is_enabled)

    if args.ckpt:
        from chipmunk_tpu.models.loaders import load_flux_safetensors
        params = load_flux_safetensors(args.ckpt, model, ck=ck)
    else:
        print("no --ckpt given: using random weights (pipeline demo mode)")
        params = init_flux_params(jax.random.PRNGKey(1), model)
        if ck.mlp.is_fp8:
            # same contract as the checkpoint path: is_fp8 -> fp8 MLP
            # weight storage (reference quantize_fp8, flux util.py:349-350)
            from chipmunk_tpu.utils.quant import quantize_flux_params
            from chipmunk_tpu.modules.mlp_fp8 import quant_spec_for_is_fp8
            params = quantize_flux_params(params, quant_spec_for_is_fp8())

    key = jax.random.PRNGKey(args.seed)
    ks = jax.random.split(key, 3)
    img = jax.random.normal(ks[0], (B, h_img * w_img, 64), model.dtype)
    if args.prompt and args.t5 and args.clip:
        from chipmunk_tpu.models.encoders import TextEncoders
        enc = TextEncoders(t5_path=args.t5, clip_path=args.clip,
                           max_length=model.txt_len)
        # '|'-separated prompts fill the batch; the last one repeats
        prompts = [p.strip() for p in args.prompt.split('|')]
        if len(prompts) > B:
            print(f"WARNING: {len(prompts)} prompts but --batch {B}; "
                  f"dropping the last {len(prompts) - B}", file=sys.stderr)
        prompts = (prompts + [prompts[-1]] * B)[:B]
        txt, y_enc = enc.embed(prompts)
        enc.release()
        txt = txt.astype(model.dtype)
    else:
        txt = jnp.zeros((B, model.txt_len, 4096), model.dtype)
    if args.prompt and args.t5 and args.clip:
        y = y_enc.astype(model.dtype)
    else:
        y = jnp.zeros((B, 768), model.dtype)
    ts = get_schedule(args.steps, h_img * w_img)

    timer = StepTimer()
    # --profile traces unconditionally; the config keys follow the
    # reference gate exactly (flux sampling.py:317: should_profile AND
    # generation_index >= 3 — the yml asks for a trace by setting both,
    # generation_index standing in for the reference CLI's warmed-up
    # generation counter since this entry is one generation per process)
    prof_on = args.profile or ck.should_profile
    prof_warm = args.profile or ck.generation_index >= 3
    with profile_region('./profiles', enabled=prof_on,
                        warmup_done=prof_warm):
        with timer.span('denoise'):
            den = (sampler.denoise_compiled if args.loop == 'compiled'
                   else sampler.denoise)
            out = den(params, img, txt, y, ts,
                      guidance=args.guidance, key=ks[2])
            jax.block_until_ready(out)
    import numpy as np
    if args.ae:
        # latent tokens [1, S, 64] -> z [1, 16, H/8, W/8] (2x2 patches of
        # 16 channels, reference sampling.unpack) -> pixels
        from chipmunk_tpu.models.autoencoder import decode
        from chipmunk_tpu.models.loaders import load_ae_decoder_safetensors
        ae = load_ae_decoder_safetensors(args.ae)
        z = np.asarray(out, np.float32).reshape(B, h_img, w_img, 16, 2, 2)
        z = z.transpose(0, 3, 1, 4, 2, 5).reshape(B, 16, 2 * h_img,
                                                  2 * w_img)
        imgpx = decode(ae, jnp.asarray(z))
        pix = np.asarray(imgpx, np.float32)
        for bi in range(B):
            arr = pix[bi].transpose(1, 2, 0)
            arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
            stem = args.out.rsplit('.', 1)[0]
            png = f"{stem}.png" if B == 1 else f"{stem}_{bi}.png"
            try:
                from PIL import Image
                Image.fromarray(arr).save(png)
                print(f"image -> {png}")
            except Exception:
                np.save(png + '.npy', arr)
                print(f"image array -> {png}.npy")
    np.save(args.out, np.asarray(out, np.float32))
    timer.log()
    print(f"latents -> {args.out}  ({width}x{height}, {args.steps} steps)")


if __name__ == '__main__':
    main()
