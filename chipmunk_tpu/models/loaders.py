"""Checkpoint loading: BFL FLUX safetensors -> chipmunk_tpu param pytrees.

Rebuilds the reference's weight-loading path (examples/flux/src/flux/
util.py:320-358: load_sft + sparsify) — except "sparsify" here is pure
layout transformation done at load time: single-block linear1/linear2 are
split into qkv/fc1/o_proj/fc2 (what SingleStreamBlock.sparsify does to the
live module, layers.py:239-291), and MLP weights are stored output-major
for the sparse kernels.

Torch Linear stores [out, in]; our ``linear()`` uses [in, out] — hence the
transposes below.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .flux import FluxModelConfig


def _t(w):
    return jnp.asarray(np.asarray(w)).T


def _a(w):
    return jnp.asarray(np.asarray(w))


def _lin(sd, name, dtype, bias=True):
    p = {'w': _t(sd[f'{name}.weight']).astype(dtype)}
    if bias and f'{name}.bias' in sd:
        p['b'] = _a(sd[f'{name}.bias']).astype(dtype)
    return p


def _embedder(sd, name, dtype):
    return {'in': _lin(sd, f'{name}.in_layer', dtype),
            'out': _lin(sd, f'{name}.out_layer', dtype)}


def load_flux_params(state_dict: Dict[str, Any],
                     cfg: FluxModelConfig, ck=None) -> Dict:
    """Convert a BFL FLUX state dict (tensor name -> array) to our param
    pytree.  Accepts numpy / torch tensors / jnp arrays as values.

    ``ck`` (optional ChipmunkConfig): when ``ck.mlp.is_fp8`` is set the
    MLP weights are stored as fp8 QTensors — the load-time analogue of
    the reference's ``quantize_fp8(model)`` swap (flux util.py:349-350,
    src/chipmunk/modules/mlp_fp8.py:352-400).  Quantization happens
    host-side (see utils/quant.quantize_host for why) and the sparse
    kernels / ``SparseDiffMlp`` consume the QTensors directly."""
    dt = cfg.dtype
    h, mh = cfg.hidden_size, cfg.mlp_hidden
    sd = state_dict
    is_fp8 = bool(ck is not None and ck.mlp.is_fp8)

    def mlpw(arr, sparse=True):
        """Output-major [N, C] MLP weight -> QTensor under is_fp8.
        Sparse-kernel-consumed weights store int8 (same bytes as fp8,
        ~free converts — fp8 QTensors in csp_mlp are a measured perf
        trap, see modules/mlp_fp8.quant_spec_for_is_fp8); dense txt MLPs
        store true fp8."""
        if not is_fp8:
            return jnp.asarray(np.asarray(arr)).astype(dt)
        from ..utils.quant import quantize_host
        return quantize_host(np.asarray(arr), 'int8' if sparse else 'fp8',
                             keep_axes=(0,))

    def dbl(i):
        p = f'double_blocks.{i}'
        return {
            'img_mod': _lin(sd, f'{p}.img_mod.lin', dt),
            'txt_mod': _lin(sd, f'{p}.txt_mod.lin', dt),
            'img_qkv': _lin(sd, f'{p}.img_attn.qkv', dt),
            'txt_qkv': _lin(sd, f'{p}.txt_attn.qkv', dt),
            'img_qnorm': _a(sd[f'{p}.img_attn.norm.query_norm.scale']
                            ).astype(dt),
            'img_knorm': _a(sd[f'{p}.img_attn.norm.key_norm.scale']
                            ).astype(dt),
            'txt_qnorm': _a(sd[f'{p}.txt_attn.norm.query_norm.scale']
                            ).astype(dt),
            'txt_knorm': _a(sd[f'{p}.txt_attn.norm.key_norm.scale']
                            ).astype(dt),
            'img_proj': _lin(sd, f'{p}.img_attn.proj', dt),
            'txt_proj': _lin(sd, f'{p}.txt_attn.proj', dt),
            # MLP: torch [out, in]; w1t wants [N, C] = fc1 as stored
            'img_w1t': mlpw(sd[f'{p}.img_mlp.0.weight']),
            'img_b1': _a(sd[f'{p}.img_mlp.0.bias']).astype(dt),
            'img_w2': mlpw(np.asarray(sd[f'{p}.img_mlp.2.weight']).T),
            'img_b2': _a(sd[f'{p}.img_mlp.2.bias']).astype(dt),
            'txt_w1t': mlpw(sd[f'{p}.txt_mlp.0.weight'], sparse=False),
            'txt_b1': _a(sd[f'{p}.txt_mlp.0.bias']).astype(dt),
            'txt_w2': mlpw(np.asarray(sd[f'{p}.txt_mlp.2.weight']).T,
                           sparse=False),
            'txt_b2': _a(sd[f'{p}.txt_mlp.2.bias']).astype(dt),
        }

    def sgl(i):
        p = f'single_blocks.{i}'
        w1 = np.asarray(sd[f'{p}.linear1.weight'])   # [3h+mh, h]
        b1 = np.asarray(sd[f'{p}.linear1.bias'])
        w2 = np.asarray(sd[f'{p}.linear2.weight'])   # [h, h+mh]
        b2 = np.asarray(sd[f'{p}.linear2.bias'])
        return {
            'mod': _lin(sd, f'{p}.modulation.lin', dt),
            # the sparsify split (reference layers.py:239-291)
            'qkv': {'w': jnp.asarray(w1[:3 * h].T).astype(dt),
                    'b': jnp.asarray(b1[:3 * h]).astype(dt)},
            'w1t': mlpw(w1[3 * h:]),
            'b1': jnp.asarray(b1[3 * h:]).astype(dt),
            'o_proj': {'w': jnp.asarray(w2[:, :h].T).astype(dt),
                       'b': jnp.asarray(b2).astype(dt)},
            'w2': mlpw(w2[:, h:].T),
            'qnorm': _a(sd[f'{p}.norm.query_norm.scale']).astype(dt),
            'knorm': _a(sd[f'{p}.norm.key_norm.scale']).astype(dt),
        }

    def stack(n, fn):
        import jax
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[fn(i) for i in range(n)])

    params = {
        'img_in': _lin(sd, 'img_in', dt),
        'txt_in': _lin(sd, 'txt_in', dt),
        'time_in': _embedder(sd, 'time_in', dt),
        'vector_in': _embedder(sd, 'vector_in', dt),
        'double': stack(cfg.depth, dbl),
        'single': stack(cfg.depth_single_blocks, sgl),
        'final_mod': _lin(sd, 'final_layer.adaLN_modulation.1', dt),
        'final_proj': _lin(sd, 'final_layer.linear', dt),
    }
    if cfg.guidance_embed and 'guidance_in.in_layer.weight' in sd:
        params['guidance_in'] = _embedder(sd, 'guidance_in', dt)
    return params


def load_flux_safetensors(path: str, cfg: FluxModelConfig, ck=None) -> Dict:
    """Load FLUX weights from a .safetensors file (reference util.py:
    340-346 load_sft).  ``ck.mlp.is_fp8`` engages fp8 MLP weight storage
    (see load_flux_params)."""
    from safetensors import safe_open
    sd = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)
    return load_flux_params(sd, cfg, ck=ck)


# ------------------------------------------------------------ HunyuanVideo

def load_hunyuan_params(state_dict: Dict[str, Any], cfg) -> Dict:
    """Convert a HunyuanVideo transformer state dict (reference
    hyvideo/modules/models.py:541-620 layout) to our param pytree
    (models/hunyuan.init_hunyuan_params).  Key facts encoded here:

      * img_in is a Conv3d PatchEmbed with stride == kernel == patch_size
        (embed_layers.py PatchEmbed) — identical to a linear over patches
        flattened in (C, pt, ph, pw) order, which is exactly
        HunyuanModel.patchify_video's feature order.
      * txt_in is the SingleTokenRefiner (token_refiner.py:164-240):
        input_embedder / t_embedder / c_embedder / 2 refiner blocks with
        affine norms and adaLN gates -> our 'refiner' subtree.  The core
        model's txt_in linear (a FLUX-ism) is set to identity.
      * double blocks: img/txt attn qkv+proj with per-head RMSNorm
        scales, fc1/fc2 MLPs (models.py:63-133); single blocks: fused
        linear1/linear2 split exactly like FLUX (models.py:311-341).
      * final_layer: adaLN_modulation.1 emits (shift, scale)
        (mlp_layers.py:114-116) — same order as our flux_final.
    """
    import jax
    dt = cfg.dtype
    core = cfg.core()
    h, mh = core.hidden_size, core.mlp_hidden
    sd = state_dict

    def dbl(i):
        p = f'double_blocks.{i}'
        return {
            'img_mod': _lin(sd, f'{p}.img_mod.linear', dt),
            'txt_mod': _lin(sd, f'{p}.txt_mod.linear', dt),
            'img_qkv': _lin(sd, f'{p}.img_attn_qkv', dt),
            'txt_qkv': _lin(sd, f'{p}.txt_attn_qkv', dt),
            'img_qnorm': _a(sd[f'{p}.img_attn_q_norm.weight']).astype(dt),
            'img_knorm': _a(sd[f'{p}.img_attn_k_norm.weight']).astype(dt),
            'txt_qnorm': _a(sd[f'{p}.txt_attn_q_norm.weight']).astype(dt),
            'txt_knorm': _a(sd[f'{p}.txt_attn_k_norm.weight']).astype(dt),
            'img_proj': _lin(sd, f'{p}.img_attn_proj', dt),
            'txt_proj': _lin(sd, f'{p}.txt_attn_proj', dt),
            'img_w1t': _a(sd[f'{p}.img_mlp.fc1.weight']).astype(dt),
            'img_b1': _a(sd[f'{p}.img_mlp.fc1.bias']).astype(dt),
            'img_w2': _t(sd[f'{p}.img_mlp.fc2.weight']).astype(dt),
            'img_b2': _a(sd[f'{p}.img_mlp.fc2.bias']).astype(dt),
            'txt_w1t': _a(sd[f'{p}.txt_mlp.fc1.weight']).astype(dt),
            'txt_b1': _a(sd[f'{p}.txt_mlp.fc1.bias']).astype(dt),
            'txt_w2': _t(sd[f'{p}.txt_mlp.fc2.weight']).astype(dt),
            'txt_b2': _a(sd[f'{p}.txt_mlp.fc2.bias']).astype(dt),
        }

    def sgl(i):
        p = f'single_blocks.{i}'
        w1 = np.asarray(sd[f'{p}.linear1.weight'])   # [3h+mh, h]
        b1 = np.asarray(sd[f'{p}.linear1.bias'])
        w2 = np.asarray(sd[f'{p}.linear2.weight'])   # [h, h+mh]
        b2 = np.asarray(sd[f'{p}.linear2.bias'])
        return {
            'mod': _lin(sd, f'{p}.modulation.linear', dt),
            'qkv': {'w': jnp.asarray(w1[:3 * h].T).astype(dt),
                    'b': jnp.asarray(b1[:3 * h]).astype(dt)},
            'w1t': jnp.asarray(w1[3 * h:]).astype(dt),
            'b1': jnp.asarray(b1[3 * h:]).astype(dt),
            'o_proj': {'w': jnp.asarray(w2[:, :h].T).astype(dt),
                       'b': jnp.asarray(b2).astype(dt)},
            'w2': jnp.asarray(w2[:, h:].T).astype(dt),
            'qnorm': _a(sd[f'{p}.q_norm.weight']).astype(dt),
            'knorm': _a(sd[f'{p}.k_norm.weight']).astype(dt),
        }

    def stack(n, fn):
        import jax
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[fn(i) for i in range(n)])

    conv = np.asarray(sd['img_in.proj.weight'])      # [h, C, pt, ph, pw]
    rp = 'txt_in.individual_token_refiner.blocks'
    refiner = {
        'in': _lin(sd, 'txt_in.input_embedder', dt),
        't_embed': {'in': _lin(sd, 'txt_in.t_embedder.mlp.0', dt),
                    'out': _lin(sd, 'txt_in.t_embedder.mlp.2', dt)},
        'c_embed': {'in': _lin(sd, 'txt_in.c_embedder.linear_1', dt),
                    'out': _lin(sd, 'txt_in.c_embedder.linear_2', dt)},
        'blocks': [
            {
                'qkv': _lin(sd, f'{rp}.{i}.self_attn_qkv', dt),
                'proj': _lin(sd, f'{rp}.{i}.self_attn_proj', dt),
                'fc1': _lin(sd, f'{rp}.{i}.mlp.fc1', dt),
                'fc2': _lin(sd, f'{rp}.{i}.mlp.fc2', dt),
                'gate': _lin(sd, f'{rp}.{i}.adaLN_modulation.1', dt),
                'norm1_w': _a(sd[f'{rp}.{i}.norm1.weight']).astype(dt),
                'norm1_b': _a(sd[f'{rp}.{i}.norm1.bias']).astype(dt),
                'norm2_w': _a(sd[f'{rp}.{i}.norm2.weight']).astype(dt),
                'norm2_b': _a(sd[f'{rp}.{i}.norm2.bias']).astype(dt),
            } for i in range(2)
        ],
    }
    params = {
        'img_in': {'w': jnp.asarray(conv.reshape(conv.shape[0], -1).T
                                    ).astype(dt),
                   'b': _a(sd['img_in.proj.bias']).astype(dt)},
        # the refiner already outputs hidden-size tokens; the core FLUX
        # txt_in projection has no reference counterpart -> identity
        'txt_in': {'w': jnp.eye(h, dtype=dt), 'b': jnp.zeros((h,), dt)},
        'time_in': {'in': _lin(sd, 'time_in.mlp.0', dt),
                    'out': _lin(sd, 'time_in.mlp.2', dt)},
        'vector_in': {'in': _lin(sd, 'vector_in.in_layer', dt),
                      'out': _lin(sd, 'vector_in.out_layer', dt)},
        'double': stack(cfg.depth_double, dbl),
        'single': stack(cfg.depth_single, sgl),
        'final_mod': _lin(sd, 'final_layer.adaLN_modulation.1', dt),
        'final_proj': _lin(sd, 'final_layer.linear', dt),
        'refiner': refiner,
    }
    if cfg.guidance_embed and 'guidance_in.mlp.0.weight' in sd:
        params['guidance_in'] = {'in': _lin(sd, 'guidance_in.mlp.0', dt),
                                 'out': _lin(sd, 'guidance_in.mlp.2', dt)}
    return params


def load_hunyuan_safetensors(path: str, cfg) -> Dict:
    """Load HunyuanVideo transformer weights from .safetensors
    (reference hyvideo/inference.py:177-258 from_pretrained path)."""
    from safetensors import safe_open
    sd = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)
    return load_hunyuan_params(sd, cfg)


# ------------------------------------------------------------------- Wan2.1

def load_wan_params(state_dict: Dict[str, Any], cfg) -> Dict:
    """Convert a Wan2.1 T2V state dict (reference wan/modules/model.py:
    392-496 layout) to our param pytree (models/wan.init_wan_params).

      * patch_embedding is a Conv3d with stride == kernel (model.py:476)
        -> linear over (C, pt, ph, pw)-flattened patches.
      * per-block: self_attn q/k/v/o + FULL-dim RMSNorm norm_q/norm_k
        (model.py:131-136), cross_attn q/k/v/o + norm_q/norm_k
        (model.py:183-206), affine norm3, ffn.0/ffn.2, and the learned
        [1, 6, dim] modulation offsets (model.py:292-297).
      * head: head.head linear + [1, 2, dim] head.modulation
        (model.py:352-356).
    """
    dt = cfg.dtype
    sd = state_dict

    def blk(i):
        p = f'blocks.{i}'
        return {
            'mod_bias': _a(sd[f'{p}.modulation'])[0].astype(dt),  # [6, d]
            'q': _lin(sd, f'{p}.self_attn.q', dt),
            'k': _lin(sd, f'{p}.self_attn.k', dt),
            'v': _lin(sd, f'{p}.self_attn.v', dt),
            'o': _lin(sd, f'{p}.self_attn.o', dt),
            'qnorm': _a(sd[f'{p}.self_attn.norm_q.weight']).astype(dt),
            'knorm': _a(sd[f'{p}.self_attn.norm_k.weight']).astype(dt),
            'cq': _lin(sd, f'{p}.cross_attn.q', dt),
            'ck': _lin(sd, f'{p}.cross_attn.k', dt),
            'cv': _lin(sd, f'{p}.cross_attn.v', dt),
            'co': _lin(sd, f'{p}.cross_attn.o', dt),
            'cqnorm': _a(sd[f'{p}.cross_attn.norm_q.weight']).astype(dt),
            'cknorm': _a(sd[f'{p}.cross_attn.norm_k.weight']).astype(dt),
            'norm3_scale': _a(sd[f'{p}.norm3.weight']).astype(dt),
            'norm3_bias': _a(sd[f'{p}.norm3.bias']).astype(dt),
            'w1t': _a(sd[f'{p}.ffn.0.weight']).astype(dt),   # [f, d]
            'b1': _a(sd[f'{p}.ffn.0.bias']).astype(dt),
            'w2': _t(sd[f'{p}.ffn.2.weight']).astype(dt),    # [f, d]
            'b2': _a(sd[f'{p}.ffn.2.bias']).astype(dt),
        }

    def stack(n, fn):
        import jax
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[fn(i) for i in range(n)])

    conv = np.asarray(sd['patch_embedding.weight'])  # [d, C, pt, ph, pw]
    return {
        'patch_in': {'w': jnp.asarray(conv.reshape(conv.shape[0], -1).T
                                      ).astype(dt),
                     'b': _a(sd['patch_embedding.bias']).astype(dt)},
        'text_in': {'fc1': _lin(sd, 'text_embedding.0', dt),
                    'fc2': _lin(sd, 'text_embedding.2', dt)},
        'time_in': {'fc1': _lin(sd, 'time_embedding.0', dt),
                    'fc2': _lin(sd, 'time_embedding.2', dt)},
        'time_proj': _lin(sd, 'time_projection.1', dt),
        'blocks': stack(cfg.num_layers, blk),
        'head_mod': _a(sd['head.modulation'])[0].astype(dt),  # [2, d]
        'head': _lin(sd, 'head.head', dt),
    }


def load_wan_safetensors(path: str, cfg) -> Dict:
    """Load Wan2.1 weights from .safetensors (reference wan/text2video.py
    from_pretrained path)."""
    from safetensors import safe_open
    sd = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)
    return load_wan_params(sd, cfg)


def load_ae_decoder_safetensors(path: str, dtype=None):
    """Load the BFL FLUX autoencoder (ae.safetensors) decoder subtree into
    the models/autoencoder.py param layout (host-side; arrays device_put
    lazily at first use)."""
    import numpy as np
    from safetensors import safe_open
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    flat = {}
    with safe_open(path, framework='np') as f:
        for k in f.keys():
            if k.startswith('decoder.'):
                flat[k[len('decoder.'):]] = np.asarray(f.get_tensor(k))
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split('.')
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(int(p) if p.isdigit() else p, {})
        cur[parts[-1]] = jnp.asarray(v, dtype)

    # 'up.N.block.M' dict-of-int -> list for block sequences
    def listify(d):
        if isinstance(d, dict):
            if d and all(isinstance(x, int) for x in d):
                if set(d) == set(range(len(d))):
                    return [listify(d[i]) for i in range(len(d))]
            return {k: listify(v) for k, v in d.items()}
        return d

    tree = {k: listify(v) for k, v in tree.items()}
    if isinstance(tree.get('up'), list):
        tree['up'] = {i: v for i, v in enumerate(tree['up'])}
    return {'decoder': tree}
