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

    def mlpw(arr):
        """Output-major [N, C] MLP weight -> fp8 QTensor under is_fp8."""
        if not is_fp8:
            return jnp.asarray(np.asarray(arr)).astype(dt)
        from ..utils.quant import quantize_host
        return quantize_host(np.asarray(arr), 'fp8', keep_axes=(0,))

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
            'txt_w1t': mlpw(sd[f'{p}.txt_mlp.0.weight']),
            'txt_b1': _a(sd[f'{p}.txt_mlp.0.bias']).astype(dt),
            'txt_w2': mlpw(np.asarray(sd[f'{p}.txt_mlp.2.weight']).T),
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
