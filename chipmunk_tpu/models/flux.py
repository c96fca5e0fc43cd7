"""FLUX-architecture DiT, functional JAX, with chipmunk sparsity built in.

Re-implements the model family of the reference's vendored FLUX repo
(examples/flux/src/flux/model.py, modules/layers.py) TPU-first:

  * params are a pytree of stacked per-layer arrays; the block loops are
    ``lax.scan`` over the layer axis (one compiled block body instead of 57
    inlined blocks),
  * the chipmunk sparse state (attention delta caches + MLP activation
    caches per layer) is a stacked pytree threaded through the scans,
  * "sparsify" is not a surgery step: double blocks run SparseDiffAttn on
    the joint txt+img attention and SparseDiffMlp on img_mlp
    (reference layers.py:158-162); single blocks store linear1/linear2
    pre-split into qkv/fc1/proj/fc2 (what the reference's
    SingleStreamBlock.sparsify does at load time, layers.py:239-291),
  * step flags (full/colsum/sparse) are trace-time constants.

Sequence layout: [txt (txt_len tokens), img] — txt first, matching the
reference (layers.py:187-196).  txt_len and S must be multiples of 128.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ChipmunkConfig
from ..modules import SparseDiffAttn, SparseDiffMlp, AttnState, MlpState
from ..schedule import StepKind
from ..utils.quant import dequant
from .layers import (apply_rope, init_linear, init_mlp_embedder,
                     layernorm, linear, mlp_embedder, modulation, rmsnorm,
                     timestep_embedding)


@dataclass(frozen=True)
class FluxModelConfig:
    in_channels: int = 64
    vec_in_dim: int = 768
    context_in_dim: int = 4096
    hidden_size: int = 3072
    num_heads: int = 24
    mlp_ratio: float = 4.0
    depth: int = 19            # double blocks
    depth_single_blocks: int = 38
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: int = 10_000
    qkv_bias: bool = True
    guidance_embed: bool = True
    txt_len: int = 512
    # sequence order: FLUX concatenates [txt, img] (layers.py:187-196);
    # HunyuanVideo concatenates [img, txt] (hyvideo models.py attention)
    txt_first: bool = True
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def mlp_hidden(self):
        return int(self.hidden_size * self.mlp_ratio)


# ------------------------------------------------------------------ params

def init_flux_params(key: jax.Array, cfg: FluxModelConfig) -> Dict:
    h, mh, dt = cfg.hidden_size, cfg.mlp_hidden, cfg.dtype
    ks = iter(jax.random.split(key, 64))

    def stack(n, fn):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[fn(i) for i in range(n)])

    def dbl(i):
        kk = iter(jax.random.split(jax.random.fold_in(next_key, i), 16))
        return {
            'img_mod': init_linear(next(kk), h, 6 * h, dt),
            'txt_mod': init_linear(next(kk), h, 6 * h, dt),
            'img_qkv': init_linear(next(kk), h, 3 * h, dt, bias=cfg.qkv_bias),
            'txt_qkv': init_linear(next(kk), h, 3 * h, dt, bias=cfg.qkv_bias),
            'img_qnorm': jnp.ones((cfg.head_dim,), dt),
            'img_knorm': jnp.ones((cfg.head_dim,), dt),
            'txt_qnorm': jnp.ones((cfg.head_dim,), dt),
            'txt_knorm': jnp.ones((cfg.head_dim,), dt),
            'img_proj': init_linear(next(kk), h, h, dt),
            'txt_proj': init_linear(next(kk), h, h, dt),
            # MLP weights stored output-major ([N, C]) for the sparse kernels
            'img_w1t': (jax.random.normal(next(kk), (mh, h)) * h ** -0.5
                        ).astype(dt),
            'img_b1': jnp.zeros((mh,), dt),
            'img_w2': (jax.random.normal(next(kk), (mh, h)) * mh ** -0.5
                       ).astype(dt),
            'img_b2': jnp.zeros((h,), dt),
            'txt_w1t': (jax.random.normal(next(kk), (mh, h)) * h ** -0.5
                        ).astype(dt),
            'txt_b1': jnp.zeros((mh,), dt),
            'txt_w2': (jax.random.normal(next(kk), (mh, h)) * mh ** -0.5
                       ).astype(dt),
            'txt_b2': jnp.zeros((h,), dt),
        }

    def sgl(i):
        kk = iter(jax.random.split(jax.random.fold_in(next_key, 1000 + i), 8))
        return {
            'mod': init_linear(next(kk), h, 3 * h, dt),
            # linear1 pre-split (reference sparsify, layers.py:239-291)
            'qkv': init_linear(next(kk), h, 3 * h, dt),
            'w1t': (jax.random.normal(next(kk), (mh, h)) * h ** -0.5
                    ).astype(dt),
            'b1': jnp.zeros((mh,), dt),
            # linear2 pre-split: attn half + mlp half; bias on the attn half
            'o_proj': init_linear(next(kk), h, h, dt),
            'w2': (jax.random.normal(next(kk), (mh, h)) * mh ** -0.5
                   ).astype(dt),
            'qnorm': jnp.ones((cfg.head_dim,), dt),
            'knorm': jnp.ones((cfg.head_dim,), dt),
        }

    next_key = next(ks)
    params = {
        'img_in': init_linear(next(ks), cfg.in_channels, h, dt),
        'txt_in': init_linear(next(ks), cfg.context_in_dim, h, dt),
        'time_in': init_mlp_embedder(next(ks), 256, h, dt),
        'vector_in': init_mlp_embedder(next(ks), cfg.vec_in_dim, h, dt),
        'double': stack(cfg.depth, dbl),
        'single': stack(cfg.depth_single_blocks, sgl),
        'final_mod': init_linear(next(ks), h, 2 * h, dt),
        'final_proj': init_linear(next(ks), h, cfg.in_channels, dt),
    }
    if cfg.guidance_embed:
        params['guidance_in'] = init_mlp_embedder(next(ks), 256, h, dt)
    return params


# ------------------------------------------------------------------- state

class FluxState(NamedTuple):
    """All chipmunk caches for one model invocation, stacked per layer."""
    double_attn: AttnState
    double_mlp: MlpState
    single_attn: AttnState
    single_mlp: MlpState


@dataclass(frozen=True)
class FluxSparse:
    """Static sparsity context: the module configs + per-layer dense flags."""
    attn_d: SparseDiffAttn      # double-block attention (joint seq)
    mlp_d: SparseDiffMlp        # double-block img MLP
    attn_s: SparseDiffAttn      # single-block attention
    mlp_s: SparseDiffMlp        # single-block full-seq MLP
    n_dense_attn_double: int
    n_dense_attn_single: int
    n_dense_mlp_double: int
    n_dense_mlp_single: int
    # optional (mesh, axis_name[, batch_axis]) for Ulysses head-parallel
    # attention; batch_axis = mesh axis the batch (dp/CFG) is sharded over
    ulysses: Optional[tuple] = None

    def with_ulysses(self, mesh, axis: str,
                     batch_axis: Optional[str] = None) -> "FluxSparse":
        import dataclasses
        return dataclasses.replace(self, ulysses=(mesh, axis, batch_axis))

    @staticmethod
    def build(ck: ChipmunkConfig, model: FluxModelConfig, seq_len: int,
              static_mask_tokens=None, batch: int = 1,
              use_kernels: bool = True, valid_len=None,
              interpret: bool = False) -> "FluxSparse":
        img_len = seq_len - model.txt_len
        attn_d = SparseDiffAttn.build(ck.attn, seq_len,
                                      static_mask_tokens=static_mask_tokens,
                                      use_kernels=use_kernels,
                                      valid_len=valid_len,
                                      interpret=interpret)
        # MLP caches fold batch into the token axis ([B*T, ...]): each batch
        # element owns its token blocks (the reference asserts B==1,
        # mlp.py:39 — folding generalizes it)
        mlp_d = SparseDiffMlp.build(ck.mlp, batch * img_len,
                                    model.hidden_size, model.mlp_hidden,
                                    use_kernels=use_kernels,
                                    interpret=interpret)
        mlp_s = SparseDiffMlp.build(ck.mlp, batch * seq_len,
                                    model.hidden_size, model.mlp_hidden,
                                    use_kernels=use_kernels,
                                    interpret=interpret)
        nd_a = ck.attn.first_n_dense_layers
        nd_m = ck.mlp.first_n_dense_layers
        # layer numbering counts double blocks first (reference
        # util.py:347-348 registers double then single)
        return FluxSparse(
            attn_d=attn_d, mlp_d=mlp_d, attn_s=attn_d, mlp_s=mlp_s,
            n_dense_attn_double=min(nd_a, model.depth),
            n_dense_attn_single=max(0, nd_a - model.depth),
            n_dense_mlp_double=min(nd_m, model.depth),
            n_dense_mlp_single=max(0, nd_m - model.depth))

    def init_state(self, model: FluxModelConfig, B: int) -> FluxState:
        H, D = model.num_heads, model.head_dim

        def stack(n, s):
            return jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(), s)

        return FluxState(
            double_attn=stack(model.depth,
                              self.attn_d.init_state(B, H, D, model.dtype)),
            double_mlp=stack(model.depth,
                             self.mlp_d.init_state(model.dtype)),
            single_attn=stack(model.depth_single_blocks,
                              self.attn_s.init_state(B, H, D, model.dtype)),
            single_mlp=stack(model.depth_single_blocks,
                             self.mlp_s.init_state(model.dtype)),
        )


# ----------------------------------------------------------------- forward

def _split_heads(x, H):
    B, S, _ = x.shape
    return x.reshape(B, S, H, -1).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, S, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * D)


def _attn_call(mod: SparseDiffAttn, q, k, v, st: AttnState, step: StepKind,
               is_dense, key, ulysses=None) -> Tuple[jnp.ndarray, AttnState]:
    """Dispatch one attention with runtime layer-dense flag (lax.cond —
    first_n_dense_layers varies per layer inside the scan).

    ulysses: optional (mesh, axis) — run the attention head-parallel via
    explicit all-to-alls (reference head_parallel.py semantics); sparsity
    state stays local per head shard."""
    def run(q, k, v, st, key):
        if not mod.cfg.is_enabled or mod.fully_dense:
            # both branches dense: no cond, state untouched
            return mod.dense_step(q, k, v), st
        if not (step.full_attn or step.colsum):
            # sparse step: NEITHER branch mutates state (sparse_step
            # returns its input state object).  Route only the output
            # through the cond — a cond that returns the state would
            # materialize (copy) the ~100MB-per-layer AttnState as a
            # fresh cond output every scan iteration, defeating
            # _tree_put_changed's pass-through (measured ~10ms/layer at
            # Wan scale, results/profile_wan_lv3*.log)
            def dense_o(_):
                return mod.dense_step(q, k, v)

            def sparse_o(_):
                o, _st = mod(q, k, v, st, step_index=step.index,
                             is_full=False, is_colsum=False,
                             layer_is_dense=False, key=key)
                return o

            return jax.lax.cond(is_dense, dense_o, sparse_o, None), st

        def dense(_):
            return mod.dense_step(q, k, v), st

        def sparse(_):
            return mod(q, k, v, st, step_index=step.index,
                       is_full=step.full_attn, is_colsum=step.colsum,
                       layer_is_dense=False, key=key)

        return jax.lax.cond(is_dense, dense, sparse, None)

    if ulysses is None:
        return run(q, k, v, st, key)
    from ..parallel.comm import ulysses_attention
    mesh, axis, batch_axis = (ulysses if len(ulysses) == 3
                              else (*ulysses, None))

    def sharded_fn(q, k, v, st):
        # decorrelate the random mask across head shards
        lkey = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return run(q, k, v, st, lkey)

    return ulysses_attention(mesh, axis, sharded_fn, q, k, v, st,
                             batch_axis=batch_axis)


def _mlp_call(mod: SparseDiffMlp, x2d, w1t, b1, w2, b2, st: MlpState,
              step: StepKind, is_dense, key
              ) -> Tuple[jnp.ndarray, MlpState]:
    if not mod.cfg.is_enabled:
        # disabled (e.g. Wan): dense unconditionally, placeholder state
        # passes through with no cond (see _attn_call note)
        return mod.dense(x2d, w1t, b1, w2, b2), st

    def dense(_):
        return mod.dense(x2d, w1t, b1, w2, b2), st

    def sparse(_):
        out, st2 = mod(x2d, w1t, b1, w2, b2, st, is_full=step.full_mlp,
                       recompute_mask=step.recompute_mlp_mask,
                       layer_is_dense=False, key=key)
        return out, st2

    return jax.lax.cond(is_dense, dense, sparse, None)


@dataclass(frozen=True)
class FluxStep:
    """Trace-time step descriptor: schedule.StepKind + step index."""
    index: int
    full_attn: bool
    full_mlp: bool
    colsum: bool
    recompute_mlp_mask: bool

    @staticmethod
    def of(kind: StepKind, index: int) -> "FluxStep":
        return FluxStep(index=index, full_attn=kind.full_attn,
                        full_mlp=kind.full_mlp, colsum=kind.colsum,
                        recompute_mlp_mask=kind.recompute_mlp_mask)


def _tree_at(tree, idx):
    return jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_index_in_dim(x, idx, 0,
                                               keepdims=False), tree)


def _tree_put(tree, new, idx):
    return jax.tree_util.tree_map(
        lambda full, n: jax.lax.dynamic_update_index_in_dim(
            full, n.astype(full.dtype), idx, 0), tree, new)


def _tree_put_changed(tree, old, new, idx):
    """_tree_put that skips leaves the step left UNTOUCHED (``new is
    old`` — step methods return the input state object for fields they
    don't modify, and the step kind is static per trace).  A skipped
    leaf passes the stacked carry buffer through the scan iteration
    with no dynamic-update at all, so XLA cannot be tempted into a
    defensive whole-buffer copy: sparse steps touch NO attention-state
    field, and at Wan scale the stacked AttnState is ~3.2GB/invocation
    (copy ≈ 8ms/layer — the e2e-vs-isolated overhead chased in
    results/profile_wan_lv3*.log)."""
    return jax.tree_util.tree_map(
        lambda full, o, n: full if n is o
        else jax.lax.dynamic_update_index_in_dim(
            full, n.astype(full.dtype), idx, 0), tree, old, new)


def double_block(cfg: FluxModelConfig, sp: FluxSparse, p: Dict,
                 img, txt, vec, cos, sin, ast: AttnState, mst: MlpState,
                 idx, step: FluxStep, lkey):
    """One double-stream (MMDiT) block (reference layers.py:164-202)."""
    H, dt = cfg.num_heads, cfg.dtype
    (im1, it1) = modulation(p['img_mod'], vec, 2)
    (tm1, tt1) = modulation(p['txt_mod'], vec, 2)

    img_mod = (1 + im1[1]) * layernorm(img) + im1[0]
    txt_mod = (1 + tm1[1]) * layernorm(txt) + tm1[0]

    iq, ik, iv = jnp.split(linear(p['img_qkv'], img_mod), 3, axis=-1)
    tq, tk, tv = jnp.split(linear(p['txt_qkv'], txt_mod), 3, axis=-1)
    iq, ik, iv = (_split_heads(x, H) for x in (iq, ik, iv))
    tq, tk, tv = (_split_heads(x, H) for x in (tq, tk, tv))
    iq = rmsnorm(iq, p['img_qnorm'])
    ik = rmsnorm(ik, p['img_knorm'])
    tq = rmsnorm(tq, p['txt_qnorm'])
    tk = rmsnorm(tk, p['txt_knorm'])
    if cfg.txt_first:
        q = jnp.concatenate([tq, iq], axis=2)
        k = jnp.concatenate([tk, ik], axis=2)
        v = jnp.concatenate([tv, iv], axis=2)
    else:
        # rope applies to img positions only in hunyuan (txt has no pe)
        q = jnp.concatenate([iq, tq], axis=2)
        k = jnp.concatenate([ik, tk], axis=2)
        v = jnp.concatenate([iv, tv], axis=2)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    attn_dense = idx < sp.n_dense_attn_double
    o, ast2 = _attn_call(sp.attn_d, q, k, v, ast, step, attn_dense,
                         lkey, ulysses=sp.ulysses)
    o = _merge_heads(o)
    if cfg.txt_first:
        txt_o, img_o = o[:, :cfg.txt_len], o[:, cfg.txt_len:]
    else:
        img_o, txt_o = o[:, :-cfg.txt_len], o[:, -cfg.txt_len:]

    img = img + im1[2] * linear(p['img_proj'], img_o)
    txt = txt + tm1[2] * linear(p['txt_proj'], txt_o)

    # img MLP (sparse), txt MLP (dense — small)
    img_mod2 = (1 + it1[1]) * layernorm(img) + it1[0]
    mlp_dense = idx < sp.n_dense_mlp_double
    mo, mst2 = _mlp_call(sp.mlp_d,
                         img_mod2.reshape(-1, img_mod2.shape[-1]),
                         p['img_w1t'], p['img_b1'],
                         p['img_w2'], p['img_b2'], mst, step, mlp_dense,
                         jax.random.fold_in(lkey, 1))
    img = img + it1[2] * mo.reshape(img.shape)

    txt_mod2 = (1 + tt1[1]) * layernorm(txt) + tt1[0]
    tmid = (txt_mod2 @ dequant(p['txt_w1t'], dt).T
            + p['txt_b1'].astype(dt))
    tact = jax.nn.gelu(tmid.astype(jnp.float32), approximate=True
                       ).astype(dt)
    txt = txt + tt1[2] * (tact @ dequant(p['txt_w2'], dt)
                          + p['txt_b2'].astype(dt))
    return img, txt, ast2, mst2


def single_block(cfg: FluxModelConfig, sp: FluxSparse, p: Dict,
                 x, vec, cos, sin, ast: AttnState, mst: MlpState,
                 idx, step: FluxStep, lkey):
    """One single-stream block with pre-split linear1/linear2
    (reference layers.py:239-308)."""
    H, dt = cfg.num_heads, cfg.dtype
    ((sh, sc, gate),) = modulation(p['mod'], vec, 1)
    x_mod = (1 + sc) * layernorm(x) + sh

    qkv = linear(p['qkv'], x_mod)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(z, H) for z in (q, k, v))
    q = rmsnorm(q, p['qnorm'])
    k = rmsnorm(k, p['knorm'])
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    attn_dense = idx < sp.n_dense_attn_single
    o, ast2 = _attn_call(sp.attn_s, q, k, v, ast, step, attn_dense,
                         lkey, ulysses=sp.ulysses)
    attn_out = linear(p['o_proj'], _merge_heads(o))

    mlp_dense = idx < sp.n_dense_mlp_single
    mo, mst2 = _mlp_call(sp.mlp_s, x_mod.reshape(-1, x_mod.shape[-1]),
                         p['w1t'], p['b1'], p['w2'],
                         jnp.zeros((cfg.hidden_size,), dt), mst, step,
                         mlp_dense, jax.random.fold_in(lkey, 1))
    x = x + gate * (attn_out + mo.reshape(x.shape))
    return x, ast2, mst2


def flux_embed(params: Dict, cfg: FluxModelConfig, img, txt, timesteps, y,
               guidance=None):
    """Input embedders: returns (img tokens, txt tokens, vec)
    (reference model.py:100-108)."""
    dt = cfg.dtype
    vec = mlp_embedder(params['time_in'],
                       timestep_embedding(timesteps, 256).astype(dt))
    if cfg.guidance_embed:
        assert guidance is not None
        vec = vec + mlp_embedder(params['guidance_in'],
                                 timestep_embedding(guidance, 256).astype(dt))
    vec = vec + mlp_embedder(params['vector_in'], y.astype(dt))
    img = linear(params['img_in'], img.astype(dt))
    txt = linear(params['txt_in'], txt.astype(dt))
    return img, txt, vec


def flux_final(params: Dict, cfg: FluxModelConfig, x, vec):
    """Final adaLN + projection (reference model.py:131-132)."""
    img = x[:, cfg.txt_len:] if cfg.txt_first else x[:, :-cfg.txt_len]
    mod_out = linear(params['final_mod'], jax.nn.silu(vec))
    shift, scale = jnp.split(mod_out[:, None, :], 2, axis=-1)
    img = (1 + scale) * layernorm(img) + shift
    return linear(params['final_proj'], img)


def flux_forward(params: Dict, cfg: FluxModelConfig, sp: FluxSparse,
                 img: jnp.ndarray, txt: jnp.ndarray,
                 timesteps: jnp.ndarray, y: jnp.ndarray,
                 pe: Tuple[jnp.ndarray, jnp.ndarray],
                 state: FluxState, step: FluxStep,
                 guidance: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None,
                 ) -> Tuple[jnp.ndarray, FluxState]:
    """One denoising model evaluation (reference model.py:87-133).

    img: [B, S_img, in_ch] (already patch-reordered), txt: [B, txt_len,
    ctx_dim], y: [B, vec_in], pe: rope (cos, sin) for the joint sequence.
    Returns (prediction [B, S_img, in_ch], new state).

    Per-layer cache state is NOT scanned as xs/ys (scan would allocate a
    second stacked buffer for the ys — 3GB+ at full FLUX depth): the whole
    stacked state rides the carry and is sliced/written in place with
    dynamic_update_index_in_dim, which XLA aliases inside the while loop.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    img, txt, vec = flux_embed(params, cfg, img, txt, timesteps, y, guidance)
    cos, sin = pe
    kd, ks_, _ = jax.random.split(key, 3)

    # ---------------------------------------------------- double blocks
    def double_body(carry, xs):
        img, txt, d_attn, d_mlp = carry
        p, idx = xs
        ast, mst = _tree_at(d_attn, idx), _tree_at(d_mlp, idx)
        img, txt, ast2, mst2 = double_block(
            cfg, sp, p, img, txt, vec, cos, sin,
            ast, mst, idx, step,
            jax.random.fold_in(kd, idx))
        return (img, txt, _tree_put_changed(d_attn, ast, ast2, idx),
                _tree_put_changed(d_mlp, mst, mst2, idx)), None

    idx_d = jnp.arange(cfg.depth)
    (img, txt, d_attn2, d_mlp2), _ = jax.lax.scan(
        double_body, (img, txt, state.double_attn, state.double_mlp),
        (params['double'], idx_d))

    # ---------------------------------------------------- single blocks
    if cfg.txt_first:
        x = jnp.concatenate([txt, img], axis=1)
    else:
        x = jnp.concatenate([img, txt], axis=1)

    def single_body(carry, xs):
        x, s_attn, s_mlp = carry
        p, idx = xs
        ast, mst = _tree_at(s_attn, idx), _tree_at(s_mlp, idx)
        x, ast2, mst2 = single_block(
            cfg, sp, p, x, vec, cos, sin,
            ast, mst, idx, step,
            jax.random.fold_in(ks_, idx))
        return (x, _tree_put_changed(s_attn, ast, ast2, idx),
                _tree_put_changed(s_mlp, mst, mst2, idx)), None

    idx_s = jnp.arange(cfg.depth_single_blocks)
    (x, s_attn2, s_mlp2), _ = jax.lax.scan(
        single_body, (x, state.single_attn, state.single_mlp),
        (params['single'], idx_s))

    pred = flux_final(params, cfg, x, vec)
    return pred, FluxState(double_attn=d_attn2, double_mlp=d_mlp2,
                           single_attn=s_attn2, single_mlp=s_mlp2)


def flux_rope_ids(B: int, h_img: int, w_img: int, txt_len: int
                  ) -> jnp.ndarray:
    """Position ids for the joint sequence (reference sampling prepare():
    txt ids zeros; img ids (0, row, col))."""
    txt_ids = jnp.zeros((B, txt_len, 3), jnp.int32)
    rows = jnp.repeat(jnp.arange(h_img), w_img)
    cols = jnp.tile(jnp.arange(w_img), h_img)
    img_ids = jnp.stack([jnp.zeros_like(rows), rows, cols], axis=-1)
    img_ids = jnp.broadcast_to(img_ids[None], (B, h_img * w_img, 3))
    return jnp.concatenate([txt_ids, img_ids], axis=1)
