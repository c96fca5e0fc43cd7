"""Wan2.1-architecture video DiT with chipmunk sparsity.

Re-implements the model family of the reference's vendored Wan2.1 repo
(examples/wan/wan/modules/model.py) TPU-first.  Structure per block:
self-attention (chipmunk-sparse, reference model.py:138-141 wraps
WanSelfAttention with SparseDiffAttn) + text cross-attention (dense) + FFN,
with 6-way adaLN modulation from per-block learned offsets + time embedding.

Wan-specific behaviors rebuilt here:
  * the self-attention sequence is video tokens ONLY (text enters via
    cross-attn), so the static mask has txt_len=0 and the voxel reorder
    covers the whole sequence (reference model.py:561-563),
  * CFG runs cond + uncond as two model invocations per inference step
    (wan chipmunk-config.yml: num_model_invocations_per_inference_step: 2);
    caches are per-invocation — here simply two state pytrees
    (reference rotates invocation buffers via complete_cur_layer,
    model.py:165-167; explicit state makes that a host-side index),
  * step caching keeps separate cond/uncond caches (model.py:580-593).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ChipmunkConfig
from ..modules import SparseDiffAttn, SparseDiffMlp, AttnState, MlpState
from ..ops.voxel import (voxel_order, inverse_voxel_order,
                         get_local_indices_with_text)
from .flux import (FluxStep, _attn_call, _mlp_call, _tree_at,
                   _tree_put_changed)
from .layers import (apply_rope, build_rope, init_linear, layernorm, linear,
                     rmsnorm, timestep_embedding)


@dataclass(frozen=True)
class WanModelConfig:
    """Wan2.1 T2V shape (reference wan/configs; 1.3B: dim=1536, 14B:
    dim=5120)."""
    latent_t: int = 21
    latent_h: int = 60
    latent_w: int = 104
    in_channels: int = 16
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    dim: int = 1536
    ffn_dim: int = 8960
    num_heads: int = 12
    num_layers: int = 30
    text_dim: int = 4096
    txt_len: int = 512
    freq_dim: int = 256
    axes_dim: Tuple[int, ...] = (44, 42, 42)   # head_dim 128
    theta: int = 10_000
    voxel_shape: Tuple[int, int, int] = (4, 4, 8)
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    @property
    def grid(self):
        pt, ph, pw = self.patch_size
        return (self.latent_t // pt, self.latent_h // ph,
                self.latent_w // pw)

    @property
    def seq_len(self):
        t, h, w = self.grid
        return t * h * w


def init_wan_params(key: jax.Array, cfg: WanModelConfig) -> Dict:
    d, f, dt = cfg.dim, cfg.ffn_dim, cfg.dtype
    ks = iter(jax.random.split(key, 16))
    base = next(ks)

    def blk(i):
        kk = iter(jax.random.split(jax.random.fold_in(base, i), 12))
        return {
            # 6-way modulation: learned per-block offsets added to the
            # projected time embedding (reference WanAttentionBlock)
            'mod_bias': (jax.random.normal(next(kk), (6, d)) * 0.02
                         ).astype(dt),
            'q': init_linear(next(kk), d, d, dt),
            'k': init_linear(next(kk), d, d, dt),
            'v': init_linear(next(kk), d, d, dt),
            'o': init_linear(next(kk), d, d, dt),
            # full-dim RMSNorm applied BEFORE the head split (reference
            # WanSelfAttention: norm_q(q(x)) on [b, s, dim], model.py:
            # 131-146 — NOT per-head like FLUX)
            'qnorm': jnp.ones((d,), dt),
            'knorm': jnp.ones((d,), dt),
            # cross attention (WanT2VCrossAttention inherits the same
            # full-dim norm_q/norm_k, model.py:183-206)
            'cq': init_linear(next(kk), d, d, dt),
            'ck': init_linear(next(kk), d, d, dt),
            'cv': init_linear(next(kk), d, d, dt),
            'co': init_linear(next(kk), d, d, dt),
            'cqnorm': jnp.ones((d,), dt),
            'cknorm': jnp.ones((d,), dt),
            'norm3_scale': jnp.ones((d,), dt),
            'norm3_bias': jnp.zeros((d,), dt),
            # FFN stored output-major for the sparse kernels
            'w1t': (jax.random.normal(next(kk), (f, d)) * d ** -0.5
                    ).astype(dt),
            'b1': jnp.zeros((f,), dt),
            'w2': (jax.random.normal(next(kk), (f, d)) * f ** -0.5
                   ).astype(dt),
            'b2': jnp.zeros((d,), dt),
        }

    def stack(n, fn):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[fn(i) for i in range(n)])

    pt, ph, pw = cfg.patch_size
    return {
        'patch_in': init_linear(next(ks), cfg.in_channels * pt * ph * pw,
                                d, dt),
        'text_in': {'fc1': init_linear(next(ks), cfg.text_dim, d, dt),
                    'fc2': init_linear(next(ks), d, d, dt)},
        'time_in': {'fc1': init_linear(next(ks), cfg.freq_dim, d, dt),
                    'fc2': init_linear(next(ks), d, d, dt)},
        'time_proj': init_linear(next(ks), d, 6 * d, dt),
        'blocks': stack(cfg.num_layers, blk),
        'head_mod': (jax.random.normal(next(ks), (2, d)) * 0.02).astype(dt),
        'head': init_linear(next(ks), d,
                            cfg.in_channels * pt * ph * pw, dt),
    }


class WanState(NamedTuple):
    attn: AttnState   # stacked [L, ...]
    mlp: MlpState


@dataclass
class WanModel:
    cfg: WanModelConfig
    ck: ChipmunkConfig
    use_kernels: bool = True
    interpret: bool = False
    batch: int = 1           # MLP caches fold batch into the token axis

    def __post_init__(self):
        t, h, w = self.cfg.grid
        seq = self.cfg.seq_len
        pad = (-seq) % 128
        self.seq_padded = seq + pad
        lv = self.ck.attn.local_voxels
        mask, _, _ = get_local_indices_with_text(
            vid_shape=(t, h, w), txt_len=0,
            voxel_shape=self.cfg.voxel_shape, local_shape=(lv, lv, lv),
            rk=0.0, kv_tile_size=self.ck.attn.counts_multiple_of)
        if pad:
            # cdiv(seq,128) == seq_padded//128: rows already cover the
            # final partial group; pad columns appended all-False (pad
            # keys are excluded from attention via valid_len)
            assert mask.shape[0] == self.seq_padded // 128
            mask = np.concatenate(
                [mask, np.zeros((mask.shape[0], pad), bool)], axis=1)
        self.static_mask = mask
        self.attn_mod = SparseDiffAttn.build(
            self.ck.attn, self.seq_padded,
            static_mask_tokens=jnp.asarray(mask),
            valid_len=seq if pad else None,
            use_kernels=self.use_kernels, interpret=self.interpret)
        self.mlp_mod = SparseDiffMlp.build(
            self.ck.mlp, self.batch * self.seq_padded, self.cfg.dim,
            self.cfg.ffn_dim,
            use_kernels=self.use_kernels, interpret=self.interpret)
        # set via .sharded(): ulysses = (mesh, sp_axis, batch_axis),
        # mesh_info = (mesh, sp_axis, dp_axis, fsdp)
        self.ulysses = None
        self.mesh_info = None

    # ------------------------------------------------------- multi-chip
    def sharded(self, mesh, sp: str = 'sp', dp: Optional[str] = None,
                fsdp: bool = False) -> "WanModel":
        """Multi-chip model: Ulysses head-parallel self-attention over
        mesh axis ``sp`` (reference head_parallel.py semantics; the
        reference's own Wan integration only has dense xDiT USP which
        BYPASSES chipmunk, xdit_context_parallel.py:179-185 — here the
        sparse path itself is head-parallel).  Returns a NEW model
        instance (fresh jit-cache identity); denoise calls place
        params/inputs/state onto the mesh automatically.  Sparsity state
        shards over heads and stays local per head shard."""
        import copy
        m = copy.copy(self)
        m.__dict__.pop('_jit_cache_token', None)
        m.ulysses = (mesh, sp, dp)
        m.mesh_info = (mesh, sp, dp, fsdp)
        return m

    def place(self, params, arrays, state):
        """Place a denoise input set onto the mesh (no-op when not
        sharded)."""
        if self.mesh_info is None:
            return params, tuple(arrays), state
        from ..parallel.sharding import place_video_inputs
        mesh, sp_ax, dp_ax, fsdp = self.mesh_info
        return place_video_inputs(mesh, params, arrays, state,
                                  sp=sp_ax, dp=dp_ax, fsdp=fsdp)

    # ------------------------------------------------------------ tokens
    def patchify_video(self, latents: jnp.ndarray) -> jnp.ndarray:
        B, C, T, H, W = latents.shape
        pt, ph, pw = self.cfg.patch_size
        t, h, w = self.cfg.grid
        x = latents.reshape(B, C, t, pt, h, ph, w, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            B, t * h * w, C * pt * ph * pw)
        p = jnp.asarray(voxel_order(t, h, w, self.cfg.voxel_shape))
        return x[:, p]

    def unpatchify_video(self, x: jnp.ndarray, B: int) -> jnp.ndarray:
        pt, ph, pw = self.cfg.patch_size
        C = self.cfg.in_channels
        t, h, w = self.cfg.grid
        inv = jnp.asarray(inverse_voxel_order(t, h, w, self.cfg.voxel_shape))
        x = x[:, inv]
        x = x.reshape(B, t, h, w, C, pt, ph, pw)
        return x.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(
            B, C, t * pt, h * ph, w * pw)

    def rope(self, B: int):
        t, h, w = self.cfg.grid
        ids = jnp.stack(jnp.meshgrid(jnp.arange(t), jnp.arange(h),
                                     jnp.arange(w), indexing='ij'),
                        axis=-1).reshape(-1, 3)
        p = jnp.asarray(voxel_order(t, h, w, self.cfg.voxel_shape))
        ids = ids[p]
        pad = self.seq_padded - self.cfg.seq_len
        if pad:
            ids = jnp.concatenate([ids, jnp.zeros((pad, 3), ids.dtype)], 0)
        ids = jnp.broadcast_to(ids[None], (B,) + ids.shape)
        return build_rope(ids, self.cfg.axes_dim, self.cfg.theta)

    # ----------------------------------------------------------- forward
    def forward(self, params: Dict, latents: jnp.ndarray,
                txt: jnp.ndarray, t_vec: jnp.ndarray,
                state: WanState, step: FluxStep,
                key: Optional[jax.Array] = None,
                pe=None) -> Tuple[jnp.ndarray, WanState]:
        """latents: [B, C, T, H, W]; txt: [B, txt_len, text_dim].
        One model invocation (call once per CFG branch with its own state,
        reference text2video.py:246-252)."""
        cfg = self.cfg
        B = latents.shape[0]
        dt = cfg.dtype
        key = key if key is not None else jax.random.PRNGKey(0)
        H = cfg.num_heads

        x = linear(params['patch_in'], self.patchify_video(latents))
        pad = self.seq_padded - cfg.seq_len
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((B, pad, cfg.dim), x.dtype)], axis=1)
        ctx = linear(params['text_in']['fc2'], jax.nn.gelu(
            linear(params['text_in']['fc1'], txt.astype(dt)).astype(
                jnp.float32), approximate=True).astype(dt))
        temb = timestep_embedding(t_vec, cfg.freq_dim).astype(dt)
        e = linear(params['time_in']['fc2'],
                   jax.nn.silu(linear(params['time_in']['fc1'], temb)))
        e6 = linear(params['time_proj'], jax.nn.silu(e))    # [B, 6d]
        e6 = e6.reshape(B, 6, cfg.dim)
        pe = pe if pe is not None else self.rope(B)
        cos, sin = pe

        # Per-layer cache state rides the CARRY and is sliced/written in
        # place with dynamic_update_index_in_dim (XLA aliases it inside the
        # while loop) — scanning it as xs/ys would allocate a second full
        # stacked state buffer per step (~2x3GB transient at Wan-1.3B/32k;
        # fatal at 14B), the exact pattern flux_forward refuses
        # (flux.py:443-447).
        def body(carry, xs):
            x, s_attn, s_mlp = carry
            p, idx = xs
            ast, mst = _tree_at(s_attn, idx), _tree_at(s_mlp, idx)
            lkey = jax.random.fold_in(key, idx)
            mod = e6[:, :, None, :] + p['mod_bias'][None, :, None, :]
            # self attention
            xn = (1 + mod[:, 1]) * layernorm(x) + mod[:, 0]
            q = rmsnorm(linear(p['q'], xn), p['qnorm']).reshape(
                B, -1, H, cfg.head_dim).transpose(0, 2, 1, 3)
            k = rmsnorm(linear(p['k'], xn), p['knorm']).reshape(
                B, -1, H, cfg.head_dim).transpose(0, 2, 1, 3)
            v = linear(p['v'], xn).reshape(B, -1, H, cfg.head_dim
                                           ).transpose(0, 2, 1, 3)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            is_dense = idx < self.ck.attn.first_n_dense_layers
            o, ast2 = _attn_call(self.attn_mod, q, k, v, ast, step,
                                 is_dense, lkey, ulysses=self.ulysses)
            o = o.transpose(0, 2, 1, 3).reshape(B, -1, cfg.dim)
            x = x + mod[:, 2] * linear(p['o'], o)

            # cross attention (dense; text is short)
            xn3 = layernorm(x) * p['norm3_scale'] + p['norm3_bias']
            cq = linear(p['cq'], xn3).reshape(B, -1, H, cfg.head_dim
                                              ).transpose(0, 2, 1, 3)
            ck_ = linear(p['ck'], ctx).reshape(B, -1, H, cfg.head_dim
                                               ).transpose(0, 2, 1, 3)
            cv = linear(p['cv'], ctx).reshape(B, -1, H, cfg.head_dim
                                              ).transpose(0, 2, 1, 3)
            s = jnp.einsum('bhid,bhjd->bhij', cq, ck_) / np.sqrt(
                cfg.head_dim)
            co = jnp.einsum('bhij,bhjd->bhid',
                            jax.nn.softmax(s.astype(jnp.float32), -1
                                           ).astype(x.dtype), cv)
            co = co.transpose(0, 2, 1, 3).reshape(B, -1, cfg.dim)
            x = x + linear(p['co'], co)

            # FFN (sparse)
            xn2 = (1 + mod[:, 4]) * layernorm(x) + mod[:, 3]
            mlp_dense = idx < self.ck.mlp.first_n_dense_layers
            mo, mst2 = _mlp_call(self.mlp_mod,
                                 xn2.reshape(-1, xn2.shape[-1]),
                                 p['w1t'], p['b1'],
                                 p['w2'], p['b2'], mst, step, mlp_dense,
                                 jax.random.fold_in(lkey, 1))
            x = x + mod[:, 5] * mo.reshape(x.shape)
            return (x, _tree_put_changed(s_attn, ast, ast2, idx),
                    _tree_put_changed(s_mlp, mst, mst2, idx)), None

        idx = jnp.arange(cfg.num_layers)
        (x, a2, m2), _ = jax.lax.scan(
            body, (x, state.attn, state.mlp), (params['blocks'], idx))

        hm = params['head_mod']
        x = (1 + hm[1][None, None]) * layernorm(x) + hm[0][None, None]
        out = linear(params['head'], x)[:, :cfg.seq_len]
        return self.unpatchify_video(out, B), WanState(attn=a2, mlp=m2)

    def init_state(self, B: int) -> WanState:
        L = self.cfg.num_layers

        def stack(s):
            return jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (L,) + x.shape).copy(), s)

        return WanState(
            attn=stack(self.attn_mod.init_state(B, self.cfg.num_heads,
                                                self.cfg.head_dim,
                                                self.cfg.dtype)),
            mlp=stack(self.mlp_mod.init_state(self.cfg.dtype)))

    def init_cfg_states(self, B: int) -> Tuple[WanState, WanState]:
        """Two invocation states for CFG cond/uncond (reference
        num_model_invocations_per_inference_step=2)."""
        return self.init_state(B), self.init_state(B)
