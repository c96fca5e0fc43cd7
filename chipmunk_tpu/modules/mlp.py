"""Sparse delta MLP module — functional TPU rebuild of the reference's
``SparseDiffMlp`` (src/chipmunk/modules/mlp.py:11-123).

Algorithm parity map (reference modules/mlp.py):
  full steps   -> dense fc1/act/fc2; cache post-activations, output, and
                  block-means of the pre-activations         (mlp.py:51-59)
  sparse steps -> optionally recompute neuron indices from
                  |fc1(block_mean(x)) - blockmean_mid_cache| (mlp.py:62-88),
                  then the fused delta chain: recompute selected neurons,
                  delta vs cache, out_cache += delta @ fc2   (mlp.py:104-120)

TPU deltas: neuron selection is neuron_block-granular; selection uses exact
per-row top-k + Bernoulli random keep with an explicit key (the reference's
sampled-quantile + curand, csrc/indexed_io/topk_indices.cu); cache layout is
token-major.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import MlpConfig
from ..ops import indexing, mlp_ref
from ..ops.mlp_ref import block_mean
from ..utils.quant import dequant
from .. import kernels


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def _fc1(cfg: MlpConfig, x, w1t, b1):
    """fc1 = x @ w1tᵀ + b1, honoring ``mlp.is_fp8``: with an fp8 QTensor
    weight the input is dynamically fp8-quantized and the dot runs fp8 x
    fp8 (reference F8Linear forward; see modules/mlp_fp8.py docstring).
    fc2 always stays bf16, like the reference's sparse-MM2 exception
    (mlp_fp8.py:323-326)."""
    from ..utils.quant import QTensor
    if (cfg.is_fp8 and isinstance(w1t, QTensor)
            and w1t.q.dtype == jnp.float8_e4m3fn):
        from .mlp_fp8 import f8_input_matmul
        return f8_input_matmul(x, w1t, b1, out_dtype=x.dtype)
    return x @ dequant(w1t, x.dtype).T + b1.astype(x.dtype)


class MlpState(NamedTuple):
    """Per-layer MLP cache pytree (replaces MlpStorage,
    reference util/storage/layer_storage.py:5-93)."""
    out_cache: jnp.ndarray   # [T, C]
    act_cache: jnp.ndarray   # [T, N] post-activations
    bm_mid: jnp.ndarray      # [T//mbm, N] block-mean pre-activation cache
    inds: jnp.ndarray        # [M, jmax] int32 neuron-block ids
    counts: jnp.ndarray      # [M] int32


@dataclass(frozen=True)
class SparseDiffMlp:
    cfg: MlpConfig
    n_tokens: int            # T (padded to bm)
    d_model: int             # C
    d_hidden: int            # N
    jmax: int                # static max selected neuron blocks
    sel_blocks: int          # top-k in neuron blocks
    use_kernels: bool = True
    interpret: bool = False

    @staticmethod
    def build(cfg: MlpConfig, n_tokens: int, d_model: int, d_hidden: int,
              use_kernels: bool = True,
              interpret: bool = False) -> "SparseDiffMlp":
        # tokens are padded internally to a multiple of bm (large bm is the
        # TPU perf lever; padding wastes < bm tokens of compute)
        n_tokens = -(-n_tokens // cfg.bm) * cfg.bm
        assert d_hidden % cfg.neuron_block == 0
        nb = d_hidden // cfg.neuron_block
        sel = int(round(cfg.top_keys * d_hidden / cfg.counts_multiple_of)
                  * cfg.counts_multiple_of) // cfg.neuron_block
        sel = max(min(sel, nb), 1)
        cap = nb if cfg.max_selected_frac >= 1.0 else int(
            nb * cfg.max_selected_frac)
        mult_b = max(cfg.counts_multiple_of // cfg.neuron_block, 1)
        # size jmax by actual need (top-k + random-keep margin), like
        # SparseDiffAttn.build — mm1's grid runs jmax block-steps per token
        # block, so oversizing wastes sparse-MLP FLOPs directly
        rand_margin = (max(8, int(3 * cfg.random_keys * nb))
                       if cfg.random_keys > 0 else 0)
        jmax = max(min(sel + rand_margin, cap, nb), 1)
        jmax = min(-(-jmax // mult_b) * mult_b, nb)
        return SparseDiffMlp(cfg=cfg, n_tokens=n_tokens, d_model=d_model,
                             d_hidden=d_hidden, jmax=jmax, sel_blocks=sel,
                             use_kernels=use_kernels, interpret=interpret)

    # ---------------------------------------------------------------- steps
    def dense(self, x, w1t, b1, w2, b2):
        """x: [T, C]; w1t: [N, C]; w2: [N, C] (arrays or QTensors)."""
        mid = _fc1(self.cfg, x, w1t, b1)
        return (_gelu_tanh(mid.astype(jnp.float32)).astype(x.dtype)
                @ dequant(w2, x.dtype) + b2.astype(x.dtype))

    def _pad(self, x):
        t = x.shape[0]
        if t == self.n_tokens:
            return x, t
        return jnp.pad(x, ((0, self.n_tokens - t), (0, 0))), t

    def full_step(self, x, w1t, b1, w2, b2, state: MlpState
                  ) -> Tuple[jnp.ndarray, MlpState]:
        x, t = self._pad(x)
        mid = _fc1(self.cfg, x, w1t, b1)
        pa = _gelu_tanh(mid.astype(jnp.float32)).astype(x.dtype)
        out = pa @ dequant(w2, x.dtype) + b2.astype(x.dtype)
        return out[:t], state._replace(
            out_cache=out.astype(state.out_cache.dtype),
            act_cache=pa.astype(state.act_cache.dtype),
            bm_mid=block_mean(mid[None], self.cfg.mbm)[0].astype(
                state.bm_mid.dtype))

    def _recompute_indices(self, x, w1t, b1, state: MlpState, key: jax.Array
                           ) -> MlpState:
        """Reference modules/mlp.py:69-88."""
        mbm, bm = self.cfg.mbm, self.cfg.bm
        bmx = block_mean(x[None], mbm)[0]                  # [Mb, C]
        bmfc1 = _fc1(self.cfg, bmx, w1t, b1)               # [Mb, N]
        mdiff = jnp.abs((bmfc1 - state.bm_mid).astype(jnp.float32))
        r = bm // mbm
        Mb = mdiff.shape[0]
        mdiff = mdiff.reshape(Mb // r, r, -1).sum(axis=1)  # [M, N]
        scores = indexing.blockify_scores(mdiff, self.cfg.neuron_block)
        k = self.sel_blocks
        mask = indexing.topk_mask(scores, k)
        if self.cfg.random_keys > 0:
            mask = mask | jax.random.bernoulli(key, self.cfg.random_keys,
                                               mask.shape)
        mult_b = max(self.cfg.counts_multiple_of // self.cfg.neuron_block, 1)
        inds, counts = indexing.mask_to_indices_limited(mask, mult_b,
                                                        self.jmax)
        counts = jnp.clip(counts, 1, self.jmax)
        # refresh bm_mid ONLY at neurons that survive the jmax truncation
        # (reference copy_indices, mlp.py:82-85).  Refreshing a block the
        # kernel won't recompute would collapse its mdiff score while its
        # act_cache stays stale, suppressing it from future re-selection
        # (silent drift — advisor r2 finding #1): rebuild the mask from
        # the truncated index lists instead of using the raw `mask`.
        M = inds.shape[0]
        valid = jnp.arange(self.jmax)[None, :] < counts[:, None]
        surv = jnp.zeros_like(mask).at[
            jnp.arange(M)[:, None], inds].max(valid)
        surv = surv & mask   # round-up padding ids are unmasked -> drop
        sel_tok = jnp.repeat(jnp.repeat(surv, self.cfg.neuron_block, -1),
                             r, axis=0)                    # [Mb, N]
        bm_mid = indexing.copy_indices(bmfc1, state.bm_mid, sel_tok)
        return state._replace(inds=inds, counts=counts, bm_mid=bm_mid)

    def sparse_step(self, x, w1t, b1, w2, state: MlpState, *,
                    recompute: bool, key: Optional[jax.Array] = None
                    ) -> Tuple[jnp.ndarray, MlpState]:
        x, t = self._pad(x)
        if recompute:
            assert key is not None
            state = self._recompute_indices(x, w1t, b1, state, key)
        if self.use_kernels:
            a8 = self.cfg.int8_act
            if a8:
                from ..utils.quant import QTensor
                ok = (isinstance(w1t, QTensor) and isinstance(w2, QTensor)
                      and all(w.pack_axis is not None
                              or w.q.dtype == jnp.int8 for w in (w1t, w2)))
                if not ok:
                    # the shipped flux yml sets int8_act for the
                    # quantized-residency headline; with bf16 weights
                    # (e.g. CLI demo mode without --ckpt) the int8 MXU
                    # path has no int8 weights to pair with — degrade to
                    # the bf16 kernels instead of failing (trace-time
                    # print: fires once per compile)
                    print("chipmunk: mlp.int8_act ignored - MLP weights "
                          f"are {type(w1t).__name__}, not int8/int4 "
                          "QTensor (quantized residency)")
                    a8 = False
            new_out, new_act = kernels.csp_mlp(
                x, w1t, b1, w2, state.act_cache, state.out_cache,
                state.inds, state.counts, bn=self.cfg.neuron_block,
                bm=self.cfg.bm, interpret=self.interpret, a8=a8)
        else:
            bn = self.cfg.neuron_block
            tinds = (state.inds[..., None] * bn
                     + jnp.arange(bn)).reshape(state.inds.shape[0], -1)
            new_out, new_act = mlp_ref.csp_mlp_ref(
                x, dequant(w1t, x.dtype).T, b1, dequant(w2, x.dtype),
                tinds.astype(jnp.int32), state.counts * bn,
                state.act_cache, state.out_cache, bm=self.cfg.bm,
                act=_gelu_tanh)
        return new_out[:t].astype(x.dtype), state._replace(
            out_cache=new_out.astype(state.out_cache.dtype),
            act_cache=new_act.astype(state.act_cache.dtype))

    # ------------------------------------------------------------ frontend
    def __call__(self, x, w1t, b1, w2, b2, state: MlpState, *,
                 is_full: bool, recompute_mask: bool, layer_is_dense: bool,
                 key: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, MlpState]:
        if not self.cfg.is_enabled or layer_is_dense:
            return self.dense(x, w1t, b1, w2, b2), state
        if is_full:
            return self.full_step(x, w1t, b1, w2, b2, state)
        return self.sparse_step(x, w1t, b1, w2, state,
                                recompute=recompute_mask, key=key)

    def init_state(self, dtype=jnp.bfloat16) -> MlpState:
        if not self.cfg.is_enabled:
            # disabled modules never touch their caches — don't pay for them
            return MlpState(out_cache=jnp.zeros((1, 1), dtype),
                            act_cache=jnp.zeros((1, 1), dtype),
                            bm_mid=jnp.zeros((1, 1), dtype),
                            inds=jnp.zeros((1, 1), jnp.int32),
                            counts=jnp.ones((1,), jnp.int32))
        T, C, N = self.n_tokens, self.d_model, self.d_hidden
        M = T // self.cfg.bm
        Mb = T // self.cfg.mbm
        act_dt = jnp.dtype(self.cfg.act_cache_dtype) \
            if self.cfg.act_cache_dtype else dtype
        out_dt = jnp.dtype(self.cfg.out_cache_dtype) \
            if self.cfg.out_cache_dtype else dtype
        return MlpState(
            out_cache=jnp.zeros((T, C), out_dt),
            act_cache=jnp.zeros((T, N), act_dt),
            bm_mid=jnp.zeros((Mb, N), dtype),
            inds=jnp.zeros((M, self.jmax), jnp.int32),
            counts=jnp.ones((M,), jnp.int32),
        )
