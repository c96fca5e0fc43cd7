"""Pallas kernels vs eager references, interpret mode on CPU
(SURVEY.md §4: every kernel has a CPU-runnable twin)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chipmunk_tpu import ops
from chipmunk_tpu.kernels import (dense_attn, dense_colsum_attn, csp_attn,
                                  csp_mlp_mm1, csp_mlp_mm2, csp_mlp)

KEY = jax.random.PRNGKey(0)


def rand_qkv(b=1, h=2, s=256, d=128, dtype=jnp.float32):
    ks = jax.random.split(KEY, 3)
    return tuple(jax.random.normal(k, (b, h, s, d), dtype) for k in ks)


def test_dense_attn_kernel():
    q, k, v = rand_qkv()
    o, lse = dense_attn(q, k, v, bq=128, bk=128, interpret=True)
    o_ref, lse_ref = ops.dense_attn_ref(q, k, v)
    np.testing.assert_allclose(o, o_ref, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(lse, lse_ref, atol=2e-3, rtol=2e-3)


def test_dense_attn_kernel_unaligned_seq():
    q, k, v = rand_qkv(s=300)  # not a multiple of bq or bk
    o, lse = dense_attn(q, k, v, bq=128, bk=128, interpret=True)
    o_ref, lse_ref = ops.dense_attn_ref(q, k, v)
    np.testing.assert_allclose(o, o_ref, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(lse, lse_ref, atol=2e-3, rtol=2e-3)


def test_colsum_attn_kernel():
    q, k, v = rand_qkv(s=256)
    _, prev_lse = ops.dense_attn_ref(q, k, v)
    o, cs, lse = dense_colsum_attn(q, k, v, prev_lse, qg=128, bk=128,
                                   score_block=32, interpret=True)
    o_ref, cs_ref, lse_ref = ops.dense_colsum_attn_ref(q, k, v, prev_lse, 128)
    np.testing.assert_allclose(o, o_ref, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(lse, lse_ref, atol=2e-3, rtol=2e-3)
    cs_blk_ref = ops.blockify_scores(cs_ref, 32)
    np.testing.assert_allclose(cs, cs_blk_ref, atol=1e-2, rtol=1e-3)


@pytest.mark.parametrize('kv_block,mode', [(128, 'vmem'), (32, 'vmem'),
                                           (128, 'hbm'), (32, 'hbm')])
def test_csp_attn_kernel_vs_ref(kv_block, mode):
    q, k, v = rand_qkv(s=512)
    B, H, S, D = q.shape
    qg = 128
    G, NB = S // qg, S // kv_block
    key = jax.random.PRNGKey(11)
    mask = jax.random.bernoulli(key, 0.4, (B, H, G, NB))
    mask = mask.at[..., 0].set(True)  # counts >= 1
    inds, counts = ops.mask_to_indices(mask, multiple_of=1)
    o = csp_attn(q, k, v, inds, counts, qg=qg, kv_block=kv_block,
                 mode=mode, interpret=True)
    o_ref = ops.csp_block_attn_ref(q, k, v, inds, counts, qg, kv_block)
    np.testing.assert_allclose(o, o_ref, atol=2e-3, rtol=2e-3)


def test_csp_attn_full_blocks_equals_dense():
    q, k, v = rand_qkv(s=256)
    B, H, S, D = q.shape
    qg = kv_block = 128
    G, NB = S // qg, S // kv_block
    inds = jnp.broadcast_to(jnp.arange(NB, dtype=jnp.int32), (B, H, G, NB))
    counts = jnp.full((B, H, G), NB, jnp.int32)
    o = csp_attn(q, k, v, inds, counts, qg=qg, kv_block=kv_block,
                 interpret=True)
    o_ref, _ = ops.dense_attn_ref(q, k, v)
    np.testing.assert_allclose(o, o_ref, atol=2e-3, rtol=2e-3)


def test_csp_mlp_kernels_vs_ref():
    T, C, N, bn = 256, 64, 512, 64
    M, NB = T // 128, N // bn
    ks = jax.random.split(jax.random.PRNGKey(4), 8)
    x = jax.random.normal(ks[0], (T, C), jnp.float32) * 0.5
    w1t = jax.random.normal(ks[1], (N, C), jnp.float32) * 0.1
    b1 = jax.random.normal(ks[2], (N,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (N, C), jnp.float32) * 0.1
    act_cache = jax.random.normal(ks[4], (T, N), jnp.float32) * 0.5
    out_cache = jax.random.normal(ks[5], (T, C), jnp.float32) * 0.5
    mask = jax.random.bernoulli(ks[6], 0.5, (M, NB)).at[:, 0].set(True)
    inds, counts = ops.mask_to_indices(mask, multiple_of=1)

    new_out, new_cache = csp_mlp(x, w1t, b1, w2, act_cache, out_cache,
                                 inds, counts, bn=bn, interpret=True)
    # expand block indices to token-granular neuron indices for the reference
    tinds = (inds[..., None] * bn + jnp.arange(bn)).reshape(M, -1)
    tcounts = counts * bn
    ref_out, ref_cache = ops.csp_mlp_ref(
        x, w1t.T, b1, w2, tinds.astype(jnp.int32), tcounts,
        act_cache, out_cache, bm=128,
        act=lambda z: jax.nn.gelu(z, approximate=True))
    np.testing.assert_allclose(new_cache, ref_cache, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(new_out, ref_out, atol=1e-2, rtol=1e-3)


def test_csp_mlp_full_indices_equals_dense_delta():
    """With all blocks selected, cache becomes exactly act(fc1 x) and
    out_cache advances by the full delta — telescoping to dense."""
    T, C, N, bn = 128, 64, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(9), 6)
    x0 = jax.random.normal(ks[0], (T, C)) * 0.5
    x1 = jax.random.normal(ks[5], (T, C)) * 0.5
    w1t = jax.random.normal(ks[1], (N, C)) * 0.1
    b1 = jax.random.normal(ks[2], (N,)) * 0.1
    w2 = jax.random.normal(ks[3], (N, C)) * 0.1
    act = lambda z: jax.nn.gelu(z, approximate=True)
    # full step at x0
    out0, mid0, pa0 = ops.dense_mlp_ref(x0, w1t.T, b1, w2,
                                        jnp.zeros((C,)), act)
    M, NB = 1, N // bn
    inds = jnp.arange(NB, dtype=jnp.int32)[None, :]
    counts = jnp.full((M,), NB, jnp.int32)
    new_out, new_cache = csp_mlp(x1, w1t, b1, w2, pa0, out0, inds, counts,
                                 bn=bn, interpret=True)
    out1, _, pa1 = ops.dense_mlp_ref(x1, w1t.T, b1, w2, jnp.zeros((C,)), act)
    np.testing.assert_allclose(new_cache, pa1, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(new_out, out1, atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize('mode', ['vmem', 'hbm'])
def test_csp_attn_kv_valid_excludes_pad(mode):
    """Keys past kv_valid (model-level padding tail) must not contribute:
    perturbing them wildly cannot change the output, and the result matches
    the block reference with the same kv_valid."""
    b, h, s, d, kvb = 1, 2, 256, 128, 32
    kv_valid = 200          # pad spans 56 tokens = 1 partial + 1 full block
    q, k, v = rand_qkv(b, h, s, d)
    nb = s // kvb
    jmax = 6
    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    scores = jax.random.uniform(ks[0], (b, h, s // 128, nb))
    mask = ops.topk_mask(scores, 4)
    # force the partial and the fully-invalid block into the selection
    mask = mask.at[..., nb - 2:].set(True)
    inds, counts = ops.mask_to_indices(mask, multiple_of=1)
    inds, counts = inds[..., :jmax], jnp.clip(counts, 1, jmax)
    o = csp_attn(q, k, v, inds, counts, qg=128, kv_block=kvb, mode=mode,
                 kv_valid=kv_valid, interpret=True)
    o_ref = ops.csp_block_attn_ref(q, k, v, inds, counts, 128, kvb,
                                   kv_valid=kv_valid)
    np.testing.assert_allclose(o, o_ref, atol=2e-3, rtol=2e-3)
    # perturbation invariance
    k2 = k.at[..., kv_valid:, :].set(100.0)
    v2 = v.at[..., kv_valid:, :].set(-100.0)
    o2 = csp_attn(q, k2, v2, inds, counts, qg=128, kv_block=kvb, mode=mode,
                  kv_valid=kv_valid, interpret=True)
    np.testing.assert_allclose(o, o2, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize('wq', [False, True])
def test_csp_mlp_fused_matches_two_kernel(wq):
    """Fused mm1+mm2 == the two-kernel chain (packed delta never hits
    HBM in the fused path)."""
    from chipmunk_tpu.kernels.csp_mlp import csp_mlp_fused, csp_mlp_mm1, \
        csp_mlp_mm2
    from chipmunk_tpu.utils.quant import quantize
    T, C, N, bn, bm = 256, 128, 512, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    w1t = jax.random.normal(ks[1], (N, C)) * C ** -0.5
    b1 = jax.random.normal(ks[2], (N,)) * 0.1
    w2 = jax.random.normal(ks[3], (N, C)) * N ** -0.5
    cache = jax.random.normal(ks[4], (T, N), jnp.float32) * 0.1
    out = jax.random.normal(ks[5], (T, C), jnp.float32) * 0.1
    M = T // bm
    inds = jnp.tile(jnp.asarray([[0, 2, 3]], jnp.int32), (M, 1))
    counts = jnp.asarray([3, 2], jnp.int32)
    if wq:
        # int8, not fp8: the kernels refuse fp8 QTensor weights (a
        # measured perf trap — see test_csp_mlp_rejects_fp8_weights)
        w1t = quantize(w1t, 'int8', keep_axes=(0,))
        w2 = quantize(w2, 'int8', keep_axes=(0,))
    o1, c1 = csp_mlp_fused(x, w1t, b1, w2, cache, out, inds, counts,
                           bn=bn, bm=bm, interpret=True)
    packed, c2 = csp_mlp_mm1(x, w1t, b1, cache, inds, counts,
                             bn=bn, bm=bm, interpret=True)
    o2 = csp_mlp_mm2(packed, w2, out, inds, counts, bn=bn, bm=bm,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               atol=1e-6, rtol=1e-6)


def test_csp_mlp_rejects_fp8_weights():
    """The sparse MLP kernels must never accept fp8 QTensor weights
    (Mosaic-emulated fp8 converts make them slower than dense, docs/
    DESIGN.md; mlp.is_fp8 maps to int8 storage instead — VERDICT r3
    weak #5)."""
    from chipmunk_tpu.kernels.csp_mlp import (csp_mlp_fused, csp_mlp_mm1,
                                              csp_mlp_mm2)
    from chipmunk_tpu.utils.quant import quantize
    T, C, N, bn, bm = 128, 128, 256, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    w8 = quantize(jax.random.normal(ks[1], (N, C)) * 0.1, 'fp8',
                  keep_axes=(0,))
    b1 = jnp.zeros((N,))
    cache = jnp.zeros((T, N))
    out = jnp.zeros((T, C))
    inds = jnp.zeros((1, 1), jnp.int32)
    counts = jnp.ones((1,), jnp.int32)
    with pytest.raises(ValueError, match='fp8'):
        csp_mlp_mm1(x, w8, b1, cache, inds, counts, bn=bn, bm=bm,
                    interpret=True)
    with pytest.raises(ValueError, match='fp8'):
        csp_mlp_mm2(jnp.zeros((T, bn)), w8, out, inds, counts, bn=bn,
                    bm=bm, interpret=True)
    with pytest.raises(ValueError, match='fp8'):
        csp_mlp_fused(x, w8, b1, w8, cache, out, inds, counts, bn=bn,
                      bm=bm, interpret=True)


def test_csp_mlp_int4_matches_dequant_reference():
    """int4 plane-packed weights: the in-kernel _dq4 path (fused AND
    two-kernel) must match the eager dequant reference."""
    from chipmunk_tpu.kernels.csp_mlp import (csp_mlp_fused, csp_mlp_mm1,
                                              csp_mlp_mm2)
    from chipmunk_tpu.ops import mlp_ref
    from chipmunk_tpu.utils.quant import quantize, dequant
    T, C, N, bn, bm = 256, 256, 512, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(9), 6)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    w1t = jax.random.normal(ks[1], (N, C)) * C ** -0.5
    b1 = jax.random.normal(ks[2], (N,)) * 0.1
    w2 = jax.random.normal(ks[3], (N, C)) * N ** -0.5
    cache = jax.random.normal(ks[4], (T, N), jnp.float32) * 0.1
    out = jax.random.normal(ks[5], (T, C), jnp.float32) * 0.1
    M = T // bm
    inds = jnp.tile(jnp.asarray([[0, 2, 3]], jnp.int32), (M, 1))
    counts = jnp.asarray([3, 2], jnp.int32)
    w1q = quantize(w1t, 'int4', keep_axes=(0,), pack_axis=1)
    w2q = quantize(w2, 'int4', keep_axes=(0,), pack_axis=1)
    assert w1q.q.shape == (N, C // 2)

    o1, c1 = csp_mlp_fused(x, w1q, b1, w2q, cache, out, inds, counts,
                           bn=bn, bm=bm, interpret=True)
    packed, c2 = csp_mlp_mm1(x, w1q, b1, cache, inds, counts,
                             bn=bn, bm=bm, interpret=True)
    o2 = csp_mlp_mm2(packed, w2q, out, inds, counts, bn=bn, bm=bm,
                     interpret=True)
    # eager reference on the dequantized weights
    w1d, w2d = dequant(w1q, jnp.float32), dequant(w2q, jnp.float32)
    tinds = (inds[..., None] * bn + jnp.arange(bn)).reshape(M, -1)
    o_ref, c_ref = mlp_ref.csp_mlp_ref(
        x, w1d.T, b1, w2d, tinds.astype(jnp.int32), counts * bn,
        cache, out, bm=bm,
        act=lambda z: jax.nn.gelu(z, approximate=True))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o_ref),
                               atol=3e-3, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o_ref),
                               atol=3e-3, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c_ref),
                               atol=1e-5, rtol=1e-5)


def test_dense_attn_long_kv_pad_tails():
    """Long-KV shapes with partial final slabs (Sk not a multiple of bk,
    including an all-pad final block) must match the eager reference.
    (Kept from the deleted chains=2 variant — the pad cases still bite.)"""
    from chipmunk_tpu.kernels.flash_attention import dense_attn
    from chipmunk_tpu.ops import attn_ref
    B, H, D = 1, 2, 64
    for Sk in (1024, 1024 + 130, 1024 + 700):   # exact / chain-1-all-pad /
        Sq = 256                                 # partial chain-1
        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        q = jax.random.normal(ks[0], (B, H, Sq, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, H, Sk, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, H, Sk, D), jnp.float32)
        o, lse = dense_attn(q, k, v, bq=128, bk=128, interpret=True)
        o_ref, lse_ref = attn_ref.dense_attn_ref(q, k, v)
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize('qkind', ['int8', 'int4'])
def test_csp_mlp_a8_matches_reference(qkind):
    """int8-activation path (a8): per-row dynamically quantized activations
    against int8/int4 weights must track the eager dequant reference within
    quantization tolerance, and add only a small error over the bf16-
    activation quantized path."""
    from chipmunk_tpu.kernels.csp_mlp import csp_mlp_fused
    from chipmunk_tpu.ops import mlp_ref
    from chipmunk_tpu.utils.quant import quantize, dequant
    T, C, N, bn, bm = 256, 256, 1024, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    x = jax.random.normal(ks[0], (T, C), jnp.float32)
    w1t = jax.random.normal(ks[1], (N, C)) * C ** -0.5
    b1 = jax.random.normal(ks[2], (N,)) * 0.1
    w2 = jax.random.normal(ks[3], (N, C)) * N ** -0.5
    cache = jax.random.normal(ks[4], (T, N), jnp.float32) * 0.1
    out = jax.random.normal(ks[5], (T, C), jnp.float32) * 0.1
    M = T // bm
    inds = jnp.tile(jnp.asarray([[0, 2, 5]], jnp.int32), (M, 1))
    counts = jnp.asarray([3, 2], jnp.int32)
    pa = 1 if qkind == 'int4' else None
    w1q = quantize(w1t, qkind, keep_axes=(0,), pack_axis=pa)
    w2q = quantize(w2, qkind, keep_axes=(0,), pack_axis=pa)

    o8, c8 = csp_mlp_fused(x, w1q, b1, w2q, cache, out, inds, counts,
                           bn=bn, bm=bm, interpret=True, a8=True)
    ob, cb = csp_mlp_fused(x, w1q, b1, w2q, cache, out, inds, counts,
                           bn=bn, bm=bm, interpret=True, a8=False)
    # eager reference on the dequantized weights
    w1d, w2d = dequant(w1q, jnp.float32), dequant(w2q, jnp.float32)
    tinds = (inds[..., None] * bn + jnp.arange(bn)).reshape(M, -1)
    o_ref, c_ref = mlp_ref.csp_mlp_ref(
        x, w1d.T, b1, w2d, tinds.astype(jnp.int32), counts * bn,
        cache, out, bm=bm,
        act=lambda z: jax.nn.gelu(z, approximate=True))

    def rel(a, b):
        return float(np.linalg.norm(np.asarray(a - b)) /
                     np.linalg.norm(np.asarray(b)))

    # a8 vs the eager reference: bounded by quant noise
    assert rel(o8, o_ref) < 2.5e-2, rel(o8, o_ref)
    assert rel(c8, c_ref) < 2.5e-2, rel(c8, c_ref)
    # a8's extra error over the bf16-activation quantized kernel is small
    assert rel(o8, ob) < 1.5e-2, rel(o8, ob)


def test_csp_mlp_a8_requires_quantized_weights():
    from chipmunk_tpu.kernels.csp_mlp import csp_mlp_fused
    T, C, N, bn, bm = 128, 128, 256, 128, 128
    x = jnp.zeros((T, C))
    w1t = jnp.zeros((N, C))
    w2 = jnp.zeros((N, C))
    with pytest.raises(AssertionError):
        csp_mlp_fused(x, w1t, jnp.zeros((N,)), w2, jnp.zeros((T, N)),
                      jnp.zeros((T, C)), jnp.zeros((1, 2), jnp.int32),
                      jnp.ones((1,), jnp.int32), bn=bn, bm=bm,
                      interpret=True, a8=True)
