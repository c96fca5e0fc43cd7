"""Property tests for the eager reference ops (SURVEY.md §4: the test layer
the reference lacks — sparse(all-indices) == dense, round trips, etc.)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chipmunk_tpu import ops

KEY = jax.random.PRNGKey(0)


def rand_qkv(b=1, h=2, s=256, d=64, dtype=jnp.float32):
    ks = jax.random.split(KEY, 3)
    return tuple(jax.random.normal(k, (b, h, s, d), dtype) for k in ks)


# ---------------------------------------------------------------- attention

def test_dense_attn_matches_softmax():
    q, k, v = rand_qkv()
    o, lse = ops.dense_attn_ref(q, k, v)
    # plain softmax reference
    s = jnp.einsum('bhid,bhjd->bhij', q, k) / jnp.sqrt(q.shape[-1] * 1.0)
    expect = jax.nn.softmax(s, axis=-1) @ v
    np.testing.assert_allclose(o, expect, atol=5e-4, rtol=5e-4)
    # lse: log2 of sum of 2^(scaled scores)
    expect_lse = jax.scipy.special.logsumexp(
        s * ops.LOG2E * np.log(2), axis=-1) / np.log(2)
    np.testing.assert_allclose(lse, expect_lse, atol=1e-4, rtol=1e-4)


def test_csp_attn_full_indices_equals_dense():
    """sparse(all-indices) == dense (reference test_csp_attn.py pattern)."""
    q, k, v = rand_qkv(s=256)
    B, H, S, D = q.shape
    qg = 128
    G = S // qg
    inds = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, H, G, S))
    counts = jnp.full((B, H, G), S, jnp.int32)
    o_sparse = ops.csp_attn_ref(q, k, v, inds, counts, qg)
    o_dense, _ = ops.dense_attn_ref(q, k, v)
    np.testing.assert_allclose(o_sparse, o_dense, atol=5e-4, rtol=5e-4)


def test_csp_block_attn_equals_token_csp():
    q, k, v = rand_qkv(s=256)
    B, H, S, D = q.shape
    qg, bk = 128, 16
    G, NB = S // qg, S // bk
    key = jax.random.PRNGKey(3)
    # random 50% of blocks per group
    nsel = NB // 2
    binds = jnp.stack([
        jax.random.permutation(jax.random.fold_in(key, i), NB)[:nsel]
        for i in range(B * H * G)
    ]).reshape(B, H, G, nsel).astype(jnp.int32)
    bcounts = jnp.full((B, H, G), nsel, jnp.int32)
    o_blk = ops.csp_block_attn_ref(q, k, v, binds, bcounts, qg, bk)
    # expand to token indices
    tinds = (binds[..., None] * bk + jnp.arange(bk)).reshape(B, H, G, -1)
    tcounts = bcounts * bk
    o_tok = ops.csp_attn_ref(q, k, v, tinds.astype(jnp.int32), tcounts, qg)
    np.testing.assert_allclose(o_blk, o_tok, atol=5e-4, rtol=5e-4)


def test_colsum_attention():
    """colsums == per-group sums of prev-step-normalized probabilities
    (reference test_dense_colsum_attn.py:29-37 semantics)."""
    q, k, v = rand_qkv(s=256)
    qg = 128
    _, prev_lse = ops.dense_attn_ref(q, k, v)  # pretend prev step == this
    o, cs, lse = ops.dense_colsum_attn_ref(q, k, v, prev_lse, qg)
    o_ref, lse_ref = ops.dense_attn_ref(q, k, v)
    np.testing.assert_allclose(o, o_ref, atol=5e-4)
    np.testing.assert_allclose(lse, lse_ref, atol=1e-4)
    # with prev_lse == current lse, probs are a true softmax: each group's
    # colsums sum to qg over all columns
    np.testing.assert_allclose(cs.sum(-1), qg, rtol=1e-4)
    # explicit check
    s2 = jnp.einsum('bhid,bhjd->bhij', q, k) * ops.attn_scale(q.shape[-1])
    p = jnp.exp2(s2 - prev_lse[..., None])
    B, H, S, _ = q.shape
    expect = p.reshape(B, H, S // qg, qg, S).sum(3)
    np.testing.assert_allclose(cs, expect, atol=1e-4, rtol=1e-4)


def test_delta_cache_telescoping():
    """The core algebra (reference modules/attn.py:164-190):
    cache = dense - csp(full inputs); later with SAME inputs and indices,
    cache + csp == dense."""
    q, k, v = rand_qkv(s=256)
    B, H, S, D = q.shape
    qg = 128
    G = S // qg
    key = jax.random.PRNGKey(7)
    mask = jax.random.bernoulli(key, 0.3, (B, H, G, S))
    inds, counts = ops.mask_to_indices(mask, multiple_of=1)
    o_dense, _ = ops.dense_attn_ref(q, k, v)
    csp = ops.csp_attn_ref(q, k, v, inds, counts, qg)
    cache = o_dense - csp
    out = cache + ops.csp_attn_ref(q, k, v, inds, counts, qg)
    np.testing.assert_allclose(out, o_dense, atol=5e-4)


# ---------------------------------------------------------------- indexing

def test_mask_to_indices_counts_rounded_up():
    mask = jnp.zeros((2, 16), jnp.bool_).at[0, :5].set(True).at[1, 3].set(True)
    inds, counts = ops.mask_to_indices(mask, multiple_of=4)
    assert counts.tolist() == [8, 4]
    # selected indices first, ascending
    assert inds[0, :5].tolist() == [0, 1, 2, 3, 4]
    assert inds[1, 0] == 3
    # padding entries are valid column ids
    assert (inds >= 0).all() and (inds < 16).all()


def test_topk_indices_mlp():
    scores = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (4, 512)))
    inds, counts, mask = ops.topk_indices(scores, sparsity=0.7,
                                          multiple_of=64, random_frac=0.0,
                                          key=jax.random.PRNGKey(2))
    k = round(0.3 * 512)
    assert mask.sum(-1).tolist() == [k] * 4
    assert (counts >= k).all() and (counts % 64 == 0).all()
    # top-k selected: every selected score >= every unselected score
    sel_min = jnp.where(mask, scores, jnp.inf).min(-1)
    unsel_max = jnp.where(mask, -jnp.inf, scores).max(-1)
    assert (sel_min >= unsel_max).all()


def test_copy_indices():
    new = jnp.ones((2, 8))
    cache = jnp.zeros((2, 8))
    sel = jnp.zeros((2, 8), jnp.bool_).at[:, ::2].set(True)
    out = ops.copy_indices(new, cache, sel)
    assert out[:, ::2].sum() == 8 and out[:, 1::2].sum() == 0


def test_blockify():
    s = jnp.arange(16, dtype=jnp.float32).reshape(1, 16)
    b = ops.blockify_scores(s, 4)
    assert b.tolist() == [[6.0, 22.0, 38.0, 54.0]]


# ---------------------------------------------------------------- bitpack

def test_bitpack_roundtrip():
    mask = jax.random.bernoulli(jax.random.PRNGKey(5), 0.3, (3, 7, 11))
    packed, shape = ops.bitpack(mask)
    assert packed.dtype == jnp.uint8
    assert packed.size == -(-mask.size // 8)
    out = ops.bitunpack(packed, shape)
    assert (out == mask).all()


# ---------------------------------------------------------------- reorders

def test_patchify_roundtrip():
    x = jnp.arange(2 * 16 * 24).reshape(2, 16, 24).astype(jnp.float32)
    p = ops.patchify(x, 8, 4)
    assert p.shape == (2, 16 * 24)
    back = ops.unpatchify(p, (2, 16, 24), 8, 4)
    assert (back == x).all()


def test_patchify_locality():
    """First 64 tokens of patch order = one 8x8 spatial chunk."""
    from chipmunk_tpu.ops.patch import patch_order
    p = patch_order(16, 24, 8, 4)
    rows, cols = p[:64] // 24, p[:64] % 24
    assert rows.max() < 8 and cols.max() < 8


def test_voxel_roundtrip_divisible_and_not():
    for (t, h, w) in [(8, 8, 16), (33, 45, 10)]:  # non-multiple Hunyuan-ish
        x = jnp.arange(1 * 1 * t * h * w * 2, dtype=jnp.float32)
        x = x.reshape(1, 1, t, h, w, 2)
        c = ops.voxel_chunk_no_padding(x, (4, 4, 8))
        assert c.shape == (1, 1, t * h * w, 2)
        back = ops.reverse_voxel_chunk_no_padding(c, x.shape, (4, 4, 8))
        assert (back == x).all()


def test_voxel_order_main_region_contiguous():
    from chipmunk_tpu.ops.voxel import voxel_order
    p = voxel_order(8, 8, 16, (4, 4, 8))
    # first voxel = raster block t<4, h<4, w<8
    t, rem = p[:128] // (8 * 16), p[:128] % (8 * 16)
    h, w = rem // 16, rem % 16
    assert t.max() < 4 and h.max() < 4 and w.max() < 8


def test_local_voxel_indices_window():
    inds = ops.get_local_voxel_indices((4, 4, 4), (2, 2, 2))
    assert inds.shape == (64, 27)
    # center voxel (1,1,1) -> 3x3x3 cube around it
    row = inds[1 * 16 + 1 * 4 + 1]
    expect = sorted((t * 16 + h * 4 + w)
                    for t in range(3) for h in range(3) for w in range(3))
    assert sorted(row.tolist()) == expect
    # corner voxel window is shifted in-bounds, not clipped smaller
    assert len(set(inds[0].tolist())) == 27


def test_static_mask_with_text():
    mask, inds, counts = ops.get_local_indices_with_text(
        vid_shape=(8, 8, 16), txt_len=64, voxel_shape=(4, 4, 8),
        local_shape=(2, 2, 2), rk=0.0)
    S = 8 * 8 * 16 + 64
    G = -(-S // 128)
    assert mask.shape == (G, S)
    # all queries attend to text
    assert mask[:, 8 * 8 * 16:].all()
    # counts multiple of kv tile (or clamped to S)
    assert (((counts % 128) == 0) | (counts == S)).all()
    # text rows attend to nearly everything (last kv-aligned columns)
    assert mask[-1, -((S // 128) * 128):].all()


def test_mask_to_indices_limited_matches_full():
    """Binary-search compaction == argsort compaction on the consumed
    [..., :jmax] prefix, across densities incl. all/none selected."""
    from chipmunk_tpu.ops.indexing import (mask_to_indices,
                                           mask_to_indices_limited)
    rng = np.random.default_rng(5)
    for p in (0.0, 0.03, 0.3, 0.97, 1.0):
        mask = jnp.asarray(rng.random((3, 7, 93)) < p)
        for mult in (1, 4):
            jmax = 24
            i_full, c_full = mask_to_indices(mask, mult)
            i_lim, c_lim = mask_to_indices_limited(mask, mult, jmax)
            np.testing.assert_array_equal(np.asarray(c_lim),
                                          np.asarray(c_full))
            np.testing.assert_array_equal(np.asarray(i_lim),
                                          np.asarray(i_full)[..., :jmax])
