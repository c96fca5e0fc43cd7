"""Sparse module behavior over multi-step schedules (eager backend on CPU).

Validates the delta-cache algebra end to end: when inputs don't change
between steps, sparse steps reproduce the full-step output exactly
(reference invariant from modules/attn.py:164-190 and mlp.py:51-120)."""
import jax
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.config import AttnConfig, MlpConfig
from chipmunk_tpu.modules import SparseDiffAttn, SparseDiffMlp

KEY = jax.random.PRNGKey(0)


def make_attn(s=512, top_keys=0.4, kv_block=32):
    cfg = AttnConfig(top_keys=top_keys, kv_block=kv_block, random_keys=0.0,
                     counts_multiple_of=kv_block, max_selected_frac=1.0)
    return SparseDiffAttn.build(cfg, s, use_kernels=False)


def test_attn_full_then_sparse_same_inputs():
    mod = make_attn()
    B, H, S, D = 1, 2, 512, 64
    ks = jax.random.split(KEY, 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D)) for kk in ks)
    st = mod.init_state(B, H, D, jnp.float32)

    o0, st = mod(q, k, v, st, step_index=0, is_full=True, is_colsum=False,
                 layer_is_dense=False)
    # step 1: colsum full step establishes indices + cache
    o1, st = mod(q, k, v, st, step_index=1, is_full=True, is_colsum=True,
                 layer_is_dense=False, key=jax.random.PRNGKey(1))
    # sparse step with identical inputs must reproduce the dense output
    o2, st = mod(q, k, v, st, step_index=2, is_full=False, is_colsum=False,
                 layer_is_dense=False)
    np.testing.assert_allclose(o2, o1, atol=1e-4, rtol=1e-4)
    # full plain step re-caches; sparse again still matches
    o3, st = mod(q, k, v, st, step_index=3, is_full=True, is_colsum=False,
                 layer_is_dense=False)
    o4, st = mod(q, k, v, st, step_index=4, is_full=False, is_colsum=False,
                 layer_is_dense=False)
    np.testing.assert_allclose(o4, o3, atol=1e-4, rtol=1e-4)


def test_attn_sparse_tracks_slowly_changing_inputs():
    """With a small perturbation, sparse output should stay close to true
    dense attention — the core approximation claim (README.md:97-103)."""
    mod = make_attn(top_keys=0.6)
    B, H, S, D = 1, 2, 512, 64
    ks = jax.random.split(KEY, 4)
    q, k, v = (jax.random.normal(kk, (B, H, S, D)) for kk in ks[:3])
    st = mod.init_state(B, H, D, jnp.float32)
    _, st = mod(q, k, v, st, step_index=0, is_full=True, is_colsum=False,
                layer_is_dense=False)
    _, st = mod(q, k, v, st, step_index=1, is_full=True, is_colsum=True,
                layer_is_dense=False, key=jax.random.PRNGKey(1))
    dq = 0.03 * jax.random.normal(ks[3], q.shape)
    o_sparse, st = mod(q + dq, k, v, st, step_index=2, is_full=False,
                       is_colsum=False, layer_is_dense=False)
    from chipmunk_tpu.ops import dense_attn_ref
    o_true, _ = dense_attn_ref(q + dq, k, v)
    # error of sparse approx should be much smaller than the step-to-step
    # output change it is approximating
    change = np.abs(np.asarray(o_true) - np.asarray(
        dense_attn_ref(q, k, v)[0])).mean()
    err = np.abs(np.asarray(o_sparse) - np.asarray(o_true)).mean()
    assert err < change, (err, change)


def test_attn_dense_layer_passthrough():
    mod = make_attn()
    B, H, S, D = 1, 2, 512, 64
    ks = jax.random.split(KEY, 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D)) for kk in ks)
    st = mod.init_state(B, H, D, jnp.float32)
    o, st2 = mod(q, k, v, st, step_index=5, is_full=False, is_colsum=False,
                 layer_is_dense=True)
    from chipmunk_tpu.ops import dense_attn_ref
    np.testing.assert_allclose(o, dense_attn_ref(q, k, v)[0],
                               atol=1e-4, rtol=1e-4)
    assert st2 is st  # untouched


def make_mlp(t=256, c=64, n=512, top_keys=0.5, bn=32):
    cfg = MlpConfig(top_keys=top_keys, neuron_block=bn, random_keys=0.0,
                    counts_multiple_of=bn, max_selected_frac=1.0)
    return SparseDiffMlp.build(cfg, t, c, n, use_kernels=False)


def mlp_weights(c=64, n=512):
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    w1t = jax.random.normal(ks[0], (n, c)) * 0.1
    b1 = jax.random.normal(ks[1], (n,)) * 0.1
    w2 = jax.random.normal(ks[2], (n, c)) * 0.1
    b2 = jax.random.normal(ks[3], (c,)) * 0.1
    return w1t, b1, w2, b2


def test_mlp_full_then_sparse_same_inputs():
    mod = make_mlp()
    w1t, b1, w2, b2 = mlp_weights()
    x = jax.random.normal(jax.random.PRNGKey(3), (256, 64)) * 0.5
    st = mod.init_state(jnp.float32)
    o_full, st = mod(x, w1t, b1, w2, b2, st, is_full=True,
                     recompute_mask=False, layer_is_dense=False)
    # sparse step, same x: deltas are zero -> output unchanged
    o_sp, st = mod(x, w1t, b1, w2, None, st, is_full=False,
                   recompute_mask=True, layer_is_dense=False,
                   key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(o_sp, o_full, atol=1e-4, rtol=1e-4)


def test_mlp_sparse_tracks_dense_with_full_selection():
    """With all neuron blocks selected, a sparse step == dense recompute
    (up to fc2-bias handling: bias lives in the cache)."""
    mod = make_mlp(top_keys=1.0)
    w1t, b1, w2, b2 = mlp_weights()
    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    x0 = jax.random.normal(ks[0], (256, 64)) * 0.5
    x1 = jax.random.normal(ks[1], (256, 64)) * 0.5
    st = mod.init_state(jnp.float32)
    _, st = mod(x0, w1t, b1, w2, b2, st, is_full=True, recompute_mask=False,
                layer_is_dense=False)
    o_sp, st = mod(x1, w1t, b1, w2, None, st, is_full=False,
                   recompute_mask=True, layer_is_dense=False,
                   key=jax.random.PRNGKey(6))
    o_dense = mod.dense(x1, w1t, b1, w2, b2)
    np.testing.assert_allclose(o_sp, o_dense, atol=1e-3, rtol=1e-3)


def test_mlp_index_recompute_updates_bm_mid_only_at_selected():
    mod = make_mlp(top_keys=0.25)
    w1t, b1, w2, b2 = mlp_weights()
    ks = jax.random.split(jax.random.PRNGKey(8), 2)
    x0 = jax.random.normal(ks[0], (256, 64)) * 0.5
    x1 = x0 + 0.2 * jax.random.normal(ks[1], (256, 64))
    st = mod.init_state(jnp.float32)
    _, st = mod(x0, w1t, b1, w2, b2, st, is_full=True, recompute_mask=False,
                layer_is_dense=False)
    bm_mid_before = st.bm_mid
    _, st = mod(x1, w1t, b1, w2, None, st, is_full=False,
                recompute_mask=True, layer_is_dense=False,
                key=jax.random.PRNGKey(9))
    changed = np.asarray(st.bm_mid != bm_mid_before)
    # some neurons refreshed, some kept
    assert changed.any() and not changed.all()


def test_attn_valid_len_pad_keys_inert():
    """With valid_len set, wildly perturbing K/V in the pad tail must not
    change any step's output for real queries, and pad queries' stored lse
    must be PAD_LSE (so they contribute 0 to the next colsum selection)."""
    from chipmunk_tpu.ops.attn_ref import PAD_LSE
    cfg = AttnConfig(top_keys=0.4, kv_block=32, counts_multiple_of=32,
                     random_keys=0.0, should_compress_indices=False)
    B, H, S, D, valid = 1, 2, 256, 64, 200
    mod = SparseDiffAttn.build(cfg, S, use_kernels=False, valid_len=valid)
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.float32) for kk in ks)
    k2 = k.at[..., valid:, :].set(77.0)
    v2 = v.at[..., valid:, :].set(-77.0)

    st = mod.init_state(B, H, D, jnp.float32)
    key = jax.random.PRNGKey(9)

    def run(k, v):
        s = st
        outs = []
        o, s = mod.full_step_first(q, k, v, s)
        outs.append(o)
        o, s = mod.full_step_colsum(q, k, v, s, key)
        outs.append(o)
        o, s = mod.sparse_step(q, k, v, s)
        outs.append(o)
        o, s = mod.full_step_plain(q, k, v, s)
        outs.append(o)
        return outs, s

    from chipmunk_tpu.ops import attn_ref
    outs1, s1 = run(k, v)
    outs2, s2 = run(k2, v2)
    for o1, o2 in zip(outs1, outs2):
        np.testing.assert_allclose(np.asarray(o1[..., :valid, :]),
                                   np.asarray(o2[..., :valid, :]),
                                   atol=1e-6, rtol=1e-6)
    assert (np.asarray(s1.lse)[..., valid:] == PAD_LSE).all()
    # and the dense result matches plain attention over the valid keys only
    o_ref, _ = attn_ref.dense_attn_ref(q[..., :valid, :], k[..., :valid, :],
                                       v[..., :valid, :])
    np.testing.assert_allclose(np.asarray(outs1[0][..., :valid, :]),
                               np.asarray(o_ref), atol=1e-5, rtol=1e-5)


def test_attn_compressed_index_storage_parity():
    """should_compress_indices stores an 8x-smaller bitpacked mask and
    rebuilds identical indices on consuming steps (reference
    attn.py:134-139/173-179): outputs match a run that keeps explicit
    indices for the same selection mask (VERDICT r1 item 8)."""
    import dataclasses
    B, H, S, D = 1, 2, 512, 64
    base = AttnConfig(top_keys=0.3, kv_block=32, counts_multiple_of=32,
                      random_keys=0.0, should_compress_indices=True,
                      materialize_indices=False)   # packed-only storage
    mod_c = SparseDiffAttn.build(base, S, use_kernels=False)
    # uncompressed twin with the SAME selection semantics: force the
    # compressed module's mask path but explicit storage by flipping the
    # flag after selection — instead, run the plain-topk module on the
    # same colsums (random_keys=0 and no static mask -> random_and_topk
    # reduces to topk union nothing, i.e. identical masks)
    mod_u = SparseDiffAttn.build(
        dataclasses.replace(base, should_compress_indices=False), S,
        use_kernels=False)
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.float32) for kk in ks)
    key = jax.random.PRNGKey(3)

    st_c = mod_c.init_state(B, H, D, jnp.float32)
    st_u = mod_u.init_state(B, H, D, jnp.float32)
    # state-size assertion: packed mask is >= 8x smaller than int32 inds
    assert st_c.packed.size == B * H * (S // 128) * (S // 32 // 8)
    assert st_c.inds.size == 1
    assert (st_u.inds.size * 4) >= 8 * st_c.packed.size

    o_c, st_c = mod_c.full_step_first(q, k, v, st_c)
    o_u, st_u = mod_u.full_step_first(q, k, v, st_u)
    np.testing.assert_allclose(o_c, o_u, atol=1e-6)
    o_c, st_c = mod_c.full_step_colsum(q, k, v, st_c, key)
    o_u, st_u = mod_u.full_step_colsum(q, k, v, st_u, key)
    np.testing.assert_allclose(o_c, o_u, atol=1e-6)
    # compressed rebuild must equal the uncompressed stored indices
    inds_c, counts_c = mod_c._stored_inds(st_c)
    np.testing.assert_array_equal(np.asarray(counts_c),
                                  np.asarray(st_u.counts))
    np.testing.assert_array_equal(np.asarray(inds_c), np.asarray(st_u.inds))
    for step_fn in ('sparse_step', 'full_step_plain', 'sparse_step'):
        o_c, st_c = getattr(mod_c, step_fn)(q, k, v, st_c)
        o_u, st_u = getattr(mod_u, step_fn)(q, k, v, st_u)
        np.testing.assert_allclose(o_c, o_u, atol=1e-5,
                                   err_msg=step_fn)


def test_attn_dense_tail_exact_for_text_groups():
    """Query groups whose static mask covers the whole sequence (text
    rows) are recomputed exactly on sparse steps — no max_selected_frac
    truncation (VERDICT r1 item 7)."""
    import numpy as onp
    B, H, S, D = 1, 2, 512, 64
    G, NB = S // 128, S // 32
    # static mask: last group covers EVERYTHING; others cover 2 blocks
    sm = onp.zeros((G, S), bool)
    sm[:, :64] = True
    sm[-1, :] = True
    cfg = AttnConfig(top_keys=0.1, kv_block=32, counts_multiple_of=32,
                     random_keys=0.0, should_compress_indices=True,
                     max_selected_frac=0.3)
    mod = SparseDiffAttn.build(cfg, S, static_mask_tokens=jnp.asarray(sm),
                               use_kernels=False)
    assert mod.dense_tail_g == G - 1
    # jmax sized by the SPARSE rows only: far below the 0.3 cap over NB
    assert mod.jmax < int(0.3 * NB) + 4
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.float32) for kk in ks)
    st = mod.init_state(B, H, D, jnp.float32)
    o, st = mod.full_step_first(q, k, v, st)
    o, st = mod.full_step_colsum(q, k, v, st, jax.random.PRNGKey(9))
    o_sp, st = mod.sparse_step(q, k, v, st)
    from chipmunk_tpu.ops import attn_ref
    o_dense, _ = attn_ref.dense_attn_ref(q, k, v)
    # tail rows exactly dense
    np.testing.assert_allclose(
        np.asarray(o_sp[..., -128:, :]), np.asarray(o_dense[..., -128:, :]),
        atol=1e-5, rtol=1e-5)


def test_attn_dense_fallback_cost_gate():
    """TPU cost gate: a selection capacity >= dense_fallback_frac of the
    KV blocks flips the layer to exact dense attention every step (Wan's
    local_voxels=5 static mask selects ~59% of blocks; measured on-chip
    that csp cannot beat dense there)."""
    from chipmunk_tpu.ops.attn_ref import dense_attn_ref
    cfg = AttnConfig(top_keys=0.6, kv_block=32, counts_multiple_of=32,
                     random_keys=0.0, max_selected_frac=1.0)
    mod = SparseDiffAttn.build(cfg, 512, use_kernels=False)
    assert mod.fully_dense
    B, H, S, D = 1, 2, 512, 64
    ks = jax.random.split(KEY, 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D)) for kk in ks)
    st = mod.init_state(B, H, D, jnp.float32)
    # tiny (1,1,1,1)-shaped state: no caches carried
    assert st.out_cache.shape == (1, 1, 1, 1)
    o_ref, _ = dense_attn_ref(q, k, v)
    for i, (full, colsum) in enumerate([(True, False), (True, True),
                                        (False, False)]):
        o, st = mod(q, k, v, st, step_index=i, is_full=full,
                    is_colsum=colsum, layer_is_dense=False,
                    key=jax.random.PRNGKey(i))
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   rtol=2e-5, atol=2e-5)
    # gate off -> sparse machinery engaged (real state shapes)
    mod2 = SparseDiffAttn.build(
        AttnConfig(top_keys=0.6, kv_block=32, counts_multiple_of=32,
                   random_keys=0.0, max_selected_frac=1.0,
                   dense_fallback_frac=1.0), 512, use_kernels=False)
    assert not mod2.fully_dense
    assert mod2.init_state(B, H, D, jnp.float32).out_cache.shape[-2] == 512


def test_materialized_indices_match_packed_rebuild():
    """Compressed+materialized state must yield exactly the selection a
    packed-only rebuild produces (the materialized (inds, counts) are a
    deterministic cache of _mask_to_inds(packed))."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from chipmunk_tpu.config import AttnConfig
    from chipmunk_tpu.modules.attn import SparseDiffAttn
    from chipmunk_tpu.ops.bitpack import bitunpack_rows

    cfg = AttnConfig(top_keys=0.1, random_keys=0.01,
                     should_compress_indices=True, counts_multiple_of=32,
                     kv_block=32, mbm=128)
    S = 2048            # jmax well under the dense-fallback gate
    am = SparseDiffAttn.build(cfg, S, use_kernels=False)
    B, H, D = 1, 2, 32
    st = am.init_state(B, H, D)
    assert st.inds.shape[-1] == am.jmax          # materialized by default
    key = jax.random.PRNGKey(0)
    scores = jax.random.uniform(key, (B, H, S // cfg.mbm, S // cfg.kv_block))
    mask = am._select_mask(scores, key)
    inds, counts = am._mask_to_inds(mask)
    st = am._store_selection(st, mask, inds, counts)
    # stored materialized cache is consumed directly...
    i1, c1 = am._stored_inds(st)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(inds))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(counts))
    # ...and equals a from-packed rebuild (what a packed-only state does)
    i2, c2 = am._mask_to_inds(bitunpack_rows(st.packed,
                                             S // cfg.kv_block))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    # packed-only mode (materialize off) still rebuilds
    cfg2 = dataclasses.replace(cfg, materialize_indices=False)
    am2 = SparseDiffAttn.build(cfg2, S, use_kernels=False)
    st2 = am2.init_state(B, H, D)
    assert st2.inds.size == 1                    # placeholder only
    st2 = am2._store_selection(st2, mask, inds, counts)
    i3, c3 = am2._stored_inds(st2)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(c3), np.asarray(c2))
