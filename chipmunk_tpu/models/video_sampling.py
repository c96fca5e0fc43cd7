"""Video denoising loops: HunyuanVideo (guidance-distilled) and Wan2.1
(classifier-free guidance, two model invocations per step).

Rebuilds the reference sampling flows (hyvideo pipeline_hunyuan_video.py:
962-1002 passing inference_step per call; wan text2video.py:239-252 cond +
uncond per step with separate caches) on explicit state pytrees, with step
caching as a host-level decision (skipped steps reuse the last prediction —
reference hunyuan models.py:733-741, wan model.py:580-593).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..schedule import step_plan, fold_skip_steps
from .flux import FluxStep

# jitted-runner cache shared by the samplers below (keyed by model identity,
# schedule and shapes)
_JIT_CACHE: Dict = {}

_MODEL_TOKENS = iter(range(1 << 62))


def _model_token(model) -> int:
    """Unique per-instance cache token.  id(model) would be ambiguous if an
    instance died and a new one reused its address; tokens never recycle."""
    tok = getattr(model, '_jit_cache_token', None)
    if tok is None:
        tok = next(_MODEL_TOKENS)
        object.__setattr__(model, '_jit_cache_token', tok)
    return tok


def _jit_step(model, step: FluxStep, tag: str):
    """One jitted model evaluation per (model, step-kind) for the host-loop
    samplers — eager tracing per step would dominate runtime."""
    sig = (tag, _model_token(model), step.full_attn, step.full_mlp,
           step.colsum, step.recompute_mlp_mask, min(step.index, 2))
    if sig not in _JIT_CACHE:
        if tag == 'hy-step':
            def fn(params, lat, txt, t_vec, y, state, g, key, pe,
                   txt_mask, _step=step):
                return model.forward(params, lat, txt, t_vec, y, state,
                                     _step, guidance=g, key=key, pe=pe,
                                     txt_mask=txt_mask)
            donate = (5,)    # state updates alias in place
        else:
            def fn(params, lat, ctx, t_vec, state, key, pe, _step=step):
                return model.forward(params, lat, ctx, t_vec, state, _step,
                                     key=key, pe=pe)
            donate = (4,)
        _JIT_CACHE[sig] = jax.jit(fn, donate_argnums=donate)
    return _JIT_CACHE[sig]


def hunyuan_denoise(model, params: Dict, latents: jnp.ndarray,
                    txt: jnp.ndarray, y: jnp.ndarray,
                    timesteps: jnp.ndarray,
                    guidance: float = 6.0,
                    key: Optional[jax.Array] = None,
                    callback: Optional[Callable] = None,
                    streamed=None,
                    txt_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Euler flow-matching loop for a HunyuanModel.  latents [B,C,T,H,W].

    streamed: optional (runner, state) from ``model.make_streamed()`` —
    per-layer caches then live host-side per the config's ``offloading:``
    block and the model streams layer-chunk by layer-chunk (the reference's
    offload prefetch pipeline, hunyuan models.py:796-828); required when
    the cache footprint exceeds HBM (video-scale sequences)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    B = latents.shape[0]
    plan = step_plan(model.ck)
    state = model.init_state(B) if streamed is None else None
    runner, sst = streamed if streamed is not None else (None, None)
    if state is not None and getattr(model, 'mesh_info', None):
        # multi-chip (model.sharded(...)): params/inputs/state onto the
        # mesh; attention runs Ulysses head-parallel inside the step
        params, (latents, txt, y, txt_mask), state = model.place(
            params, (latents, txt, y, txt_mask), state)
    pe = model.rope(B)
    g = (jnp.full((B,), guidance, jnp.float32)
         if model.cfg.guidance_embed else None)
    pred = None
    n = min(len(plan), timesteps.shape[0] - 1)
    for i in range(n):
        kind = plan[i]
        t_curr, t_prev = timesteps[i], timesteps[i + 1]
        if kind.skip and pred is not None:
            latents = latents + (t_prev - t_curr) * pred
            if callback:
                callback(i, skipped=True)
            continue
        t_vec = jnp.full((B,), t_curr, jnp.float32)
        step = FluxStep.of(kind, i)
        k_i = jax.random.fold_in(key, i)
        if streamed is not None:
            pred = model.forward_streamed(params, latents, txt, t_vec, y,
                                          runner, sst, step, guidance=g,
                                          key=k_i, pe=pe,
                                          txt_mask=txt_mask)
        else:
            fn = _jit_step(model, step, 'hy-step')
            pred, state = fn(params, latents, txt, t_vec, y, state, g,
                             k_i, pe, txt_mask)
        latents = latents + (t_prev - t_curr) * pred
        if callback:
            callback(i, skipped=False)
    return latents


def wan_denoise(model, params: Dict, latents: jnp.ndarray,
                ctx_cond: jnp.ndarray, ctx_uncond: jnp.ndarray,
                timesteps: jnp.ndarray, guide_scale: float = 5.0,
                key: Optional[jax.Array] = None,
                callback: Optional[Callable] = None) -> jnp.ndarray:
    """CFG loop for a WanModel: cond + uncond invocations per step, each
    with its own cache state (reference text2video.py:246-252; the
    reference's invocation-buffer rotation, layer_storage.py:120-128, is
    simply two explicit states here).  On skipped steps BOTH invocations'
    predictions are reused (reference keeps two CPU step caches,
    model.py:580-593)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    B = latents.shape[0]
    plan = step_plan(model.ck)
    st_c, st_u = model.init_cfg_states(B)
    if getattr(model, 'mesh_info', None):
        params, (latents, ctx_cond, ctx_uncond), st_c = model.place(
            params, (latents, ctx_cond, ctx_uncond), st_c)
        _, _, st_u = model.place(params, (), st_u)
    pe = model.rope(B)
    pred = None
    n = min(len(plan), timesteps.shape[0] - 1)
    for i in range(n):
        kind = plan[i]
        t_curr, t_prev = timesteps[i], timesteps[i + 1]
        if kind.skip and pred is not None:
            latents = latents + (t_prev - t_curr) * pred
            if callback:
                callback(i, skipped=True)
            continue
        t_vec = jnp.full((B,), t_curr, jnp.float32)
        step = FluxStep.of(kind, i)
        k_i = jax.random.fold_in(key, i)
        fn = _jit_step(model, step, 'wan-step')
        p_c, st_c = fn(params, latents, ctx_cond, t_vec, st_c, k_i, pe)
        p_u, st_u = fn(params, latents, ctx_uncond, t_vec, st_u, k_i, pe)
        pred = p_u + guide_scale * (p_c - p_u)
        latents = latents + (t_prev - t_curr) * pred
        if callback:
            callback(i, skipped=False)
    return latents


def _chunk_slices(n: int, chunk: Optional[int]):
    """(start, length) dispatch windows over n computed steps.  chunk=None
    (or >= n) is the single-dispatch case; otherwise equal windows of
    ``chunk`` steps plus one remainder window (at most two distinct
    lengths, so at most two compiled runners)."""
    if not chunk or chunk >= n:
        return [(0, n)]
    out = [(s, min(chunk, n - s)) for s in range(0, n, chunk)]
    return out


def _kind_pure_windows(kind_ix, chunk: int):
    """(start, length, kind) windows that never cross a step-kind
    boundary, each at most ``chunk`` steps.  Used by the chunked
    compiled loops: a window of ONE static kind compiles to a
    single-branch scan (no ``lax.switch``), which XLA carry-aliases
    cleanly — the multi-branch scan copies state components whose
    aliasing differs between branches (measured: a 2.73G out_cache
    HLO-temp copy at Hunyuan 119k, results/hy_video_sparse_chunked.log,
    and a 3.39G compile OOM at full30k) — and runs the same schedule
    math (windows partition the computed-step sequence in order)."""
    wins = []
    s = 0
    n = len(kind_ix)
    while s < n:
        e = s
        while e < n and kind_ix[e] == kind_ix[s]:
            e += 1
        for w in range(s, e, chunk):
            wins.append((w, min(chunk, e - w), kind_ix[s]))
        s = e
    return wins


def hunyuan_denoise_compiled(model, params: Dict, latents: jnp.ndarray,
                             txt: jnp.ndarray, y: jnp.ndarray,
                             timesteps: jnp.ndarray,
                             guidance: float = 6.0,
                             key: Optional[jax.Array] = None,
                             txt_mask: Optional[jnp.ndarray] = None,
                             chunk: Optional[int] = None
                             ) -> jnp.ndarray:
    """The whole video denoise loop as jitted lax.scan dispatches (same
    shape as FluxSampler.denoise_compiled).  Skipped steps are folded into
    the preceding computed step's Euler window (schedule.fold_skip_steps)
    so no pass-through branch forces XLA to copy the cache-state carry.

    chunk: max computed steps per dispatch.  None = the whole loop as
    ONE program (the production shape; step kinds are scan data through
    lax.switch).  With chunk=N the loop dispatches KIND-PURE windows
    (never crossing a step-kind boundary, _kind_pure_windows): each
    window compiles to a single-branch scan that XLA carry-aliases
    cleanly — the multi-branch scan copies state components whose
    aliasing differs between branches (a 2.73G HLO-temp at 119k) —
    and one compiled runner serves every window of the same (kind,
    length).  Chunking keeps each dispatch under environments that
    bound single-program execution time (the axon dev tunnel's TPU
    worker dies on ~minute-plus dispatches) while amortizing the
    per-step host dispatch residual ~chunk-fold; the carry (latents +
    cache states) threads between dispatches, so the math is identical
    at every chunk size."""
    key = key if key is not None else jax.random.PRNGKey(0)
    B = latents.shape[0]
    plan = step_plan(model.ck)
    state0 = model.init_state(B)
    if getattr(model, 'mesh_info', None):
        params, (latents, txt, y, txt_mask), state0 = model.place(
            params, (latents, txt, y, txt_mask), state0)
    pe = model.rope(B)
    g = (jnp.full((B,), guidance, jnp.float32)
         if model.cfg.guidance_embed else None)
    n = min(len(plan), timesteps.shape[0] - 1)
    idxs, sigs, t_c, t_e = fold_skip_steps(plan, timesteps, n)

    uniq, kind_ix = [], []
    for s in sigs:
        if s not in uniq:
            uniq.append(s)
        kind_ix.append(uniq.index(s))
    kinds = jnp.asarray(kind_ix, jnp.int32)
    xs = (jnp.asarray(idxs, jnp.int32), kinds, jnp.stack(t_c),
          jnp.stack(t_e))

    def get_runner(length: int, kinds_set):
        """kinds_set: the step-kind signatures this runner can execute.
        One sig -> single-branch scan (no lax.switch; XLA carry-aliases
        cleanly, see _kind_pure_windows); several -> lax.switch over
        them (the single-dispatch whole-loop program)."""
        cache_key = ('hunyuan', _model_token(model), length, kinds_set,
                     latents.shape, str(latents.dtype),
                     g is None, txt_mask is None)
        if cache_key not in _JIT_CACHE:
            def run(params, lat, state0, xs, txt, y, pe, g, key, txt_mask):
                def model_branch(s):
                    step = FluxStep(index=s[0], full_attn=s[1],
                                    full_mlp=s[2], colsum=s[3],
                                    recompute_mlp_mask=s[4])

                    def f(lat, t_vec, state, i):
                        return model.forward(params, lat, txt, t_vec, y,
                                             state, step, guidance=g,
                                             key=jax.random.fold_in(key, i),
                                             pe=pe, txt_mask=txt_mask)
                    return f

                branches = [model_branch(s) for s in kinds_set]

                def body(carry, x):
                    lat, state = carry
                    i, kind, t_curr, t_end = x
                    t_vec = jnp.full((B,), t_curr, jnp.float32)
                    if len(branches) == 1:
                        pred, state2 = branches[0](lat, t_vec, state, i)
                    else:
                        pred, state2 = jax.lax.switch(kind, branches, lat,
                                                      t_vec, state, i)
                    # t_end covers this step plus any folded skipped steps
                    lat2 = (lat + (t_end - t_curr) * pred).astype(lat.dtype)
                    return (lat2, state2), None

                (lat_f, state_f), _ = jax.lax.scan(body, (lat, state0), xs)
                # state returned so state0's donation has an output to
                # alias with (an unmatched donated input is unusable and
                # XLA copies the whole cache carry) AND so chunked
                # dispatches can thread it to the next window
                return lat_f, state_f

            # CPU ignores donation with a warning, so gate on backend
            don = (2,) if jax.default_backend() != 'cpu' else ()
            _JIT_CACHE[cache_key] = jax.jit(run, donate_argnums=don)
        return _JIT_CACHE[cache_key]

    n_c = len(idxs)
    if not chunk or chunk >= n_c:
        windows = [(0, n_c, None)]          # whole loop, multi-branch
    else:
        windows = _kind_pure_windows(kind_ix, chunk)
    lat, state = latents, state0
    for start, length, k in windows:
        xs_w = jax.tree_util.tree_map(lambda a: a[start:start + length], xs)
        ks = tuple(uniq) if k is None else (uniq[k],)
        lat, state = get_runner(length, ks)(params, lat, state, xs_w, txt,
                                            y, pe, g, key, txt_mask)
    del state
    return lat


def wan_denoise_compiled(model, params: Dict, latents: jnp.ndarray,
                         ctx_cond: jnp.ndarray, ctx_uncond: jnp.ndarray,
                         timesteps: jnp.ndarray, guide_scale: float = 5.0,
                         key: Optional[jax.Array] = None,
                         chunk: Optional[int] = None) -> jnp.ndarray:
    """Compiled CFG loop: both invocations (cond/uncond, each with its
    own cache state) inside one scanned step.  Skipped steps fold
    into the preceding computed step's Euler window
    (schedule.fold_skip_steps) — the pass-through skip branch previously
    made XLA copy both cache-state carries each step (2 x 2.81 GiB at the
    real 32k grid -> OOM).  chunk: computed steps per dispatch (see
    hunyuan_denoise_compiled; None = single dispatch)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    B = latents.shape[0]
    plan = step_plan(model.ck)
    st_c0, st_u0 = model.init_cfg_states(B)
    if getattr(model, 'mesh_info', None):
        params, (latents, ctx_cond, ctx_uncond), st_c0 = model.place(
            params, (latents, ctx_cond, ctx_uncond), st_c0)
        _, _, st_u0 = model.place(params, (), st_u0)
    pe = model.rope(B)
    n = min(len(plan), timesteps.shape[0] - 1)
    idxs, sigs, t_c, t_e = fold_skip_steps(plan, timesteps, n)

    uniq, kind_ix = [], []
    for s in sigs:
        if s not in uniq:
            uniq.append(s)
        kind_ix.append(uniq.index(s))
    kinds = jnp.asarray(kind_ix, jnp.int32)
    xs = (jnp.asarray(idxs, jnp.int32), kinds, jnp.stack(t_c),
          jnp.stack(t_e))

    def get_runner(length: int, kinds_set):
        """See hunyuan_denoise_compiled.get_runner: one sig -> no switch."""
        cache_key = ('wan', _model_token(model), length, kinds_set,
                     latents.shape, str(latents.dtype), float(guide_scale))
        if cache_key not in _JIT_CACHE:
            def run(params, lat, st_c, st_u, xs, ctx_c, ctx_u, key):
                def model_branch(s):
                    step = FluxStep(index=s[0], full_attn=s[1],
                                    full_mlp=s[2], colsum=s[3],
                                    recompute_mlp_mask=s[4])

                    def f(lat, t_vec, st_c, st_u, i):
                        k_i = jax.random.fold_in(key, i)
                        p_c, st_c = model.forward(params, lat, ctx_c,
                                                  t_vec, st_c, step,
                                                  key=k_i, pe=pe)
                        p_u, st_u = model.forward(params, lat, ctx_u,
                                                  t_vec, st_u, step,
                                                  key=k_i, pe=pe)
                        return (p_u + guide_scale * (p_c - p_u)), st_c, st_u
                    return f

                branches = [model_branch(s) for s in kinds_set]

                def body(carry, x):
                    lat, st_c, st_u = carry
                    i, kind, t_curr, t_end = x
                    t_vec = jnp.full((B,), t_curr, jnp.float32)
                    if len(branches) == 1:
                        pred, st_c, st_u = branches[0](lat, t_vec, st_c,
                                                       st_u, i)
                    else:
                        pred, st_c, st_u = jax.lax.switch(
                            kind, branches, lat, t_vec, st_c, st_u, i)
                    # t_end covers this step plus any folded skipped steps
                    lat2 = (lat + (t_end - t_curr) * pred).astype(lat.dtype)
                    return (lat2, st_c, st_u), None

                (lat_f, st_cf, st_uf), _ = jax.lax.scan(
                    body, (lat, st_c, st_u), xs)
                # final states returned so the donated st_c/st_u have
                # outputs to alias with (an unmatched donated input is
                # unusable and XLA copies both cache carries — 2 x
                # 2.81 GiB at the 32k grid -> OOM) AND so chunked
                # dispatches can thread them to the next window
                return lat_f, st_cf, st_uf

            # CPU ignores donation with a warning, so gate on backend
            don = (2, 3) if jax.default_backend() != 'cpu' else ()
            _JIT_CACHE[cache_key] = jax.jit(run, donate_argnums=don)
        return _JIT_CACHE[cache_key]

    n_c = len(idxs)
    if not chunk or chunk >= n_c:
        windows = [(0, n_c, None)]          # whole loop, multi-branch
    else:
        windows = _kind_pure_windows(kind_ix, chunk)
    lat, st_c, st_u = latents, st_c0, st_u0
    for start, length, k in windows:
        xs_w = jax.tree_util.tree_map(lambda a: a[start:start + length], xs)
        ks = tuple(uniq) if k is None else (uniq[k],)
        lat, st_c, st_u = get_runner(length, ks)(params, lat, st_c, st_u,
                                                 xs_w, ctx_cond, ctx_uncond,
                                                 key)
    del st_c, st_u
    return lat
