"""Step schedules.

Replaces the reference's mutable ``LayerCounter`` odometer
(reference: src/chipmunk/util/layer_counter.py:27-59) with precomputed,
trace-time-static boolean tables indexed by inference step.  In the JAX build
the (step, invocation, layer, submodule) coordinate is carried explicitly by
the step loop, so the only thing left of the counter is the schedule logic.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from .config import ChipmunkConfig


def full_attn_steps(cfg: ChipmunkConfig) -> np.ndarray:
    """bool[steps] — reference layer_counter.py:30-35: full if step < 2 or
    step % full_step_every == 0, overridable by an explicit schedule set."""
    s = np.arange(cfg.steps)
    if cfg.attn.full_step_schedule is not None:
        return np.isin(s, sorted(cfg.attn.full_step_schedule))
    return (s < 2) | (s % cfg.attn.full_step_every == 0)


def full_mlp_steps(cfg: ChipmunkConfig) -> np.ndarray:
    """bool[steps] — reference layer_counter.py:27-28."""
    s = np.arange(cfg.steps)
    return s % cfg.mlp.full_step_every == 0


def skip_steps(cfg: ChipmunkConfig) -> np.ndarray:
    """bool[steps] — step-caching skip schedule (reference config.py:71-75;
    hunyuan models.py:733-741).  Never skips a full step's work: the schedule
    is user-provided, we only gate on is_enabled."""
    s = np.arange(cfg.steps)
    if not cfg.step_caching.is_enabled:
        return np.zeros_like(s, dtype=bool)
    return np.isin(s, sorted(cfg.step_caching.skip_step_schedule))


def recompute_mlp_mask_steps(cfg: ChipmunkConfig) -> np.ndarray:
    """bool[steps] — on sparse MLP steps, recompute neuron indices when
    step % block_mask_cache == 0 or step < 10 (reference modules/mlp.py:62-67,
    inverted condition).  True also on the first sparse step after a full one
    (cached_inds is None right after reset ~= step 0 handled by full)."""
    s = np.arange(cfg.steps)
    recompute = (s % cfg.mlp.block_mask_cache == 0) | (s < 10)
    return recompute & ~full_mlp_steps(cfg)


def colsum_steps(cfg: ChipmunkConfig) -> np.ndarray:
    """bool[steps] — full attn steps that also emit column sums and refresh
    the sparsity mask: step == 1, or any full step > 1 when recompute_mask
    (reference modules/attn.py:122-127).  Step 0 is plain dense."""
    full = full_attn_steps(cfg)
    s = np.arange(cfg.steps)
    if cfg.attn.recompute_mask:
        return full & (s >= 1)
    return full & (s == 1)


@dataclass(frozen=True)
class StepKind:
    """Per-step static flags consumed by the sampler loop."""
    full_attn: bool
    full_mlp: bool
    colsum: bool
    recompute_mlp_mask: bool
    skip: bool
    is_first: bool


def step_plan(cfg: ChipmunkConfig) -> Tuple[StepKind, ...]:
    fa, fm = full_attn_steps(cfg), full_mlp_steps(cfg)
    cs, rm, sk = colsum_steps(cfg), recompute_mlp_mask_steps(cfg), skip_steps(cfg)
    return tuple(
        StepKind(full_attn=bool(fa[i]), full_mlp=bool(fm[i]), colsum=bool(cs[i]),
                 recompute_mlp_mask=bool(rm[i]), skip=bool(sk[i]), is_first=(i == 0))
        for i in range(cfg.steps)
    )


def fold_skip_steps(plan, timesteps, n):
    """Collapse step-cached (skipped) steps into the preceding computed
    step's Euler increment, for the single-dispatch compiled loops.

    A skipped step reuses the last prediction (reference hunyuan
    models.py:733-741, wan model.py:580-593), so the Euler increments
    telescope: a computed step at t_i followed by skipped steps through
    t_k integrates to ``lat += (t_{k+1} - t_i) * pred_i``.  Scanning over
    computed steps only removes the pass-through 'skip' branch from the
    compiled ``lax.switch`` — which matters for memory, not just dispatch
    count: XLA cannot alias a scan carry that one branch returns untouched
    and another rebuilds, so it copied the entire cache-state carry every
    step (measured: 2 x 2.81 GiB HLO-temp copies at Wan 32k seq -> OOM).

    Returns ``(indices, step_sigs, t_curr, t_end)`` lists over computed
    steps; ``step_sigs`` entries are ``(min(i, 2), full_attn, full_mlp,
    colsum, recompute_mlp_mask)`` — the static step-kind signature the
    compiled loops switch over.
    """
    idxs, sigs, t_curr, t_end = [], [], [], []
    for i in range(n):
        k = plan[i]
        if k.skip and i > 0:
            # extend the previous computed step's integration window
            t_end[-1] = timesteps[i + 1]
            continue
        idxs.append(i)
        sigs.append((min(i, 2), k.full_attn, k.full_mlp, k.colsum,
                     k.recompute_mlp_mask))
        t_curr.append(timesteps[i])
        t_end.append(timesteps[i + 1])
    return idxs, sigs, t_curr, t_end
