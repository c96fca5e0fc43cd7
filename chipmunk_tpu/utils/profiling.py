"""Tracing / profiling utilities.

Rebuilds the reference's opt-in profiler wrapper (flux sampling.py:316-336:
torch.profiler around the denoise loop, gated on should_profile +
generation_index warmup) with jax.profiler traces, plus a lightweight
per-step timing registry (the reference uses prints + perf_counter,
SURVEY.md §5 metrics row).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


@contextlib.contextmanager
def profile_region(logdir: str = "./profiles", enabled: bool = True,
                   warmup_done: bool = True):
    """Trace a region to TensorBoard/XPlane (reference gates on
    should_profile and generation_index >= 3; callers pass warmup_done
    accordingly)."""
    if not (enabled and warmup_done):
        yield
        return
    with jax.profiler.trace(logdir):
        yield


class StepTimer:
    """Structured per-step wall-clock timing."""

    def __init__(self):
        self.records: Dict[str, List[float]] = defaultdict(list)
        self._open: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.records[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.records.items():
            out[name] = {
                'count': len(xs),
                'total_s': sum(xs),
                'mean_ms': 1e3 * sum(xs) / max(len(xs), 1),
                'min_ms': 1e3 * min(xs),
            }
        return out

    def log(self, printer=print):
        for name, s in sorted(self.summary().items()):
            printer(f"{name}: n={s['count']} mean={s['mean_ms']:.2f}ms "
                    f"min={s['min_ms']:.2f}ms total={s['total_s']:.2f}s")
