"""Profiling helpers.

The reference has no profiler integration — only manual AverageMeter batch
timing and a throughput mode (SURVEY.md §5). Here we expose the jax
profiler (TensorBoard-viewable traces) behind the same lightweight
interface, gated by ``TPU.PROFILE_DIR``.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def maybe_trace(profile_dir: str, name: str = "trace"):
    """Context manager: jax.profiler.trace when profile_dir is set,
    no-op otherwise."""
    if not profile_dir:
        yield
        return
    import jax

    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir):
        yield


class StepTimer:
    """Wall-clock section timing with EMA, for hot-loop instrumentation."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = {}
        self._start = {}

    def start(self, name: str):
        self._start[name] = time.time()

    def stop(self, name: str) -> float:
        dt = time.time() - self._start[name]
        prev = self.ema.get(name)
        self.ema[name] = dt if prev is None else (1 - self.alpha) * prev + self.alpha * dt
        return dt

    def summary(self) -> str:
        return "\t".join(f"{k}: {v * 1e3:.2f}ms" for k, v in self.ema.items())
