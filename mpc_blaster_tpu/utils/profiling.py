"""Tracing/profiling — structured replacement for the reference's
`print(time.time()-t0)` per tick (`simulation_blaster.py:58,107`).

`Timer` records wall-time samples with percentile summaries; `trace` wraps
`jax.profiler.trace` so a TensorBoard-compatible device trace is one context
manager away.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np

import jax


class Timer:
    """Named wall-clock timers with p50/p95/p99 summaries."""

    def __init__(self):
        self._samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples.setdefault(name, []).append(
                time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self._samples.setdefault(name, []).append(seconds)

    def summary(self, name: str) -> dict:
        s = np.asarray(self._samples.get(name, []), dtype=np.float64)
        if s.size == 0:
            return {"count": 0}
        return {
            "count": int(s.size),
            "mean_ms": float(s.mean() * 1e3),
            "p50_ms": float(np.percentile(s, 50) * 1e3),
            "p95_ms": float(np.percentile(s, 95) * 1e3),
            "p99_ms": float(np.percentile(s, 99) * 1e3),
            "max_ms": float(s.max() * 1e3),
        }

    def summaries(self) -> Dict[str, dict]:
        return {k: self.summary(k) for k in self._samples}


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Device-level profiler trace (viewable in TensorBoard/XProf)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
