"""Timing + optional device profiling (SURVEY.md §5 tracing subsystem).

The reference's observability is per-call timing dicts + explicit
synchronize bracketing (generate.py:205-211, model.py:658-666); the loops
here keep that contract.  This module adds the optional deeper layer:
``jax.profiler`` traces around a generation, and a tiny stopwatch helper.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax

logger = logging.getLogger(__name__)


class Stopwatch:
    """Accumulating stopwatch with named laps."""

    def __init__(self):
        self.laps = {}
        self._t0 = time.time()

    def lap(self, name: str) -> float:
        now = time.time()
        dt = now - self._t0
        self.laps[name] = self.laps.get(name, 0.0) + dt
        self._t0 = now
        return dt

    def summary(self) -> str:
        total = sum(self.laps.values())
        parts = [f"{k}={v*1000:.1f}ms" for k, v in self.laps.items()]
        return f"{' '.join(parts)} total={total*1000:.1f}ms"


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Wrap a generation in a jax.profiler trace when ``log_dir`` is given;
    no-op otherwise.  View with TensorBoard or xprof."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", log_dir)


def device_memory_stats() -> dict:
    """Per-device memory stats for /status endpoints (SURVEY.md §5)."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = {}
    return out
