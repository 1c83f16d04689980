"""Lightweight tracing/profiling subsystem.

The reference has no built-in tracing (SURVEY.md §5); this framework exposes
stage timers plus JAX profiler capture for the device stages.

Usage:
    with trace("encode/dense"):
        ...
    report()                    # -> {stage: {calls, total_s}}
    with device_trace("/tmp/tb"):   # XLA trace viewable in TensorBoard/Perfetto
        ...
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict

_lock = threading.Lock()
_stats: Dict[str, list] = defaultdict(lambda: [0, 0.0])
enabled = False


def enable(on: bool = True) -> None:
    global enabled
    enabled = on


@contextlib.contextmanager
def trace(stage: str):
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            s = _stats[stage]
            s[0] += 1
            s[1] += dt


def report() -> Dict[str, Dict[str, float]]:
    with _lock:
        return {k: {"calls": v[0], "total_s": round(v[1], 6)} for k, v in _stats.items()}


def reset() -> None:
    with _lock:
        _stats.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an XLA device trace (jax.profiler) around a code region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
