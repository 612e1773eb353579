"""Tracing / profiling subsystem (SURVEY.md §5: the reference has none —
only stdout prints).

Two layers:
* ``trace(logdir)`` — context manager around ``jax.profiler`` for
  device-level traces viewable in TensorBoard/Perfetto.
* ``NodeTimer`` — per-node wall timing registry used by the pipeline
  executor; every node execution records (node_type, wall_s) and
  summaries export as a plain dict (the framework's metrics-as-DICT
  convention, mirroring the reference's metric outputs).
"""
from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator, List


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Device-level profiler trace (TensorBoard-compatible)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class NodeTimer:
    """Thread-safe wall-clock accumulator keyed by node type."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def measure(self, key: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._times[key].append(dt)

    def summary(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            out = {}
            for k, v in self._times.items():
                out[k] = {
                    "calls": float(len(v)),
                    "total_s": float(sum(v)),
                    "mean_s": float(sum(v) / len(v)),
                    "max_s": float(max(v)),
                }
            return out

    def reset(self) -> None:
        with self._lock:
            self._times.clear()


GLOBAL_TIMER = NodeTimer()
