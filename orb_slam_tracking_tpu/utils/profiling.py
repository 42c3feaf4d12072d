"""Tracing / profiling helpers.

Replaces the reference's ad-hoc wall-clock profiling (``DUtils::Profiler``
around ``Initialize`` only, ``demo_initialization.cpp:157-166``; g2o's
``G2OBatchStatistics``) with:

- ``Stopwatch``: accumulating named wall-clock sections with mean/total
  reporting (host-side stages);
- ``device_trace``: a context manager around ``jax.profiler`` emitting an
  XPlane trace for TensorBoard / xprof (per-kernel device timing — the
  tool for roofline checks on real hardware);
- ``MetricsLog``: append-only structured per-frame metrics with JSONL
  export — the structured replacement for the reference's cout
  diagnostics (SURVEY.md §5.5).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, List

__all__ = ["Stopwatch", "device_trace", "MetricsLog"]


class Stopwatch:
    def __init__(self):
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self._total[k],
                "count": self._count[k],
                "mean_ms": 1000.0 * self._total[k] / max(self._count[k], 1),
            }
            for k in sorted(self._total)
        }

    def __str__(self) -> str:
        return "\n".join(
            f"{k:30s} {v['mean_ms']:8.2f} ms x{v['count']:<5d} = {v['total_s']:.2f}s"
            for k, v in self.report().items()
        )


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a device profile (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLog:
    """Structured per-frame metrics accumulator with JSONL export."""

    def __init__(self):
        self.rows: List[dict] = []

    def append(self, row: dict) -> None:
        self.rows.append(row)

    def dump_jsonl(self, path: str) -> None:
        with open(path, "w") as f:
            for row in self.rows:
                f.write(json.dumps(row, default=str) + "\n")

    def summary(self) -> dict:
        if not self.rows:
            return {}
        keys = [k for k, v in self.rows[-1].items() if isinstance(v, (int, float))]
        out = {}
        for k in keys:
            vals = [r[k] for r in self.rows if isinstance(r.get(k), (int, float))]
            if vals:
                out[k] = {"mean": sum(vals) / len(vals), "min": min(vals), "max": max(vals)}
        return out
