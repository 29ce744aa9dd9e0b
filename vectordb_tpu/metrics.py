"""Engine metrics: counters and timers.

The reference has only vestigial tracing (commented-out TimeRecorder and
distance counters, SURVEY §5); here metrics are first-class: every search /
insert / build updates a process-global registry, surfaced via
`GET /api/metrics` and `vectordb_tpu.metrics_snapshot()`.
"""
from __future__ import annotations

import threading
import time
from contextlib import contextmanager
from typing import Any, Dict


class Metrics:
    def __init__(self):
        self._lock = threading.Lock()
        self._counters: Dict[str, float] = {}
        self._timers: Dict[str, Dict[str, float]] = {}

    def inc(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] = self._counters.get(name, 0.0) + value

    def observe(self, name: str, seconds: float) -> None:
        with self._lock:
            t = self._timers.setdefault(
                name, {"count": 0.0, "total_s": 0.0, "max_s": 0.0})
            t["count"] += 1
            t["total_s"] += seconds
            t["max_s"] = max(t["max_s"], seconds)

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.observe(name, time.perf_counter() - t0)

    def snapshot(self) -> Dict[str, Any]:
        with self._lock:
            out: Dict[str, Any] = {"counters": dict(self._counters),
                                   "timers": {}}
            for name, t in self._timers.items():
                mean = t["total_s"] / t["count"] if t["count"] else 0.0
                out["timers"][name] = {
                    "count": int(t["count"]),
                    "total_s": round(t["total_s"], 6),
                    "mean_s": round(mean, 6),
                    "max_s": round(t["max_s"], 6),
                }
            return out

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()
            self._timers.clear()


metrics = Metrics()
