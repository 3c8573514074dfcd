"""Throughput / latency stats tracker.

≙ the simulator's ``StatsTracker`` (reference:
simulator/.../StatsTracker.java:96-251 — sliding-window ops/s + bytes/s and
weighted latency percentiles max/p99/p95/p50/min, logged every window), and
the per-stage rows/s surface used by ``bench.py`` / ``run_stream``.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field


@dataclass
class StageStats:
    name: str
    rows: int = 0
    bytes: int = 0
    wall_s: float = 0.0
    calls: int = 0
    latencies: list = field(default_factory=list)

    def record(self, rows: int, wall_s: float, nbytes: int = 0) -> None:
        self.rows += rows
        self.bytes += nbytes
        self.wall_s += wall_s
        self.calls += 1
        self.latencies.append(wall_s)

    def summary(self) -> dict:
        lat = sorted(self.latencies)

        def pct(p: float) -> float:
            if not lat:
                return 0.0
            i = min(len(lat) - 1, int(p * (len(lat) - 1)))
            return round(lat[i], 4)

        return {
            "stage": self.name,
            "rows": self.rows,
            "calls": self.calls,
            "rows_per_sec": round(self.rows / self.wall_s, 1) if self.wall_s else 0.0,
            "bytes_per_sec": round(self.bytes / self.wall_s, 1) if self.wall_s else 0.0,
            "lat_min": pct(0.0),
            "lat_p50": pct(0.5),
            "lat_p95": pct(0.95),
            "lat_p99": pct(0.99),
            "lat_max": pct(1.0),
        }


class StatsTracker:
    """Sliding-window rate tracking (ops/s, bytes/s over the last
    ``window_s`` seconds) + cumulative per-stage summaries."""

    def __init__(self, window_s: float = 5.0):
        self.window_s = window_s
        self.events: deque = deque()  # (t, rows, bytes)
        self.stages: dict[str, StageStats] = {}

    def stage(self, name: str) -> StageStats:
        return self.stages.setdefault(name, StageStats(name))

    def record(self, rows: int, nbytes: int = 0, t: float | None = None) -> None:
        t = time.monotonic() if t is None else t
        self.events.append((t, rows, nbytes))
        self._trim(t)

    def _trim(self, now: float) -> None:
        while self.events and self.events[0][0] < now - self.window_s:
            self.events.popleft()

    def rates(self, t: float | None = None) -> dict:
        t = time.monotonic() if t is None else t
        self._trim(t)
        if not self.events:
            return {"rows_per_sec": 0.0, "bytes_per_sec": 0.0}
        span = max(t - self.events[0][0], 1e-9)
        return {
            "rows_per_sec": round(sum(e[1] for e in self.events) / span, 1),
            "bytes_per_sec": round(sum(e[2] for e in self.events) / span, 1),
        }

    def summaries(self) -> list[dict]:
        return [s.summary() for s in self.stages.values()]
