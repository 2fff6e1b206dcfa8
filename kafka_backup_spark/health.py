"""Process health surface (kafka-backup-core/src/health.rs:1-359).

The reference keeps a component registry guarded by a RwLock plus atomic
job/record counters, and serves the aggregated report on the metrics
server's ``/health`` endpoint (metrics/server.rs:74,112).  Here the state is
a plain driver-side object — Spark does the distributed work; health is a
property of the *driver process* (streams alive, stores reachable), so there
is deliberately nothing to distribute.  Streaming values flow in from the
StreamingQueryListener history (streaming/metrics.py) via
:func:`observe_stream_progress`.

Semantics pinned to health.rs:
- overall status = worst component (Unhealthy > Degraded > Healthy),
  health.rs:202-215
- ``update_component`` on an unknown name registers it, health.rs:127-140
- marking healthy refreshes ``last_success``; other states do not,
  health.rs:115-118
- throughput = records recorded in the last 10 s / 10, over a 60 s retained
  window, health.rs:163-199
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

HEALTHY = "healthy"
DEGRADED = "degraded"
UNHEALTHY = "unhealthy"

_RANK = {HEALTHY: 0, DEGRADED: 1, UNHEALTHY: 2}

_THROUGHPUT_WINDOW_S = 10.0
_RETAIN_WINDOW_S = 60.0


@dataclass
class _ComponentState:
    status: str
    message: str | None
    last_checked: float  # monotonic
    last_success: float | None


class HealthCheck:
    """Component registry + process counters (health.rs HealthCheck).

    ``clock`` is injectable (monotonic seconds) so tests exercise the
    time-window logic without sleeping.
    """

    def __init__(self, clock=time.monotonic) -> None:
        self._clock = clock
        self._start = clock()
        self._components: dict[str, _ComponentState] = {}
        self._records_processed = 0
        self._active_jobs = 0
        self._recent: list[tuple[float, int]] = []  # (monotonic, count)

    # ── component registry ────────────────────────────────────────────
    def register_component(self, name: str) -> None:
        now = self._clock()
        self._components[name] = _ComponentState(HEALTHY, None, now, now)

    def update_component(
        self, name: str, status: str, message: str | None = None
    ) -> None:
        if status not in _RANK:
            raise ValueError(f"unknown health status: {status}")
        now = self._clock()
        state = self._components.get(name)
        if state is None:
            self._components[name] = _ComponentState(
                status, message, now, now if status == HEALTHY else None
            )
            return
        state.status = status
        state.message = message
        state.last_checked = now
        if status == HEALTHY:
            state.last_success = now

    def mark_healthy(self, name: str) -> None:
        self.update_component(name, HEALTHY, None)

    def mark_degraded(self, name: str, message: str) -> None:
        self.update_component(name, DEGRADED, message)

    def mark_unhealthy(self, name: str, message: str) -> None:
        self.update_component(name, UNHEALTHY, message)

    # ── counters ──────────────────────────────────────────────────────
    def record_records(self, count: int) -> None:
        self._records_processed += int(count)
        now = self._clock()
        self._recent.append((now, int(count)))
        cutoff = now - _RETAIN_WINDOW_S
        self._recent = [(t, c) for t, c in self._recent if t > cutoff]

    def job_started(self) -> None:
        self._active_jobs += 1

    def job_completed(self) -> None:
        self._active_jobs -= 1

    def current_throughput(self) -> float:
        if not self._recent:
            return 0.0
        cutoff = self._clock() - _THROUGHPUT_WINDOW_S
        return sum(c for t, c in self._recent if t > cutoff) / _THROUGHPUT_WINDOW_S

    # ── aggregation ───────────────────────────────────────────────────
    def status(self) -> str:
        worst = HEALTHY
        for state in self._components.values():
            if _RANK[state.status] > _RANK[worst]:
                worst = state.status
        return worst

    def is_healthy(self) -> bool:
        return self.status() == HEALTHY

    def is_operational(self) -> bool:
        return self.status() != UNHEALTHY

    def report(self) -> dict:
        """HealthReport JSON shape (health.rs:41-56): wall-clock
        ``last_checked`` epoch-ms, monotonic-derived ages."""
        now = self._clock()
        wall_now_ms = int(time.time() * 1000)
        components = [
            {
                "name": name,
                "status": s.status,
                "message": s.message,
                "last_checked": wall_now_ms - int((now - s.last_checked) * 1000),
                "last_success_ms": (
                    int((now - s.last_success) * 1000)
                    if s.last_success is not None
                    else None
                ),
            }
            for name, s in sorted(self._components.items())
        ]
        return {
            "status": self.status(),
            "uptime_secs": now - self._start,
            "components": components,
            "active_jobs": self._active_jobs,
            "records_processed": self._records_processed,
            "current_throughput": self.current_throughput(),
        }

    def render_text(self) -> str:
        """`Display for HealthReport` parity (health.rs:253-283)."""
        rep = self.report()
        lines = [
            "=== Health Report ===",
            f"Status: {rep['status']}",
            f"Uptime: {rep['uptime_secs']:.0f}s",
            f"Active Jobs: {rep['active_jobs']}",
            f"Records Processed: {rep['records_processed']}",
            f"Current Throughput: {rep['current_throughput']:.0f} rec/s",
            "",
            "Components:",
        ]
        for comp in rep["components"]:
            line = f"  {comp['name']}: {comp['status']}"
            if comp["message"]:
                line += f" - {comp['message']}"
            lines.append(line)
        return "\n".join(lines) + "\n"

    def to_json(self) -> str:
        return json.dumps(self.report(), sort_keys=True)


def observe_stream_progress(health: HealthCheck, progress_df, component="backup_stream"):
    """Fold a stream's progress history (streaming/metrics.py
    PROGRESS_SCHEMA) into component health: no batches → degraded
    (never-ran), recent batches → healthy + record counters.  Aggregation
    runs in Spark; one scalar row reaches the driver."""
    from pyspark.sql import functions as F

    row = progress_df.agg(
        F.sum("num_input_rows").alias("records"),
        F.count(F.lit(1)).alias("batches"),
    ).collect()[0]
    if not row["batches"]:
        health.mark_degraded(component, "no completed micro-batches")
        return health
    health.mark_healthy(component)
    health.record_records(row["records"] or 0)
    return health
