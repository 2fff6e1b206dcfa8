"""Bulk parallel offset reset against fake admin clients (no cluster):
N-way batching, per-partition retry with backoff, partial-failure status,
A10 percentile report (offset_automation.rs:320-620)."""

from __future__ import annotations

import threading
from types import SimpleNamespace

from kafka_backup_spark.offset_reset_bulk import (
    BulkResetConfig,
    bulk_reset_offsets,
    performance_stats,
)


class _Done:
    def __init__(self, value):
        self._value = value

    def result(self):
        return self._value


class FlakyAdmin:
    """Commits succeed except for partitions listed in fail_plan, which
    return a non-zero error code for their first N attempts."""

    def __init__(self, fail_plan=None):
        self.fail_plan = dict(fail_plan or {})  # (group,topic,part) -> fail N times
        self.attempts: list[tuple] = []
        self.concurrent = 0
        self.max_concurrent = 0
        self._lock = threading.Lock()

    def alter_consumer_group_offsets(self, reqs):
        with self._lock:
            self.concurrent += 1
            self.max_concurrent = max(self.max_concurrent, self.concurrent)
        futures = {}
        for r in reqs:
            tps_out = []
            for tp in r.topic_partitions:
                key = (r.group_id, tp.topic, tp.partition)
                with self._lock:
                    self.attempts.append(key)
                    remaining = self.fail_plan.get(key, 0)
                    if remaining > 0:
                        self.fail_plan[key] = remaining - 1
                err = SimpleNamespace(code=lambda: 7) if remaining > 0 else None
                tps_out.append(SimpleNamespace(
                    topic=tp.topic, partition=tp.partition, offset=tp.offset, error=err,
                ))
            futures[r.group_id] = _Done(SimpleNamespace(topic_partitions=tps_out))
        with self._lock:
            self.concurrent -= 1
        return futures


def _mappings(n_groups=4, parts=3):
    return [
        (f"g{g}", "click", p, 100 + p)
        for g in range(n_groups)
        for p in range(parts)
    ]


def test_bulk_reset_all_success_batches_by_group():
    admin = FlakyAdmin()
    report = bulk_reset_offsets(
        "b:9092", _mappings(), admin_factory=lambda s: admin, sleep=lambda s: None
    )
    assert report["status"] == "success"
    assert report["total_groups"] == 4
    assert report["total_offsets_reset"] == 12
    assert report["total_retries"] == 0
    # one commit RPC per group (batched), not one per partition
    assert len(admin.attempts) == 12 and len(report["latencies_ms"]) == 4


def test_bulk_reset_retries_only_failed_partitions_with_backoff():
    admin = FlakyAdmin(fail_plan={("g0", "click", 1): 2})
    sleeps = []
    report = bulk_reset_offsets(
        "b:9092",
        _mappings(n_groups=1),
        BulkResetConfig(retry_base_delay_ms=100),
        admin_factory=lambda s: admin,
        sleep=sleeps.append,
    )
    assert report["status"] == "success"
    assert report["total_offsets_reset"] == 3
    assert report["total_retries"] == 2
    # retry commits carry ONLY the failed partition
    assert admin.attempts.count(("g0", "click", 1)) == 3
    assert admin.attempts.count(("g0", "click", 0)) == 1
    # exponential backoff: ~0.1s then ~0.2s (+ up to 10% jitter)
    assert 0.1 <= sleeps[0] <= 0.11 and 0.2 <= sleeps[1] <= 0.22


def test_bulk_reset_partial_failure_reported():
    admin = FlakyAdmin(fail_plan={("g1", "click", 2): 99})
    report = bulk_reset_offsets(
        "b:9092",
        _mappings(n_groups=2),
        BulkResetConfig(max_retry_attempts=1),
        admin_factory=lambda s: admin,
        sleep=lambda s: None,
    )
    assert report["status"] == "partial_success"
    assert report["total_offsets_failed"] == 1
    assert report["failed_groups"] == 1 and report["successful_groups"] == 1
    bad = [o for o in report["group_outcomes"] if o["group_id"] == "g1"][0]
    assert bad["partitions_failed"] == 1
    assert any("error_code=7" in e for e in bad["errors"])


def test_bulk_reset_concurrency_cap():
    admin = FlakyAdmin()
    report = bulk_reset_offsets(
        "b:9092",
        _mappings(n_groups=8),
        BulkResetConfig(max_concurrent_requests=2),
        admin_factory=lambda s: admin,
        sleep=lambda s: None,
    )
    assert report["max_concurrency"] == 2
    assert report["status"] == "success"


def test_performance_stats_via_a10_operator(spark):
    admin = FlakyAdmin()
    report = bulk_reset_offsets(
        "b:9092", _mappings(), admin_factory=lambda s: admin, sleep=lambda s: None
    )
    perf = performance_stats(spark, report)
    assert perf["p50_latency_ms"] <= perf["p99_latency_ms"]
    assert perf["total_retries"] == 0 and perf["max_concurrency"] == 4
