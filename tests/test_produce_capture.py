"""Plan-A produce-offset capture against a mock producer (no cluster).

Proves the reference's base_offset reconstruction semantics
(kafka/produce.rs:22-32): broker assigns contiguous offsets per partition
from its log-end; the captured mapping pairs every source offset with its
assigned offset — no provenance headers involved.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from kafka_backup_spark.produce_capture import produce_with_offset_capture
from kafka_backup_spark.schema import RECORD_SCHEMA
from kafka_backup_spark.sources.mock_kafka import mock_producer_factory

# target partitions already hold some records: non-zero base offsets
_factory = mock_producer_factory({("click", 0): 1000, ("click", 1): 50})


@pytest.fixture()
def records(spark):
    ts = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    # the 3-header record matters: Arrow hands headers to the UDF as a numpy
    # array, and `arr or []` raises "truth value ambiguous" for len >= 2 —
    # exactly what inject_backup_headers (3 provenance headers) produces
    rows = [
        (b"k1", b"v1", "click", 0, 7, ts, 0, [{"key": "h", "value": b"x"}]),
        (b"k2", b"v2", "click", 0, 9, ts, 0, []),
        (None, b"v3", "click", 0, 12, ts, 0, None),
        (b"k4", b"v4", "click", 1, 3, ts, 0, []),
        (b"k5", None, "view", 2, 1, ts, 0, []),
        (b"k6", b"v6", "click", 0, 14, ts, 0,
         [{"key": "kb-topic", "value": b"click"},
          {"key": "kb-partition", "value": b"0"},
          {"key": "kb-offset", "value": b"14"}]),
    ]
    return spark.createDataFrame(rows, RECORD_SCHEMA)


def test_capture_reconstructs_broker_offsets(spark, records):
    mapping = produce_with_offset_capture(records, _factory)
    got = {
        (r["topic"], r["partition"], r["source_offset"]): r["target_offset"]
        for r in mapping.collect()
    }
    # per-partition contiguous from the partition's log-end, in source order
    assert got[("click", 0, 7)] == 1000
    assert got[("click", 0, 9)] == 1001
    assert got[("click", 0, 12)] == 1002
    assert got[("click", 1, 3)] == 50
    assert got[("view", 2, 1)] == 0  # empty partition starts at 0
    assert got[("click", 0, 14)] == 1003  # multi-header record produces too
    assert len(got) == 6


def test_capture_without_headers_feeds_phase3(spark, records):
    """The captured mapping slots straight into the J1/J3 reset-plan path —
    plan A's whole point: no header injection required."""
    from kafka_backup_spark.three_phase import mapping_ranges, run_phase3

    mapping = produce_with_offset_capture(records, _factory)
    detailed = mapping.select(
        "topic", "partition", "source_offset", "target_offset", "timestamp"
    )
    groups = spark.createDataFrame(
        [("g1", "click", 0, 9)],
        "group_id string, topic string, partition int, offset long",
    )
    plan, summary = run_phase3(groups, detailed, mapping_ranges(detailed))
    row = plan.collect()[0]
    assert row["target_offset"] == 1001 and row["complete"]


def test_mapping_timestamps_are_epoch_ms(spark, records):
    mapping = produce_with_offset_capture(records, _factory)
    assert all(r["timestamp"] == 1704067200000 for r in mapping.collect())


def test_null_key_value_and_headers_pass_through(spark, records):
    """Null keys/values/headers must not break the produce path (empty key is
    a real Kafka case; plan A must not require any field)."""
    mapping = produce_with_offset_capture(records, _factory)
    assert mapping.filter(F.col("source_offset") == 12).count() == 1
