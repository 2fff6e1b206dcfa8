"""Three-phase restore: header-reconciliation mapping capture, range
collapse, and the end-to-end phase-3 reset plan over a captured mapping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_backup_spark import three_phase
from kafka_backup_spark.operators.projections import inject_restore_headers
from kafka_backup_spark.schema import events_as_records, load_table


@pytest.fixture(scope="module")
def records(spark, sf_dir):
    return events_as_records(load_table(spark, sf_dir, "events")).cache()


def test_build_offset_mapping_recovers_source_offsets(records):
    on_target = inject_restore_headers(records).withColumn(
        "offset", F.col("offset") * 2 + 17
    )
    m = three_phase.build_offset_mapping(on_target)
    bad = m.filter(F.col("target_offset") != F.col("source_offset") * 2 + 17)
    assert bad.count() == 0
    assert m.count() == records.count()


def test_build_offset_mapping_falls_back_without_headers(records):
    m = three_phase.build_offset_mapping(records)
    assert m.filter(F.col("source_offset") != F.col("target_offset")).count() == 0


def test_mapping_ranges(records):
    on_target = inject_restore_headers(records).withColumn("offset", F.col("offset") + 5)
    detailed = three_phase.build_offset_mapping(on_target)
    ranges = three_phase.mapping_ranges(detailed)
    row = ranges.filter((F.col("topic") == "click") & (F.col("partition") == 0)).collect()[0]
    src = (
        records.filter((F.col("topic") == "click") & (F.col("partition") == 0))
        .agg(F.min("offset"), F.max("offset"))
        .collect()[0]
    )
    assert row["source_first_offset"] == src[0]
    assert row["source_last_offset"] == src[1]
    assert row["target_first_offset"] == src[0] + 5
    assert row["target_last_offset"] == src[1] + 5


def test_phase3_plan_complete_over_captured_mapping(spark, records):
    on_target = inject_restore_headers(records).withColumn("offset", F.col("offset") + 100)
    detailed = three_phase.build_offset_mapping(on_target)
    groups = (
        records.groupBy("topic", "partition")
        .agg(F.max("offset").alias("offset"))
        .withColumn("group_id", F.lit("g0"))
    )
    plan, summary = three_phase.run_phase3(groups, detailed)
    srow = summary.collect()[0]
    assert srow["complete"] is True
    assert srow["mapped"] == srow["offsets"]
    bad = plan.filter(F.col("target_offset") != F.col("source_offset") + 100)
    assert bad.count() == 0


def test_mapping_excludes_foreign_records(spark):
    """A live/shared target topic holds records the restore never wrote (no
    x-original-offset header); they must NOT become identity pairs in the
    mapping, or group resets land on foreign records."""
    from kafka_backup_spark.operators.projections import inject_restore_headers
    from kafka_backup_spark.three_phase import build_offset_mapping

    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [("t", 0, i, None, None, []) for i in range(5)],
        "topic string, partition int, offset long, key binary, value binary, "
        "headers array<struct<key:string,value:binary>>",
    ).withColumn("timestamp", F.timestamp_millis(F.lit(1704067200000)))

    restored = inject_restore_headers(base).withColumn("offset", F.col("offset") + 100)
    foreign = base  # pre-existing records without headers
    target = foreign.unionByName(restored)
    m = build_offset_mapping(target)
    rows = {(r["source_offset"], r["target_offset"]) for r in m.collect()}
    assert rows == {(i, i + 100) for i in range(5)}  # restored pairs only
    # auto mode on a fully header-less target: identity fallback (the whole
    # target IS the restore — written without injection)
    m2 = build_offset_mapping(foreign)
    assert {(r["source_offset"], r["target_offset"]) for r in m2.collect()} == {
        (i, i) for i in range(5)
    }
    # strict mode drops everything header-less
    assert build_offset_mapping(foreign, restored_only=True).count() == 0
