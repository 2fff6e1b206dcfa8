"""Segment-store compaction + streaming progress metrics."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from kafka_backup_spark.schema import events_as_records, load_table
from kafka_backup_spark.sources.segments import SegmentStore
from kafka_backup_spark.streaming.backup_stream import read_record_stream
from kafka_backup_spark.streaming.metrics import ProgressMetrics, throughput_summary


def test_compact_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    records = events_as_records(load_table(spark, sf_dir, "events"))
    store = SegmentStore(str(tmp_path / "store"))
    # simulate many micro-batch appends → small files
    for i in range(5):
        store.write(records.filter(F.col("offset") % 5 == i))
    before_files = len(glob.glob(f"{store.topics_path()}/**/*.parquet", recursive=True))
    before = store.read(spark)
    n, topics = before.count(), before.select("topic").distinct().count()

    store.compact(spark)

    after = store.read(spark)
    after_files = len(glob.glob(f"{store.topics_path()}/**/*.parquet", recursive=True))
    assert after.count() == n
    assert after.select("topic").distinct().count() == topics
    assert after_files < before_files
    # identical content, not just counts: per-partition checksums match
    assert (
        store.read(spark)
        .groupBy("topic", "partition")
        .agg(F.sum("offset"), F.count(F.lit(1)))
        .exceptAll(
            records.groupBy("topic", "partition").agg(F.sum("offset"), F.count(F.lit(1)))
        )
        .count()
        == 0
    )


def test_progress_metrics_listener(spark, sf_dir, tmp_path):
    records = events_as_records(load_table(spark, sf_dir, "events"))
    source = str(tmp_path / "src")
    records.write.mode("append").parquet(source)

    listener = ProgressMetrics()
    spark.streams.addListener(listener)
    try:
        q = (
            read_record_stream(spark, source)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # listener events are delivered asynchronously
        import time

        deadline = time.time() + 30
        while not listener.rows and time.time() < deadline:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    assert listener.rows, "no progress events received"
    progress = listener.to_dataframe(spark)
    row = throughput_summary(progress).collect()[0]
    assert row["records_total"] == records.count()
    assert row["batches"] >= 1


def test_compaction_plan_matches_executed_layout(spark, tmp_path):
    """VERDICT r7 #6: plan→execution parity.  Stream four incremental
    backups of tiny uniform segments, plan compaction on the physical
    per-file manifest (record_count axis, target = the compact call's
    maxRecordsPerFile), execute :meth:`SegmentStore.compact`, and assert
    the resulting file layout IS the plan's buckets — same file count,
    record counts, and offset ranges per (topic, partition) — while the
    manifest totals stay invariant."""
    import datetime

    from kafka_backup_spark.manifest import build_manifest, compaction_plan, manifest_totals

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (None, b"v%d" % o, t, p, o, t0 + datetime.timedelta(seconds=o), 0, None)
        for t in ("alpha", "beta")
        for p in (0, 1)
        for o in range(400)
    ]
    records = spark.createDataFrame(rows, schema="key binary, value binary, topic string, partition int, offset long, timestamp timestamp, timestampType int, headers array<struct<key:string,value:binary>>")
    store = SegmentStore(str(tmp_path / "store"))
    for i in range(4):  # 4 incremental micro-batch backups of 100 offsets
        store.write(
            records.filter((F.col("offset") >= i * 100) & (F.col("offset") < (i + 1) * 100)),
            max_records_per_file=100,
        )

    def phys_manifest():
        return (
            store.read(spark)
            .withColumn("f", F.input_file_name())
            .groupBy("topic", "partition", "f")
            .agg(
                F.min("offset").alias("start_offset"),
                F.max("offset").alias("end_offset"),
                F.count(F.lit(1)).alias("record_count"),
            )
            .withColumn("compressed_size", F.col("record_count"))
        )

    pre = phys_manifest()
    assert pre.count() == 16  # 2 topics × 2 partitions × 4 segments
    totals_before = manifest_totals(build_manifest(records)).collect()[0]

    plan = compaction_plan(pre, 200, size_col="record_count")
    plan_rows = {
        (r["topic"], r["partition"], r["start_offset"]): (r["n_records"], r["end_offset"], r["n_segments"])
        for r in plan.collect()
    }
    # 2 buckets per (topic, partition), each packing 2 whole segments
    assert len(plan_rows) == 8
    assert all(v == (200, s + 199, 2) for (t, p, s), v in plan_rows.items())

    store.compact(spark, max_records_per_file=200)

    post = phys_manifest()
    layout = {
        (r["topic"], r["partition"], r["start_offset"]): (r["record_count"], r["end_offset"])
        for r in post.collect()
    }
    # executed layout == plan buckets, file for file
    assert layout == {k: (n, e) for k, (n, e, _s) in plan_rows.items()}
    totals_after = manifest_totals(build_manifest(store.read(spark))).collect()[0]
    assert totals_after["total_records"] == totals_before["total_records"]
    assert totals_after["total_segments"] == totals_before["total_segments"]
