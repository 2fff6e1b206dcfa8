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
