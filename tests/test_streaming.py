"""Streaming backup (T1/T3/T4/T8): incremental resume via checkpoint,
availableNow draining, stateful dedup, windowed throughput."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_backup_spark.schema import events_as_records, load_table
from kafka_backup_spark.sources.segments import SegmentStore
from kafka_backup_spark.streaming.backup_stream import (
    dedup_stream,
    read_record_stream,
    run_incremental_backup,
    windowed_throughput,
)


@pytest.fixture(scope="module")
def records(spark, sf_dir):
    return events_as_records(load_table(spark, sf_dir, "events"))


def test_incremental_backup_resumes_from_checkpoint(spark, records, tmp_path):
    source = str(tmp_path / "source")
    store = SegmentStore(str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")

    first = records.filter(F.col("offset") % 2 == 0)
    second = records.filter(F.col("offset") % 2 == 1)
    first.write.mode("append").parquet(source)

    run_incremental_backup(spark, source, store, ckpt)
    n1 = store.read(spark).count()
    assert n1 == first.count()

    # new files arrive; a second availableNow run drains ONLY the delta (T1)
    second.write.mode("append").parquet(source)
    run_incremental_backup(spark, source, store, ckpt)
    out = store.read(spark)
    assert out.count() == records.count()
    # no re-processing of the first batch: offsets are unique in the store
    assert (
        out.groupBy("topic", "partition", "offset").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_dedup_stream_drops_refetched_records(spark, records, tmp_path):
    source = str(tmp_path / "dsource")
    out_dir = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")
    sample = records.filter(F.col("offset") < 500)
    # simulate at-least-once overlap: the same batch lands twice
    sample.write.mode("append").parquet(source)
    sample.write.mode("append").parquet(source)

    stream = dedup_stream(read_record_stream(spark, source))
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out_dir)
    assert got.count() == sample.count()


def test_windowed_throughput_matches_batch_rollup(spark, records, tmp_path):
    source = str(tmp_path / "wsource")
    ckpt = str(tmp_path / "wckpt")
    records.write.mode("append").parquet(source)

    agg = windowed_throughput(read_record_stream(spark, source), "1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("wtp")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT sum(n_records) AS n FROM wtp").collect()[0]["n"]
    # append mode emits only windows closed by the watermark; the final
    # (still-open) window is withheld, so emitted ≤ total
    assert got is None or got <= records.count()
    assert spark.table("wtp").columns == [
        "window_start",
        "window_end",
        "topic",
        "n_records",
        "n_bytes",
    ]


def test_offset_gap_monitor_across_microbatches(spark, tmp_path):
    """Custom stateful op (applyInPandasWithState): expected-next-offset state
    survives between availableNow runs via the checkpoint, so a gap that
    spans micro-batches is still detected."""
    import datetime

    from kafka_backup_spark.schema import RECORD_SCHEMA
    from kafka_backup_spark.streaming.backup_stream import (
        offset_gap_monitor,
        read_record_stream,
    )

    ts = datetime.datetime(2024, 1, 1)

    def rows(offsets, part=0):
        return [(b"k", b"v", "click", part, o, ts, 0, []) for o in offsets]

    source = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            offset_gap_monitor(read_record_stream(spark, source))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        try:
            return spark.read.parquet(sink).collect()
        except Exception:
            return []  # sink dir not created yet (no events emitted)

    # batch 1: contiguous 0..4 on p0, 10..11 on p1 -> no events
    spark.createDataFrame(rows([0, 1, 2, 3, 4]) + rows([10, 11], part=1), RECORD_SCHEMA)\
        .write.mode("append").parquet(source)
    assert drain() == []

    # batch 2: p0 jumps to 7 (gap 5-6) and re-delivers 2 (overlap);
    # p1 continues contiguously -> exactly two events, state carried over
    spark.createDataFrame(rows([7, 8, 2]) + rows([12], part=1), RECORD_SCHEMA)\
        .write.mode("append").parquet(source)
    events = {(r["kind"], r["partition"]): r for r in drain()}
    assert len(events) == 2
    gap = events[("gap", 0)]
    assert (gap["from_offset"], gap["to_offset"], gap["n"]) == (5, 6, 2)
    ov = events[("overlap", 0)]
    assert (ov["from_offset"], ov["to_offset"], ov["n"]) == (2, 2, 1)


def test_rate_limited_stream_bounds_batch_size(spark, records, tmp_path):
    """T6: maxFilesPerTrigger caps per-micro-batch work; all data still
    drains under availableNow, just across more batches."""
    from kafka_backup_spark.streaming.backup_stream import read_record_stream, stream_backup

    source = str(tmp_path / "src")
    for i in range(4):  # four separate files
        records.filter(F.col("offset") % 4 == i).coalesce(1).write.mode("append").parquet(source)
    store = SegmentStore(str(tmp_path / "store"))
    q = stream_backup(
        read_record_stream(spark, source, max_files_per_trigger=1),
        store,
        str(tmp_path / "ckpt"),
        {"availableNow": True},
    )
    q.awaitTermination(120)
    assert store.read(spark).count() == records.count()
    batches = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 4  # one file per micro-batch, not one big gulp


def test_stream_backup_honors_store_codec_and_projection(spark, tmp_path):
    """The streaming sink must follow the same store discipline as
    SegmentStore.write: zstd-compressed files (not silent snappy) and the
    canonical column projection."""
    import glob as globmod

    from kafka_backup_spark.schema import events_as_records, load_table
    from kafka_backup_spark.sources.segments import SegmentStore
    from kafka_backup_spark.streaming.backup_stream import run_incremental_backup

    src = str(tmp_path / "src")
    events_as_records(load_table(spark, "/root/testdata/sf0.001", "events")).limit(
        200
    ).write.parquet(src)
    store = SegmentStore(str(tmp_path / "store"))
    run_incremental_backup(spark, src, store, str(tmp_path / "ckpt"), timeout_sec=120)
    files = globmod.glob(f"{store.topics_path()}/**/*.parquet", recursive=True)
    assert files
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(files[0]).metadata
    codecs = {meta.row_group(i).column(0).compression for i in range(meta.num_row_groups)}
    assert codecs == {"ZSTD"}
    assert store.read(spark).count() == 200


def test_offset_gap_monitor_classifies_expected_noncontiguity(spark, tmp_path):
    """Compacted/transactional topics are legitimately non-contiguous: their
    skips emit kind='skip', not the data-loss 'gap' alarm."""
    from kafka_backup_spark.schema import RECORD_SCHEMA
    from kafka_backup_spark.streaming.backup_stream import offset_gap_monitor

    import datetime

    ts = datetime.datetime(2024, 1, 1)
    # RECORD_SCHEMA order: key, value, topic, partition, offset, timestamp,
    # timestampType, headers
    rows = [
        (None, None, "compacted", 0, o, ts, 0, [])
        for o in (0, 1, 5, 9)  # compaction removed 2-4 and 6-8
    ] + [
        (None, None, "plain", 0, o, ts, 0, [])
        for o in (0, 1, 7)  # genuine loss
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, RECORD_SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(RECORD_SCHEMA).parquet(src)
    out = offset_gap_monitor(stream, noncontiguous_topics={"compacted"})
    q = (
        out.writeStream.format("memory")
        .queryName("gapmon")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    events = {(r["topic"], r["kind"]) for r in spark.sql("select * from gapmon").collect()}
    assert ("compacted", "skip") in events
    assert ("compacted", "gap") not in events
    assert ("plain", "gap") in events
