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
