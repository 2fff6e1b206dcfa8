#!/usr/bin/env python
"""Streaming-path micro-bench (r16, VERDICT r15 #7: the streaming operators
had never been measured).

Prepares a canonical-record parquet directory from $SPARK_GRAFT_SF_DIR's
events table, then drains it through each streaming operator with
``trigger(availableNow=True)`` and reports wall seconds + rows/s:

  S1_backup      stream_backup → real parquet segment store (the T1/T3
                 ingest path, includes the actual write)
  S2_passthrough raw stream → noop sink (source + micro-batch framework
                 floor: what the file source and engine cost with zero
                 operator work)
  S3_dedup       dropDuplicatesWithinWatermark (T8) → noop
  S4_throughput  windowed_throughput (A9/T5) → noop
  S5_gap_monitor offset_gap_monitor (applyInPandasWithState) → noop

Each query drains the SAME input once from a fresh checkpoint (availableNow
= one-shot; repeats re-drain from scratch, min-of-N).  rows/s is computed
from the input row count, so S1..S5 are directly comparable; the
S_k − S2 increment is each operator's own cost.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_backup_spark.schema import events_as_records, load_table
from kafka_backup_spark.session import autosize_shuffle_partitions, get_spark
from kafka_backup_spark.sources.segments import SegmentStore
from kafka_backup_spark.streaming.backup_stream import (
    dedup_stream,
    offset_gap_monitor,
    read_record_stream,
    stream_backup,
    windowed_throughput,
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "3"))
    spark = get_spark("stream_bench")
    sc = spark.sparkContext
    autosize_shuffle_partitions(spark, sf_dir)

    work = tempfile.mkdtemp(prefix="kbs_stream_bench_")
    src = os.path.join(work, "records")
    recs = events_as_records(load_table(spark, sf_dir, "events"))
    recs.write.mode("overwrite").parquet(src)
    n_rows = spark.read.parquet(src).count()
    print(json.dumps({"source_rows": n_rows, "sf_dir": sf_dir}))

    def drain(name, build):
        """One availableNow drain from a fresh checkpoint; returns seconds."""
        ckpt = os.path.join(work, f"ckpt_{name}_{time.monotonic_ns()}")
        sc.setJobDescription(f"stream_bench:{name}")
        t0 = time.monotonic()
        q = build(ckpt)
        q.awaitTermination(600)
        if q.isActive:  # pragma: no cover - defensive
            q.stop()
            raise RuntimeError(f"{name} did not drain in 600 s")
        dt = time.monotonic() - t0
        sc.setJobDescription(None)
        return dt

    def noop_sink(df, ckpt):
        return (
            df.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def s1(ckpt):
        seg_root = os.path.join(work, f"store_{time.monotonic_ns()}")
        return stream_backup(
            read_record_stream(spark, src), SegmentStore(seg_root), ckpt
        )

    def s2(ckpt):
        return noop_sink(read_record_stream(spark, src), ckpt)

    def s3(ckpt):
        return noop_sink(dedup_stream(read_record_stream(spark, src)), ckpt)

    def s4(ckpt):
        return noop_sink(windowed_throughput(read_record_stream(spark, src)), ckpt)

    def s5(ckpt):
        return noop_sink(offset_gap_monitor(read_record_stream(spark, src)), ckpt)

    builders = {
        "S1_backup": s1,
        "S2_passthrough": s2,
        "S3_dedup": s3,
        "S4_throughput": s4,
        "S5_gap_monitor": s5,
    }
    times = {k: [] for k in builders}
    for rep in range(reps):
        for name, build in builders.items():
            times[name].append(drain(name, build))
    out = {
        name: {
            "min_s": round(min(ts), 3),
            "rows_per_s": int(n_rows / min(ts)),
            "all": [round(x, 3) for x in ts],
        }
        for name, ts in times.items()
    }
    print(json.dumps(out, indent=2))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
