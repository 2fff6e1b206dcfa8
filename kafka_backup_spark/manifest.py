"""Manifest: build (A1), merge (J6/U1), describe rollups (A2/A3), dry-run
estimates (A8) — all grouped aggregations over a segments DataFrame.

The reference's manifest is a JSON document of per-partition segment lists
(manifest.rs:6-165); here it is a DataFrame with schema

    topic STRING, partition INT, key STRING,
    start_offset LONG, end_offset LONG,
    start_ts LONG, end_ts LONG,          -- epoch millis
    record_count LONG, uncompressed_size LONG, compressed_size LONG

Segments are derived from the record stream by fixed offset spans
(``floor(offset / span)``) so the derivation is deterministic and
SQL-expressible for oracle checking. At scale this is one map-side-combinable
groupBy — no windows, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MANIFEST_KEYS = ["topic", "partition"]


def segment_key() -> F.Column:
    """Object key layout mirroring backup/engine.rs:1156-1162."""
    return F.concat(
        F.lit("topics/"),
        F.col("topic"),
        F.lit("/partition="),
        F.col("partition").cast("string"),
        F.lit("/segment-"),
        F.lpad(F.col("start_offset").cast("string"), 20, "0"),
        F.lit(".parquet"),
    )


def build_manifest(records: DataFrame, segment_span: int = 1000) -> DataFrame:
    """Derive segment metadata rows from a record stream (S8 analysis side).

    ``uncompressed_size`` follows the reference's accounting: key bytes +
    value bytes per record (segment/writer.rs add_record); compressed size is
    modeled at the reference's published 3× zstd ratio for estimate queries.
    """
    seg = (F.col("offset") / F.lit(segment_span)).cast("long").alias("segment_seq")
    sizes = F.coalesce(F.length("key"), F.lit(0)) + F.coalesce(F.length("value"), F.lit(0))
    m = (
        records.groupBy("topic", "partition", seg)
        .agg(
            F.min("offset").alias("start_offset"),
            F.max("offset").alias("end_offset"),
            F.min(F.unix_millis("timestamp")).alias("start_ts"),
            F.max(F.unix_millis("timestamp")).alias("end_ts"),
            F.count(F.lit(1)).alias("record_count"),
            F.sum(sizes).alias("uncompressed_size"),
        )
        .withColumn("compressed_size", (F.col("uncompressed_size") / 3).cast("long"))
        .withColumn("key", segment_key())
        .drop("segment_seq")
    )
    return m.select(
        "topic", "partition", "key", "start_offset", "end_offset",
        "start_ts", "end_ts", "record_count", "uncompressed_size", "compressed_size",
    )


def merge_manifests(existing: DataFrame, current: DataFrame) -> DataFrame:
    """J6/U1: union-merge with existing-wins dedupe by segment ``key`` AND by
    ``start_offset`` within a partition (backup/engine.rs:1240-1301) —
    protects against restart double-writes. Two window passes on the same
    (topic, partition) partitioning → a single shuffle."""
    u = existing.withColumn("_prec", F.lit(0)).unionByName(current.withColumn("_prec", F.lit(1)))
    by_key = Window.partitionBy("topic", "partition", "key").orderBy("_prec")
    u = u.withColumn("_rn", F.row_number().over(by_key)).filter(F.col("_rn") == 1).drop("_rn")
    by_start = Window.partitionBy("topic", "partition", "start_offset").orderBy("_prec")
    u = u.withColumn("_rn", F.row_number().over(by_start)).filter(F.col("_rn") == 1)
    return u.drop("_rn", "_prec")


def manifest_totals(manifest: DataFrame) -> DataFrame:
    """A1: global totals (manifest.rs:56-72)."""
    return manifest.agg(
        F.sum("record_count").alias("total_records"),
        F.count(F.lit(1)).alias("total_segments"),
        F.sum("uncompressed_size").alias("total_uncompressed"),
        F.sum("compressed_size").alias("total_compressed"),
    )


def compaction_plan(
    manifest: DataFrame, target_bytes: int, size_col: str = "compressed_size"
) -> DataFrame:
    """Dry-run for :meth:`SegmentStore.compact`: greedy-prefix bin packing
    of each partition's offset-ordered segments into ~``target_bytes``
    output files.  Bucket = (cumulative compressed bytes BEFORE this
    segment) div target — the same deterministic two-level prefix-sum shape
    as sequence packing, so a bucket only exceeds the target by the one
    boundary-crossing segment.  Pure manifest metadata (no data read):
    at 100 TB the plan is millions of rows of rollup, never record data.

    ``size_col`` selects the packing axis: bytes for capacity planning (the
    catalog/CLI default), ``record_count`` to predict the exact file layout
    :meth:`SegmentStore.compact` produces with ``maxRecordsPerFile`` — in
    the many-tiny-segments regime compaction exists for, the plan's buckets
    and the executed layout coincide file-for-file
    (test_compact_metrics.py::test_compaction_plan_matches_executed_layout)."""
    w = (
        Window.partitionBy("topic", "partition")
        .orderBy("start_offset")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    # integer `div`, not float floor: exact on longs past 2^53 (the same
    # exactness discipline as the fixed-point money aggregates)
    return (
        manifest.withColumn("_cb", before)
        .withColumn("bucket", F.expr(f"_cb div {target_bytes}"))
        .drop("_cb")
        .groupBy("topic", "partition", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("compressed_size").alias("bucket_bytes"),
            F.sum("record_count").alias("n_records"),
            F.min("start_offset").alias("start_offset"),
            F.max("end_offset").alias("end_offset"),
        )
    )


def describe(manifest: DataFrame) -> DataFrame:
    """A2: per-(topic, partition) + per-topic + global rollup
    (commands/describe.rs:48-181). ``rollup`` emits all three levels in one
    map-side-combinable aggregation."""
    return (
        manifest.rollup("topic", "partition")
        .agg(
            F.count(F.lit(1)).alias("segments"),
            F.sum("record_count").alias("records"),
            F.sum("uncompressed_size").alias("uncompressed_size"),
            F.sum("compressed_size").alias("compressed_size"),
            F.min("start_offset").alias("min_offset"),
            F.max("end_offset").alias("max_offset"),
            F.min("start_ts").alias("min_ts"),
            F.max("end_ts").alias("max_ts"),
        )
    )


def dry_run_estimate(
    manifest: DataFrame,
    window_start_ms: int | None = None,
    window_end_ms: int | None = None,
) -> DataFrame:
    """A8: restore estimate over time-pruned segments
    (restore/engine.rs:381-566) — the engine's EXPLAIN."""
    from kafka_backup_spark.operators.filters import segment_time_prune

    pruned = segment_time_prune(
        manifest,
        F.lit(window_start_ms) if window_start_ms is not None else None,
        F.lit(window_end_ms) if window_end_ms is not None else None,
    )
    return pruned.groupBy("topic", "partition").agg(
        F.count(F.lit(1)).alias("segments"),
        F.sum("record_count").alias("records"),
        F.sum("uncompressed_size").alias("bytes"),
        F.min("start_offset").alias("min_offset"),
        F.max("end_offset").alias("max_offset"),
        F.min("start_ts").alias("min_ts"),
        F.max("end_ts").alias("max_ts"),
    )


def skip_completed(manifest: DataFrame, completed_keys: DataFrame) -> DataFrame:
    """J5/U4: resume anti-join — drop segments already restored
    (restore/engine.rs:1305-1327). ``completed_keys``: (key)."""
    return manifest.join(completed_keys.select("key"), "key", "left_anti")
