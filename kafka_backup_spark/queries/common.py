"""Shared fixtures for the oracle-paired query catalog.

Every query exists twice: a Spark plan (built from the operator modules) and
an ANSI-SQL oracle DuckDB runs on the same parquet tables. The record stream
is derived from `events` (FIXTURES.md §2): event_type ↔ topic, user_id % 4 ↔
partition, event_id ↔ offset, ts ↔ timestamp. Timestamps surface as epoch-ms
longs on both sides so hashing is timezone-proof; money-like aggregates go
through DECIMAL so sums are exact, then cast to DOUBLE identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_backup_spark import manifest as mani
from kafka_backup_spark.schema import events_as_records, load_table

SEGMENT_SPAN = 1000


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition a narrow input up to the session's default
    parallelism. Small-SF testdata arrives as one parquet file → one task;
    at 100 TB the scan itself yields thousands of splits and AQE coalesces
    the extra shuffle away. (No ``df.rdd`` probe here: materializing the RDD
    lineage per query just to read a partition count costs more than the
    unconditional narrow repartition it tried to avoid.)"""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)

# ── Spark side ────────────────────────────────────────────────────────────


def records_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = events_as_records(load_table(spark, sf_dir, "events"))
    return r.withColumn("ts_ms", F.unix_millis("timestamp"))


def manifest_df(spark: SparkSession, sf_dir: str, span: int = SEGMENT_SPAN) -> DataFrame:
    return mani.build_manifest(records_df(spark, sf_dir), span)


def detailed_mapping_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detailed offset-mapping fixture: every 10th record, target = offset + 100000."""
    r = records_df(spark, sf_dir)
    return r.filter(F.col("offset") % 10 == 0).select(
        "topic",
        "partition",
        F.col("offset").alias("source_offset"),
        (F.col("offset") + 100000).alias("target_offset"),
        F.col("ts_ms").alias("timestamp"),
    )


# ── DuckDB side (kept textually in sync with the Spark builders above) ────

RECORDS_CTE = """
records AS (
    SELECT
        CAST(CAST(user_id AS VARCHAR) AS BLOB) AS key,
        CAST(props AS BLOB) AS value,
        event_type AS topic,
        CAST(user_id % 4 AS INTEGER) AS "partition",
        event_id AS "offset",
        epoch_ms(ts) AS ts_ms
    FROM events
)
"""


def manifest_cte(name: str = "manifest", source: str = "records", where: str = "TRUE") -> str:
    return f"""
{name} AS (
    SELECT
        r.topic,
        r."partition",
        'topics/' || r.topic || '/partition=' || CAST(r."partition" AS VARCHAR)
            || '/segment-' || lpad(CAST(min(r."offset") AS VARCHAR), 20, '0')
            || '.parquet' AS key,
        min(r."offset") AS start_offset,
        max(r."offset") AS end_offset,
        min(r.ts_ms) AS start_ts,
        max(r.ts_ms) AS end_ts,
        count(*) AS record_count,
        CAST(sum(octet_length(r.key) + octet_length(r.value)) AS BIGINT) AS uncompressed_size,
        CAST(sum(octet_length(r.key) + octet_length(r.value)) AS BIGINT) // 3 AS compressed_size
    FROM {source} r
    WHERE {where}
    GROUP BY r.topic, r."partition", r."offset" // {SEGMENT_SPAN}
)
"""


MAPPING_CTE = """
mapping AS (
    SELECT topic, "partition", "offset" AS source_offset,
           "offset" + 100000 AS target_offset, ts_ms AS "timestamp"
    FROM records WHERE "offset" % 10 = 0
)
"""
