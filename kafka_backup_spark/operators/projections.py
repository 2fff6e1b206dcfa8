"""Projections: header injection/extraction, topic & partition renames.

Reference semantics:
- backup-time header injection ``x-original-offset`` / ``x-original-timestamp``
  / ``x-source-cluster`` (backup/engine.rs:1009-1028)  [P9]
- restore-time injection + ``x-source-partition`` (restore/helpers.rs:79-108)  [P8]
- source-offset recovery: 8-byte LE i64 first, UTF-8 digit fallback, else the
  record's own offset (restore/engine.rs:1521-1542)  [P10]
- topic/partition rename maps, identity default (restore/engine.rs:920-925,
  1003-1008)  [P11]

All native expressions — header binary codecs come from functions.codecs, and
rename maps are ``create_map`` literals (broadcast-free, codegen-friendly)
since mapping tables are tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_backup_spark.functions.codecs import header_i64_or_string, le_i32_encode, le_i64_encode

H_ORIGINAL_OFFSET = "x-original-offset"
H_ORIGINAL_TIMESTAMP = "x-original-timestamp"
H_SOURCE_PARTITION = "x-source-partition"
H_SOURCE_CLUSTER = "x-source-cluster"


def _header(key: str, value: Column) -> Column:
    return F.struct(F.lit(key).alias("key"), value.alias("value"))


def inject_backup_headers(df: DataFrame, source_cluster: str | None = None) -> DataFrame:
    """P9: append provenance headers at backup time (default ON in the
    reference, config.rs:445-449)."""
    new = [
        _header(H_ORIGINAL_OFFSET, le_i64_encode(F.col("offset"))),
        _header(H_ORIGINAL_TIMESTAMP, le_i64_encode(F.unix_millis(F.col("timestamp")))),
    ]
    if source_cluster is not None:
        new.append(_header(H_SOURCE_CLUSTER, F.lit(source_cluster).cast("binary")))
    return df.withColumn(
        "headers", F.concat(F.coalesce(F.col("headers"), F.array()), F.array(*new))
    )


def inject_restore_headers(df: DataFrame) -> DataFrame:
    """P8: append offset/timestamp/source-partition headers at restore time."""
    new = [
        _header(H_ORIGINAL_OFFSET, le_i64_encode(F.col("offset"))),
        _header(H_ORIGINAL_TIMESTAMP, le_i64_encode(F.unix_millis(F.col("timestamp")))),
        _header(H_SOURCE_PARTITION, le_i32_encode(F.col("partition"))),
    ]
    return df.withColumn(
        "headers", F.concat(F.coalesce(F.col("headers"), F.array()), F.array(*new))
    )


def extract_source_offset(df: DataFrame, out_col: str = "source_offset") -> DataFrame:
    """P10: recover the original offset from headers. First matching
    ``x-original-offset`` header: LE-i64 if 8 bytes, else UTF-8 integer
    string; fall back to the record's own offset."""
    # try_element_at: records without the header (empty filter result) must
    # fall back, not raise under ANSI mode
    hv = F.try_element_at(
        F.filter(F.col("headers"), lambda h: h["key"] == F.lit(H_ORIGINAL_OFFSET)), F.lit(1)
    )["value"]
    return df.withColumn(out_col, F.coalesce(header_i64_or_string(hv), F.col("offset")))


def rename_topics(df: DataFrame, topic_mapping: dict[str, str], topic_col: str = "topic") -> DataFrame:
    """P11: topic rename with identity default."""
    if not topic_mapping:
        return df
    m = F.create_map(*[F.lit(x) for kv in topic_mapping.items() for x in kv])
    return df.withColumn(topic_col, F.coalesce(m[F.col(topic_col)], F.col(topic_col)))


def remap_partitions(
    df: DataFrame, partition_mapping: dict[int, int], partition_col: str = "partition"
) -> DataFrame:
    """P11: explicit 1:1 partition remap with identity default."""
    if not partition_mapping:
        return df
    m = F.create_map(*[F.lit(x) for kv in partition_mapping.items() for x in kv])
    return df.withColumn(
        partition_col,
        F.coalesce(m[F.col(partition_col)], F.col(partition_col)).cast("int"),
    )
