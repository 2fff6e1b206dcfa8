"""R1/R2: record repartitioning — Kafka murmur2 keyed routing or round-robin.

The reference builds an N-reader/M-writer tokio channel mesh for this
(restore/repartition.rs:83-451, ~370 lines); in Spark the same dataflow is a
column assignment plus the built-in shuffle:

- murmur2 strategy: ``target_partition = (murmur2(key) & 0x7fffffff) % N``;
  empty (zero-byte) keys ARE hashed; null keys round-robin
  (repartition.rs:36-75; empty-key test repartition.rs:499-506).
- automatic strategy: round-robin everything.

Round-robin here is deterministic (ordered by source (partition, offset)
cycling through N) — a stronger guarantee than the reference's atomic
counter, and reproducible for tests. At scale the row_number window costs one
shuffle over only the null-key subset, which is typically tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_backup_spark.functions.murmur2 import kafka_partition_expr


def assign_target_partitions(
    df: DataFrame,
    num_partitions: int,
    strategy: str = "murmur2",
    key_col: str = "key",
    out_col: str = "target_partition",
) -> DataFrame:
    if strategy == "automatic":
        w = Window.orderBy(F.col("topic"), F.col("partition"), F.col("offset"))
        rr = ((F.row_number().over(w) - 1) % num_partitions).cast("int")
        return df.withColumn(out_col, rr)
    if strategy != "murmur2":
        raise ValueError(f"unknown repartitioning strategy: {strategy}")
    hashed = kafka_partition_expr(F.col(key_col), num_partitions)
    w = Window.partitionBy(F.col(key_col).isNull()).orderBy(
        F.col("topic"), F.col("partition"), F.col("offset")
    )
    rr = ((F.row_number().over(w) - 1) % num_partitions).cast("int")
    return df.withColumn(out_col, F.coalesce(hashed, rr))


def repartition_records(
    df: DataFrame, num_partitions: int, strategy: str = "murmur2"
) -> DataFrame:
    """Assign target partitions and physically co-locate rows by them.

    ``repartition(n, col)`` is the entire reader/writer mesh of the
    reference: Spark's shuffle provides the channels, backpressure and
    cancellation (SURVEY.md §2.10 R3).
    """
    out = assign_target_partitions(df, num_partitions, strategy)
    return out.repartition(num_partitions, F.col("target_partition")).withColumn(
        "partition", F.col("target_partition")
    ).drop("target_partition")
