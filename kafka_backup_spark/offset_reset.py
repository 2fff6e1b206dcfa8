"""Consumer-group offset remapping (J3/J4) + reset plans — phase 3 of the
three-phase restore (reference: offset_reset.rs:218-448,
restore/three_phase.rs:101-266, snapshot import restore/engine.rs:152-235).

A pure DataFrame program: committed-offsets ⋈ offset-mapping (as-of J1) →
plan rows; the driver applies commits via an AdminClient (not a Spark op) or
emits the plan as JSON/shell. Bulk-parallelism of the reference's 50-way
semaphore is just executor parallelism here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_backup_spark.operators.asof import lookup_target_offsets
from kafka_backup_spark.operators.projections import remap_partitions, rename_topics

KEYS = ["topic", "partition"]


def import_group_snapshot(
    snapshot: DataFrame,
    topic_mapping: dict[str, str] | None = None,
    partition_mapping: dict[int, int] | None = None,
) -> DataFrame:
    """J4: apply topic/partition renames (identity default) and drop invalid
    (negative-offset) entries (restore/engine.rs:152-235).

    ``snapshot``: (group_id, topic, partition, offset[, metadata]).
    """
    out = snapshot.filter(F.col("offset") >= 0)
    out = rename_topics(out, topic_mapping or {})
    out = remap_partitions(out, partition_mapping or {})
    return out


def generate_group_plan(
    group_offsets: DataFrame,
    detailed_mapping: DataFrame | None,
    ranges: DataFrame | None = None,
) -> DataFrame:
    """J3: per (group, topic, partition) committed offset → target offset via
    the J1 as-of lookup; a group is complete iff every lookup resolved
    (offset_reset.rs:250-335).

    Returns (group_id, topic, partition, source_offset, target_offset,
    complete) where ``complete`` is the per-group bool_and.
    """
    probes = group_offsets.select(
        "group_id", *KEYS, F.col("offset").alias("source_offset")
    )
    looked = lookup_target_offsets(probes, detailed_mapping, ranges)
    return looked.withColumn(
        "complete",
        F.bool_and(F.col("target_offset").isNotNull()).over(Window.partitionBy("group_id")),
    )


def plan_summary(plan: DataFrame) -> DataFrame:
    """Per-group rollup: offsets total / mapped, completeness."""
    return plan.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("offsets"),
        F.sum(F.col("target_offset").isNotNull().cast("int")).alias("mapped"),
        F.bool_and(F.col("target_offset").isNotNull()).alias("complete"),
    )


def reset_latency_percentiles(
    latencies: DataFrame, col: str = "latency_ms", exact: bool = False
) -> DataFrame:
    """A10: p50/p99/avg over reset latencies (offset_automation.rs:202-245).

    Default is ``percentile_approx`` (t-digest style sketch: map-side
    combinable, bounded memory per group — the only shape that holds when the
    latency stream is billions of rows).  ``exact=True`` buffers every value
    in executor memory; it exists for the DuckDB oracle twin, whose exact
    quantiles must hash-match, and for driver-sized fixtures only."""
    p = "percentile" if exact else "percentile_approx"
    return latencies.agg(
        F.expr(f"{p}({col}, 0.5)").alias("p50"),
        F.expr(f"{p}({col}, 0.99)").alias("p99"),
        F.avg(col).alias("avg"),
    )
