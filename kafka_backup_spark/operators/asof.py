"""As-of joins for offset-mapping lookups (J1/J2) — the reference's only
non-equi lookups, reimplemented as window-function joins.

Reference semantics (crates/kafka-backup-core/src/manifest.rs:624-700, golden
cases in its tests at manifest.rs:909-991):

J1 ``lookup_target_offset(topic, partition, x)``:
  1. exact detailed pair at x → its target
  2. else greatest pair with source_offset ≤ x → target + (x − source)
     (extrapolation; exact match is the delta=0 case)
  3. else range-entry linear interpolation:
     target_first + trunc((x − source_first)/source_range · target_range),
     zero-width source range → target_first
  4. else NULL

J2 ``get_nearest_offset_by_timestamp(topic, partition, T)``: first detailed
pair with timestamp ≥ T (min by timestamp), else the last pair (max source
offset); NULL when no pairs exist.

Scale notes: the union-window formulation shuffles probes+mapping ONCE on
(topic, partition) and needs no per-row binary search; with AQE the sort is
per-partition and spill-safe. No driver-side collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEYS = ["topic", "partition"]


def lookup_target_offsets(
    probes: DataFrame,
    detailed: DataFrame | None,
    ranges: DataFrame | None = None,
    probe_col: str = "source_offset",
    out_col: str = "target_offset",
) -> DataFrame:
    """J1. ``probes``: (topic, partition, source_offset, …carry-through cols).
    ``detailed``: (topic, partition, source_offset, target_offset).
    ``ranges``: (topic, partition, source_first_offset, source_last_offset,
    target_first_offset, target_last_offset) — interpolation fallback.

    Returns probes + ``out_col`` (nullable long).
    """
    carry = [c for c in probes.columns if c not in (*KEYS, probe_col)]
    p = probes.select(
        *KEYS,
        F.col(probe_col).alias("_so"),
        F.lit(0).alias("_is_map"),
        F.lit(None).cast("long").alias("_map_target"),
        *[F.col(c) for c in carry],
    )
    if detailed is not None:
        m = detailed.select(
            *KEYS,
            F.col("source_offset").alias("_so"),
            F.lit(1).alias("_is_map"),
            F.col("target_offset").alias("_map_target"),
            *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in carry],
        )
        u = p.unionByName(m)
    else:
        u = p

    # mapping rows sort before probe rows at equal offset so an exact match is
    # the nearest-≤ pair with delta 0 — same arithmetic path as extrapolation
    w = (
        Window.partitionBy(*KEYS)
        .orderBy(F.col("_so").asc(), F.col("_is_map").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    near_src = F.last(F.when(F.col("_is_map") == 1, F.col("_so")), ignorenulls=True).over(w)
    near_tgt = F.last(F.col("_map_target"), ignorenulls=True).over(w)
    asof = (
        u.withColumn("_near_src", near_src)
        .withColumn("_near_tgt", near_tgt)
        .filter(F.col("_is_map") == 0)
        .withColumn("_asof", F.col("_near_tgt") + (F.col("_so") - F.col("_near_src")))
    )

    if ranges is not None:
        r = ranges.select(
            *KEYS,
            "source_first_offset",
            "source_last_offset",
            "target_first_offset",
            "target_last_offset",
        )
        asof = asof.join(F.broadcast(r), KEYS, "left")
        src_range = F.col("source_last_offset") - F.col("source_first_offset")
        tgt_range = F.col("target_last_offset") - F.col("target_first_offset")
        pos = (F.col("_so") - F.col("source_first_offset")) / src_range
        interp = F.when(
            F.col("target_first_offset").isNotNull() & F.col("target_last_offset").isNotNull(),
            F.when(src_range > 0, F.col("target_first_offset") + (pos * tgt_range).cast("long"))
            .otherwise(F.col("target_first_offset")),
        )
        result = F.coalesce(F.col("_asof"), interp)
    else:
        result = F.col("_asof")

    return asof.select(
        *KEYS, F.col("_so").alias(probe_col), *carry, result.alias(out_col)
    )


def nearest_offsets_by_timestamp(
    probes: DataFrame,
    detailed: DataFrame,
    probe_ts_col: str = "probe_ts",
) -> DataFrame:
    """J2. ``probes``: (topic, partition, probe_ts). ``detailed`` additionally
    carries a ``timestamp`` column (ms epoch long).

    Returns probes + (source_offset, target_offset) of the first pair with
    timestamp ≥ probe, else the pair with the greatest source offset.
    """
    agg = detailed.groupBy(*KEYS).agg(
        F.max_by(F.struct("source_offset", "target_offset"), F.col("source_offset")).alias("_last")
    )
    # ≥-probe minimum: theta-join probes×pairs within (topic, partition).
    # Mapping tables are small relative to the stream (one pair per produce
    # batch) → broadcast; falls back to shuffle join above the threshold.
    cand = (
        probes.join(F.broadcast(detailed), KEYS, "left")
        .filter(F.col("timestamp") >= F.col(probe_ts_col))
        .groupBy(*KEYS, probe_ts_col)
        .agg(
            F.min_by(
                F.struct("source_offset", "target_offset"), F.struct("timestamp", "source_offset")
            ).alias("_first_ge")
        )
    )
    out = (
        probes.join(cand, [*KEYS, probe_ts_col], "left")
        .join(F.broadcast(agg), KEYS, "left")
        .withColumn("_pick", F.coalesce(F.col("_first_ge"), F.col("_last")))
    )
    return out.select(
        *KEYS,
        probe_ts_col,
        F.col("_pick.source_offset").alias("source_offset"),
        F.col("_pick.target_offset").alias("target_offset"),
    )
