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
    # the nearest-≤ pair with delta 0 — same arithmetic path as extrapolation.
    # _map_target closes the order over duplicate-source mapping rows
    # (ADVICE r6): the running `last` then deterministically yields the max
    # target among ties instead of arbitrary row order.
    w = (
        Window.partitionBy(*KEYS)
        .orderBy(
            F.col("_so").asc(),
            F.col("_is_map").desc(),
            F.col("_map_target").asc_nulls_first(),
        )
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
        # DELIBERATE f64 division + truncation, NOT exact integer math:
        # the reference interpolates as
        #   position = (so - first) as f64 / src_range as f64;
        #   target_first + (position * tgt_range as f64) as i64
        # (manifest.rs:662-663), so e.g. range 0..22 → 5000..5022 probe 15
        # yields 5014 (15/22*22 = 14.999… truncates to 14) — an exact
        # integer formula would "fix" this to 5015 and silently diverge
        # from every reference deployment's reset plans.  Pinned by
        # test_asof.py::test_interpolation_matches_reference_float_semantics.
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
    dedup_probes: bool = False,
) -> DataFrame:
    """J2. ``probes``: (topic, partition, probe_ts). ``detailed`` additionally
    carries a ``timestamp`` column (ms epoch long).

    Returns probes + (source_offset, target_offset) of the first pair with
    timestamp ≥ probe, else the pair with the greatest source offset.

    Same union-window shape as J1 (no probes×pairs join-then-filter: that
    formulation expands O(probes × pairs-per-partition) rows before its
    min_by — a quadratic blowup once detailed mappings reach ~10⁶ pairs per
    partition at 100-TB scale).  Probes and pairs shuffle ONCE on
    (topic, partition); row count never exceeds probes + pairs.

    Both window passes use RUNNING frames only (r6): the original
    forward-looking frame (currentRow→unboundedFollowing) hits Spark's
    UnboundedFollowing frame processor, which re-evaluates the aggregate
    from each row to the partition end — O(rows²) per partition and
    measured 3× slower at 10⁴ pairs/partition.  Scanning ts-DESCENDING, the
    most-recently-seen mapping row at a probe is exactly the min-(timestamp,
    source_offset) pair among those with timestamp ≥ probe (mapping rows
    sort BEFORE probes at equal ts so the ≥ is inclusive; _so descending
    makes the running `last` land on the smallest source offset among ties).
    The greatest-source-offset fallback is a second running pass in ASC
    order: it yields the max-source pair among ts ≤ probe, which equals the
    reference's global last-pair exactly in the only case it is consulted
    (first_ge NULL ⇒ every pair is ≤ probe).  Same exchange, two in-stage
    sorts, no O(n²) frames, no extra join.

    ``dedup_probes=True`` additionally collapses duplicate (topic,
    partition, probe_ts) rows inside the same window stage (a lag on the
    DESC sort), saving callers a separate distinct() exchange.
    """
    p = probes.select(
        *KEYS,
        F.col(probe_ts_col).alias("_ts"),
        F.lit(0).alias("_is_map"),
        F.lit(None).cast("long").alias("_so"),
        F.lit(None).cast("long").alias("_tgt"),
    )
    m = detailed.select(
        *KEYS,
        F.col("timestamp").alias("_ts"),
        F.lit(1).alias("_is_map"),
        F.col("source_offset").alias("_so"),
        F.col("target_offset").alias("_tgt"),
    )
    u = p.unionByName(m)
    # _tgt participates in both sort orders so the ordering is TOTAL over
    # mapping rows (ADVICE r6): two pairs sharing (topic, partition,
    # timestamp, source_offset) would otherwise make the running `last` —
    # and the driver hash — flip run-to-run.  Reference mappings keep
    # source_offset unique per partition (manifest.rs builds them from a
    # scan), so the tie-break is defensive, but determinism shouldn't rest
    # on an undeclared invariant.
    desc_order = [
        F.col("_ts").desc(),
        F.col("_is_map").desc(),
        F.col("_so").desc(),
        F.col("_tgt").desc(),
    ]
    asc_order = [
        F.col("_ts").asc(),
        F.col("_is_map").asc(),
        F.col("_so").asc(),
        F.col("_tgt").asc(),
    ]
    w_desc = (
        Window.partitionBy(*KEYS).orderBy(*desc_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_asc = (
        Window.partitionBy(*KEYS).orderBy(*asc_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pair = F.struct(F.col("_so").alias("source_offset"), F.col("_tgt").alias("target_offset"))
    map_pair = F.when(F.col("_is_map") == 1, pair)
    first_ge = F.last(map_pair, ignorenulls=True).over(w_desc)
    # struct key makes the argmax total: ties on _so resolve by _tgt instead
    # of arbitrary row order (ADVICE r6) — mirrors the oracle's composite
    # ORDER BY so both engines pick the identical pair
    last_pair = F.max_by(
        pair, F.when(F.col("_is_map") == 1, F.struct(F.col("_so"), F.col("_tgt")))
    ).over(w_asc)
    out = u.withColumn("_pick", F.coalesce(first_ge, last_pair))
    if dedup_probes:
        prev = F.lag(F.struct("_ts", "_is_map")).over(
            Window.partitionBy(*KEYS).orderBy(*desc_order)
        )
        dup = F.coalesce(
            (F.col("_is_map") == 0)
            & (prev["_is_map"] == 0)
            # null-SAFE equality: distinct() (the contract this replaces)
            # treats NULL probe timestamps as equal, so dedup must too
            & prev["_ts"].eqNullSafe(F.col("_ts")),
            F.lit(False),  # partition-first row: lag is NULL, keep the row
        )
        out = out.withColumn("_dup", dup).filter(
            (F.col("_is_map") == 0) & ~F.col("_dup")
        )
    else:
        out = out.filter(F.col("_is_map") == 0)
    return out.select(
        *KEYS,
        F.col("_ts").alias(probe_ts_col),
        F.col("_pick.source_offset").alias("source_offset"),
        F.col("_pick.target_offset").alias("target_offset"),
    )
