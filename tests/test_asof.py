"""J1/J2 as-of lookup golden cases, lifted from the reference's unit tests
(manifest.rs:909-991 — values only, behavior parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_backup_spark.operators.asof import lookup_target_offsets, nearest_offsets_by_timestamp


def _detailed(spark):
    rows = [
        ("orders", 0, 0, 5000, 1700000000000),
        ("orders", 0, 1, 5001, 1700000001000),
        ("orders", 0, 2, 5002, 1700000002000),
    ]
    return spark.createDataFrame(
        rows, "topic string, partition int, source_offset long, target_offset long, timestamp long"
    )


def _lookup(spark, probes_rows, detailed, ranges=None):
    probes = spark.createDataFrame(probes_rows, "topic string, partition int, source_offset long")
    out = lookup_target_offsets(probes, detailed, ranges)
    return {
        (r["topic"], r["partition"], r["source_offset"]): r["target_offset"]
        for r in out.collect()
    }


def test_exact_match(spark):
    got = _lookup(spark, [("orders", 0, 1)], _detailed(spark))
    assert got[("orders", 0, 1)] == 5001


def test_extrapolation_beyond_range(spark):
    # golden: 999 → 5999 (nearest pair (2, 5002), delta 997)
    got = _lookup(spark, [("orders", 0, 999)], _detailed(spark))
    assert got[("orders", 0, 999)] == 5999


def test_unknown_topic_partition_is_null(spark):
    got = _lookup(spark, [("unknown", 0, 1), ("orders", 99, 1)], _detailed(spark))
    assert got[("unknown", 0, 1)] is None
    assert got[("orders", 99, 1)] is None


def test_range_interpolation_fallback(spark):
    # no detailed pairs; range (0..100 → 5000..5100): midpoint + endpoints
    ranges = spark.createDataFrame(
        [("orders", 0, 0, 100, 5000, 5100)],
        "topic string, partition int, source_first_offset long, source_last_offset long,"
        " target_first_offset long, target_last_offset long",
    )
    got = _lookup(spark, [("orders", 0, 50), ("orders", 0, 0), ("orders", 0, 100)], None, ranges)
    assert got[("orders", 0, 50)] == 5050
    assert got[("orders", 0, 0)] == 5000
    assert got[("orders", 0, 100)] == 5100


def test_zero_width_range(spark):
    ranges = spark.createDataFrame(
        [("orders", 0, 7, 7, 5000, 5000)],
        "topic string, partition int, source_first_offset long, source_last_offset long,"
        " target_first_offset long, target_last_offset long",
    )
    got = _lookup(spark, [("orders", 0, 7)], None, ranges)
    assert got[("orders", 0, 7)] == 5000


def test_below_all_pairs_uses_interpolation_fallback(spark):
    # probe below every detailed pair: detailed path yields no nearest-≤ →
    # falls through to the range entry, like the reference
    detailed = spark.createDataFrame(
        [("orders", 0, 10, 5010, 1700000000000)],
        "topic string, partition int, source_offset long, target_offset long, timestamp long",
    )
    ranges = spark.createDataFrame(
        [("orders", 0, 0, 100, 5000, 5100)],
        "topic string, partition int, source_first_offset long, source_last_offset long,"
        " target_first_offset long, target_last_offset long",
    )
    got = _lookup(spark, [("orders", 0, 5)], detailed, ranges)
    assert got[("orders", 0, 5)] == 5005


def test_timestamp_asof(spark):
    detailed = _detailed(spark)
    probes = spark.createDataFrame(
        [
            ("orders", 0, 1700000001000),  # exact
            ("orders", 0, 1700000000500),  # between → next higher
            ("orders", 0, 1699999999000),  # before first → first
            ("orders", 0, 1800000000000),  # after last → last pair
        ],
        "topic string, partition int, probe_ts long",
    )
    out = nearest_offsets_by_timestamp(probes, detailed)
    got = {r["probe_ts"]: (r["source_offset"], r["target_offset"]) for r in out.collect()}
    assert got[1700000001000] == (1, 5001)
    assert got[1700000000500] == (1, 5001)
    assert got[1699999999000] == (0, 5000)
    assert got[1800000000000] == (2, 5002)


def test_interpolation_matches_reference_float_semantics(spark):
    """The range-interpolation fallback must reproduce the reference's f64
    truncation (manifest.rs:662-663) bit-for-bit — including the cases where
    exact integer math would differ: 15/22*22 = 14.999… truncates to 14, so
    probe 15 on range 0..22 → 5000..5022 maps to 5014, NOT 5015."""
    from kafka_backup_spark.operators.asof import lookup_target_offsets

    ranges = spark.createDataFrame(
        [("t", 0, 0, 22, 5000, 5022)],
        "topic string, partition int, source_first_offset long, "
        "source_last_offset long, target_first_offset long, target_last_offset long",
    )
    probes = spark.createDataFrame(
        [("t", 0, so) for so in range(23)], "topic string, partition int, source_offset long"
    )
    got = {
        r["source_offset"]: r["target_offset"]
        for r in lookup_target_offsets(probes, None, ranges).collect()
    }
    # the reference formula in pure Python (f64 is IEEE double in both)
    for so in range(23):
        pos = (so - 0) / 22.0
        want = 5000 + int(pos * 22.0)
        assert got[so] == want, (so, got[so], want)
    assert got[15] == 5014  # the truncation case an integer formula would miss


def test_duplicate_source_offset_ties_are_deterministic(spark):
    """ADVICE r6: a detailed mapping carrying two pairs at the same (topic,
    partition, source_offset) must resolve to ONE deterministic pair on
    every run — the total ordering picks the max target_offset, never
    arbitrary row order (which can flip across runs/engines and break
    driver hash checks)."""
    dup = spark.createDataFrame(
        [
            ("t", 0, 10, 7000, 1700000000000),
            ("t", 0, 10, 7009, 1700000000000),  # same source AND timestamp
        ],
        "topic string, partition int, source_offset long, target_offset long, timestamp long",
    )
    # J1: nearest-≤ pair at probe 12 → delta 2 off the max-target twin
    for _ in range(3):
        got = _lookup(spark, [("t", 0, 12)], dup)
        assert got[("t", 0, 12)] == 7009 + 2

    # J2: both the first-≥ branch (probe before the pair) and the last-pair
    # fallback (probe after) must land on a fixed twin.  first-≥ takes the
    # MIN (timestamp, source_offset, target_offset) → 7000; the fallback
    # takes the MAX → 7009 — mirrored exactly in SQL_TIMESTAMP_ASOF.
    probes = spark.createDataFrame(
        [("t", 0, 1699999999000), ("t", 0, 1800000000000)],
        "topic string, partition int, probe_ts long",
    )
    for _ in range(3):
        out = nearest_offsets_by_timestamp(probes, dup)
        got = {r["probe_ts"]: (r["source_offset"], r["target_offset"]) for r in out.collect()}
        assert got[1699999999000] == (10, 7000)
        assert got[1800000000000] == (10, 7009)
