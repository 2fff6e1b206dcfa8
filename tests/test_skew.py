"""Salted aggregation/join equivalence with unsalted plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_backup_spark.operators import skew
from kafka_backup_spark.schema import events_as_records, load_table


@pytest.fixture(scope="module")
def records(spark, sf_dir):
    return events_as_records(load_table(spark, sf_dir, "events")).cache()


def test_salted_aggregate_matches_plain(records):
    plain = {
        (r["topic"], r["partition"]): (r["n"], r["mx"], r["mn"], r["s"])
        for r in records.groupBy("topic", "partition")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("offset").alias("mx"),
            F.min("offset").alias("mn"),
            F.sum("offset").alias("s"),
        )
        .collect()
    }
    salted = {
        (r["topic"], r["partition"]): (r["n"], r["mx"], r["mn"], r["s"])
        for r in skew.salted_aggregate(
            records,
            ["topic", "partition"],
            {"n": "count(*)", "mx": "max(offset)", "mn": "min(offset)", "s": "sum(offset)"},
        ).collect()
    }
    assert plain == salted


def test_salted_aggregate_rejects_non_algebraic(records):
    with pytest.raises(ValueError):
        skew.salted_aggregate(records, ["topic"], {"a": "avg(offset)"})


def test_salted_join_matches_plain(spark, records):
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("error", 3)], "topic string, weight int"
    )
    plain = records.join(dim, ["topic"]).groupBy("topic").agg(
        F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w")
    )
    salted = skew.salted_join(records, dim, ["topic"], buckets=4).groupBy("topic").agg(
        F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_distribution_spreads_hot_key(records):
    hot = records.filter(F.col("topic") == records.select("topic").first()["topic"])
    salted = skew.with_salt(hot, buckets=8)
    per_bucket = salted.groupBy("_salt").count().collect()
    assert len(per_bucket) == 8  # every bucket hit
    counts = [r["count"] for r in per_bucket]
    assert max(counts) < 3 * min(counts)  # roughly uniform


# ── Span-operator hot-key hardening (VERDICT r7 #2) ───────────────────────
# A boilerplate 40-char span occurring in a large share of documents
# (license headers, navigation chrome — guaranteed at 100 TB) must not
# funnel into one window partition.  The shipped shape computes per-hash
# owner counts with partial-agg-safe groupBys and an AQE-splittable join;
# these tests pin (a) the structural invariant — no window partitioned on
# the span-hash column — and (b) correctness on a corpus where one span
# sits in well over half the documents.


def _window_partition_specs(df) -> list[str]:
    """Partition column lists of every windowspecdefinition in the plan."""
    import re

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return re.findall(r"windowspecdefinition\(([^)]*?)(?:, specifiedwindowframe|\))", plan)


def test_span_operators_have_no_hot_key_window(spark):
    from kafka_backup_spark.queries.pipeline import (
        q_dup_span_extents,
        q_dup_span_fraction,
    )

    for q in (q_dup_span_fraction, q_dup_span_extents):
        for spec in _window_partition_specs(q(spark, "/root/testdata/sf0.001")):
            # every window must be keyed by doc_id (per-doc positions /
            # gaps-and-islands); a spec mentioning only the span hash would
            # reintroduce the straggler
            assert "doc_id" in spec, f"{q.__name__}: hot-key window spec {spec!r}"


def test_planted_hot_span_fraction_and_extents(spark):
    from kafka_backup_spark.queries.pipeline import (
        SPAN_LEN,
        dup_span_extents_frame,
        dup_span_fraction_frame,
    )

    hot = "x" * SPAN_LEN  # one shared span planted in >50% of docs
    rows = []
    for d in range(40):
        uniq = f"doc{d:03d} " + " ".join(f"w{d}{j}" for j in range(20))
        text = (hot + " " + uniq) if d < 30 else uniq
        rows.append((d, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    frac = {r["doc_id"]: r for r in dup_span_fraction_frame(docs).collect()}
    # the 30 planted docs each contain the hot span (first word is an anchor
    # by construction), so every one reports >= 1 duplicated span
    for d in range(30):
        assert frac[d]["n_dup_spans"] >= 1, d
    # the 10 clean docs share no 40-char window with any other doc
    for d in range(30, 40):
        assert frac[d]["n_dup_spans"] == 0, d

    ext = {r["doc_id"]: r for r in dup_span_extents_frame(docs).collect()}
    for d in range(30):
        assert ext[d]["n_spans"] >= 1 and ext[d]["dup_chars"] >= SPAN_LEN, d
        assert ext[d]["spans"].startswith("1-"), d  # extent anchored at doc start
    for d in range(30, 40):
        assert ext[d]["n_spans"] == 0 and ext[d]["spans"] == "", d
