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
