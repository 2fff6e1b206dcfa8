"""Topic glob/regex filters (P1/P2/F1/F2) + PITR inclusivity (P5)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from kafka_backup_spark.functions.globs import glob_to_regex, globs_to_regex
from kafka_backup_spark.operators.filters import (
    missing_literal_includes,
    offset_range_filter,
    partition_filter,
    pitr_filter,
    topic_filter,
)

TOPICS = ["orders", "orders-dlq", "payments", "audit.log", "__consumer_offsets", "a1", "ab"]


def _topics_df(spark):
    return spark.createDataFrame([(t,) for t in TOPICS], "topic string")


def _names(df):
    return sorted(r[0] for r in df.select("topic").collect())


def test_glob_star_and_question(spark):
    df = _topics_df(spark)
    assert _names(topic_filter(df, include=["orders*"])) == ["orders", "orders-dlq"]
    assert _names(topic_filter(df, include=["a?"])) == ["a1", "ab"]
    # dot is literal, not regex-any
    assert _names(topic_filter(df, include=["audit.log"])) == ["audit.log"]
    assert _names(topic_filter(df, include=["audit?log"])) == ["audit.log"]


def test_empty_include_means_all_and_exclude_wins(spark):
    df = _topics_df(spark)
    assert _names(topic_filter(df)) == sorted(set(TOPICS) - {"__consumer_offsets"})
    assert _names(topic_filter(df, include=["orders*"], exclude=["*dlq"])) == ["orders"]


def test_internal_topics_opt_in(spark):
    df = _topics_df(spark)
    assert "__consumer_offsets" not in _names(topic_filter(df))
    assert "__consumer_offsets" in _names(topic_filter(df, include_internal=True))


def test_tilde_regex_and_invalid_regex(spark):
    df = _topics_df(spark)
    assert _names(topic_filter(df, include=["~^(orders|payments)$"])) == ["orders", "payments"]
    # invalid regex matches nothing (reference restore/engine.rs:1578-1583)
    assert glob_to_regex("~[unclosed") == r"(?!)"
    assert _names(topic_filter(df, include=["~[unclosed"])) == []
    assert globs_to_regex([]) == r"(?!)"


def test_missing_literal_includes(spark):
    df = _topics_df(spark)
    assert missing_literal_includes(df, ["orders", "gone", "or*"]) == ["gone"]
    assert missing_literal_includes(df, ["orders"]) == []


def test_pitr_inclusive_bounds(spark):
    df = spark.createDataFrame(
        [(i, f"2024-01-0{i} 00:00:00") for i in range(1, 6)], "id int, s string"
    ).withColumn("timestamp", F.col("s").cast("timestamp"))
    out = pitr_filter(df, F.lit("2024-01-02").cast("timestamp"), F.lit("2024-01-04").cast("timestamp"))
    assert sorted(r["id"] for r in out.collect()) == [2, 3, 4]
    half_open = pitr_filter(df, F.lit("2024-01-02").cast("timestamp"), None)
    assert sorted(r["id"] for r in half_open.collect()) == [2, 3, 4, 5]


def test_offset_range_half_open(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "offset long")
    out = offset_range_filter(df, 3, 7)
    assert sorted(r[0] for r in out.collect()) == [3, 4, 5, 6]


def test_partition_filter(spark):
    df = spark.createDataFrame([(p,) for p in range(5)], "partition int")
    out = partition_filter(df, [1, 3])
    assert sorted(r[0] for r in out.collect()) == [1, 3]
