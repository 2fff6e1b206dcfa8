"""Kafka source/sink option construction + admin gating (S1-S3/S7/S10/S11).
No cluster in this environment: options are pure data, admin paths must
raise NotImplementedError cleanly."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kafka_backup_spark.sources import kafka_io


def test_source_options_subscribe_list():
    opts = kafka_io.source_options("b1:9092,b2:9092", topics=["click", "view"])
    assert opts["subscribe"] == "click,view"
    assert opts["startingOffsets"] == "earliest"
    assert "endingOffsets" not in opts


def test_source_options_pattern_glob_translated():
    opts = kafka_io.source_options("b:9092", pattern="orders-*")
    assert opts["subscribePattern"] == "^orders\\-.*$"


def test_source_options_pattern_regex_passthrough():
    opts = kafka_io.source_options("b:9092", pattern="~^(a|b)$")
    assert opts["subscribePattern"] == "^(a|b)$"


def test_source_options_mutually_exclusive():
    with pytest.raises(ValueError):
        kafka_io.source_options("b:9092", topics=["t"], pattern="x*")
    with pytest.raises(ValueError):
        kafka_io.source_options("b:9092")


def test_snapshot_ending_offsets_pinning():
    wm = [("click", 0, 100), ("click", 1, 250), ("view", 0, 7)]
    ends = kafka_io.snapshot_ending_offsets(wm)
    assert ends == {"click": {"0": 100, "1": 250}, "view": {"0": 7}}
    opts = kafka_io.source_options(
        "b:9092", topics=["click", "view"], ending_offsets=ends,
        starting_offsets={"click": {"0": 10, "1": 20}, "view": {"0": 0}},
    )
    assert json.loads(opts["endingOffsets"]) == ends
    assert json.loads(opts["startingOffsets"])["click"]["1"] == 20


def test_rate_limit_option():
    opts = kafka_io.source_options("b:9092", topics=["t"], max_offsets_per_trigger=5000)
    assert opts["maxOffsetsPerTrigger"] == "5000"


def test_admin_paths_are_gated():
    for call in (
        lambda: kafka_io.list_offsets("b:9092", [("t", 0)]),
        lambda: kafka_io.ensure_topics_exist("b:9092", {"t": 4}),
        lambda: kafka_io.purge_topics("b:9092", [("t", 0, 100)]),
    ):
        with pytest.raises(NotImplementedError):
            call()


def test_target_partition_counts(spark):
    m = spark.createDataFrame(
        [("a", 0), ("a", 3), ("b", 1)], "topic string, partition int"
    )
    got = {
        r["topic"]: r["target_partitions"]
        for r in kafka_io.target_partition_counts(m).collect()
    }
    assert got == {"a": 4, "b": 2}
    forced = kafka_io.target_partition_counts(m, repartition_to=16).collect()
    assert all(r["target_partitions"] == 16 for r in forced)
