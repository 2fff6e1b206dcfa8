"""Offset rollback snapshots: capture immutability, rollback diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_backup_spark.offset_rollback import OffsetSnapshotStore


@pytest.fixture()
def groups(spark):
    return spark.createDataFrame(
        [("g0", "click", 0, 100), ("g0", "click", 1, 200), ("g1", "view", 0, 50)],
        "group_id string, topic string, partition int, offset long",
    )


def test_capture_load_roundtrip(spark, groups, tmp_path):
    store = OffsetSnapshotStore(str(tmp_path))
    store.capture(groups, "snap-1")
    back = store.load(spark, "snap-1")
    assert sorted((r["group_id"], r["topic"], r["partition"], r["offset"]) for r in back.collect()) == sorted(
        map(tuple, groups.collect())
    )


def test_capture_refuses_overwrite(spark, groups, tmp_path):
    store = OffsetSnapshotStore(str(tmp_path))
    store.capture(groups, "snap-1")
    with pytest.raises(Exception):
        store.capture(groups, "snap-1")


def test_rollback_plan_diffs_live_state(spark, groups, tmp_path):
    store = OffsetSnapshotStore(str(tmp_path))
    store.capture(groups, "snap-1")
    live = spark.createDataFrame(
        [("g0", "click", 0, 100), ("g0", "click", 1, 999)],  # p1 drifted, g1 gone
        "group_id string, topic string, partition int, offset long",
    )
    plan = {(r["group_id"], r["topic"], r["partition"]): (r["action"], r["snapshot_offset"])
            for r in store.rollback_plan(spark, "snap-1", live).collect()}
    assert plan[("g0", "click", 0)][0] == "noop"
    assert plan[("g0", "click", 1)] == ("commit", 200)
    assert plan[("g1", "view", 0)] == ("commit", 50)
