"""Offset rollback snapshots (reference: restore/offset_rollback.rs:50-124,
341-720): before applying a reset plan, capture every group's current
committed offsets as a versioned snapshot; rollback = re-commit the snapshot.

Snapshots are dated parquet directories under ``{root}/offset-snapshots/
{snapshot_id}/`` — append-only, never overwritten, so any previous state can
be restored. DataFrame-native: capture and diff are joins, the actual commit
is the driver's AdminClient step (sources/kafka_io, import-gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEYS = ["group_id", "topic", "partition"]

SNAPSHOT_SCHEMA = (
    "group_id string, topic string, partition int, offset long, metadata string"
)


class OffsetSnapshotStore:
    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def path(self, snapshot_id: str) -> str:
        return f"{self.root}/offset-snapshots/{snapshot_id}"

    def capture(self, group_offsets: DataFrame, snapshot_id: str) -> None:
        """Write a snapshot (one-time; refuses to overwrite so a rollback
        point can never be clobbered by a retry)."""
        (
            group_offsets.select(
                "group_id",
                "topic",
                F.col("partition").cast("int").alias("partition"),
                F.col("offset").cast("long").alias("offset"),
                *(
                    [F.col("metadata")]
                    if "metadata" in group_offsets.columns
                    else [F.lit(None).cast("string").alias("metadata")]
                ),
            )
            .write.mode("errorifexists")
            .parquet(self.path(snapshot_id))
        )

    def load(self, spark: SparkSession, snapshot_id: str) -> DataFrame:
        return spark.read.schema(SNAPSHOT_SCHEMA).parquet(self.path(snapshot_id))

    def rollback_plan(self, spark: SparkSession, snapshot_id: str, live: DataFrame) -> DataFrame:
        """Diff snapshot against live offsets → the commits needed to restore
        the snapshot state. Rows where live drifted (or the group vanished)
        get action='commit'; identical rows are 'noop'."""
        snap = self.load(spark, snapshot_id).select(
            *KEYS, F.col("offset").alias("snapshot_offset")
        )
        cur = live.select(*KEYS, F.col("offset").alias("live_offset"))
        j = snap.join(cur, KEYS, "left")
        return j.select(
            *KEYS,
            "snapshot_offset",
            "live_offset",
            F.when(
                F.col("live_offset").isNull()
                | (F.col("live_offset") != F.col("snapshot_offset")),
                F.lit("commit"),
            )
            .otherwise(F.lit("noop"))
            .alias("action"),
        )
