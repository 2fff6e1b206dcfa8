"""Segment store: the Parquet replacement for the reference's hand-rolled
segment files.

The reference appends length-prefixed records into a buffer, compresses the
whole block (zstd-3), adds magic + CRC32 footer, and PUTs
``topics/{topic}/partition={id}/segment-{start_offset:020}.bin.zst``
(segment/format.rs:1-65, segment/writer.rs:65-328, key layout
backup/engine.rs:1156-1162). Parquet partitioned by (topic, partition) gives
the same thing with columnar layout, zstd, min/max zone maps and checksums
built in — so P4's segment pruning becomes ordinary parquet file/row-group
skipping, and A11's CRC validation becomes parquet footer verification.

Rotation policy (≤128 MB / ≤60 s, writer.rs:237-251) maps to
``spark.sql.files.maxRecordsPerFile`` for batch and micro-batch triggers for
streaming. Storage backends (S6: s3/azure/gcs/file/memory) are Hadoop
filesystem URIs — zero custom code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_backup_spark.schema import RECORD_COLUMNS

DEFAULT_MAX_RECORDS_PER_FILE = 4_000_000  # ≈128 MB of typical ~32 B records


class SegmentStore:
    """Write/read the canonical record stream as a partitioned Parquet store."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def topics_path(self) -> str:
        return f"{self.root}/topics"

    def write(self, records: DataFrame, max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE) -> None:
        """S4: segment sink. partitionBy(topic, partition) reproduces the
        reference's object-key layout; each task writes its own files in
        parallel (the reference's one-in-flight-upload pipeline is subsumed
        by executor parallelism)."""
        (
            records.select(*[c for c in RECORD_COLUMNS if c in records.columns])
            # one shuffle so each (topic, partition) is written by one task →
            # no small-file explosion at 1000 executors
            .repartition("topic", "partition")
            .sortWithinPartitions("offset")
            .write.option("maxRecordsPerFile", max_records_per_file)
            .partitionBy("topic", "partition")
            .mode("append")
            .parquet(self.topics_path())
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """S5: segment source. Partition-column recovery of topic/partition is
        automatic; offset/timestamp predicates push down to row-group stats."""
        df = spark.read.parquet(self.topics_path())
        return df.withColumn("partition", df["partition"].cast("int"))

    def compact(
        self,
        spark: SparkSession,
        max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    ) -> None:
        """Operational compaction: incremental/streaming backups accumulate a
        file per micro-batch per (topic, partition); rewrite the store so
        each partition holds offset-sorted files of target size again (the
        reference's 128 MB segment discipline, writer.rs:237-251). Atomic
        via write-new → swap directories; at scale run per-topic to bound
        the rewrite working set."""
        import os
        import shutil

        current = self.read(spark)
        tmp_root = f"{self.root}/.compact-tmp"
        (
            current.repartition("topic", "partition")
            .sortWithinPartitions("offset")
            .write.option("maxRecordsPerFile", max_records_per_file)
            .partitionBy("topic", "partition")
            .mode("overwrite")
            .parquet(tmp_root)
        )
        old = f"{self.root}/.compact-old"
        os.rename(self.topics_path(), old)
        os.rename(tmp_root, self.topics_path())
        shutil.rmtree(old)
