"""Backup / restore engines: thin compositions of the operator modules.

The reference's engines are ~2500 lines of tokio task orchestration
(backup/engine.rs, restore/engine.rs); here each run is one declarative plan:
Spark's scheduler owns parallelism, retries, backpressure, and checkpointing
(SURVEY.md §4). Kafka-cluster I/O (S1/S2/S7) goes through
sources/kafka_io.py and is import-gated: everything downstream operates on
the canonical record schema, so file-backed tests exercise the same plans.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from kafka_backup_spark import manifest as mani
from kafka_backup_spark.operators import filters, projections, repartition
from kafka_backup_spark.sources.segments import SegmentStore


@dataclass
class BackupConfig:
    include_topics: list[str] = field(default_factory=list)
    exclude_topics: list[str] = field(default_factory=list)
    include_internal: bool = False
    start_offset: int | None = None
    end_offset: int | None = None
    inject_headers: bool = True
    source_cluster: str | None = None
    segment_span: int = 1000
    # storage knobs (config.rs:406-419): segment rotation size maps to
    # maxRecordsPerFile via the record-size hint; codec + zstd level map to
    # the parquet writer
    segment_max_bytes: int = 128 * 1024 * 1024
    avg_record_bytes_hint: int = 32
    compression: str = "zstd"
    zstd_level: int | None = None
    # T6 rate limiting: consumed by the streaming source as
    # maxOffsetsPerTrigger (kafka_io.source_options); batch runs ignore it
    rate_limit_records_per_sec: int | None = None

    def max_records_per_file(self) -> int:
        return max(1, self.segment_max_bytes // max(1, self.avg_record_bytes_hint))


@dataclass
class RestoreConfig:
    include_topics: list[str] = field(default_factory=list)
    exclude_topics: list[str] = field(default_factory=list)
    window_start_ms: int | None = None
    window_end_ms: int | None = None
    partitions: list[int] | None = None
    topic_mapping: dict[str, str] = field(default_factory=dict)
    partition_mapping: dict[int, int] = field(default_factory=dict)
    repartition_to: int | None = None
    repartition_strategy: str = "murmur2"
    inject_headers: bool = False


class BackupEngine:
    """One-shot / snapshot backup: records → filtered/projected stream →
    partitioned parquet store + manifest (SURVEY §3.1's Spark shape)."""

    def __init__(self, store: SegmentStore, config: BackupConfig | None = None):
        self.store = store
        self.config = config or BackupConfig()

    def plan(self, records: DataFrame) -> DataFrame:
        cfg = self.config
        out = filters.topic_filter(
            records, cfg.include_topics, cfg.exclude_topics, include_internal=cfg.include_internal
        )
        out = filters.offset_range_filter(out, cfg.start_offset, cfg.end_offset)
        if cfg.inject_headers:
            out = projections.inject_backup_headers(out, cfg.source_cluster)
        return out

    def run(self, records: DataFrame) -> DataFrame:
        """Execute the backup; returns the manifest DataFrame.

        The manifest must describe the data actually WRITTEN: the plan is
        persisted across the write and the manifest aggregation (one source
        scan, and a non-deterministic source — a Kafka read whose
        endingOffsets resolve differently on re-evaluation, a directory
        gaining files — cannot make the manifest disagree with the store),
        then the manifest is localCheckpoint-materialized so it stays valid
        after the plan is unpersisted."""
        missing = filters.missing_literal_includes(records, self.config.include_topics)
        if missing:
            raise ValueError(f"include topics missing from stream: {missing}")
        out = self.plan(records).persist()
        try:
            self.store.write(
                out,
                max_records_per_file=self.config.max_records_per_file(),
                compression=self.config.compression,
                zstd_level=self.config.zstd_level,
            )
            return mani.build_manifest(out, self.config.segment_span).localCheckpoint(
                eager=True
            )
        finally:
            out.unpersist()


class RestoreEngine:
    """PITR restore: pruned scan → filters → renames/remaps → (optional)
    murmur2 repartition → sink (SURVEY §3.2's Spark shape)."""

    def __init__(self, store: SegmentStore, config: RestoreConfig | None = None):
        self.store = store
        self.config = config or RestoreConfig()

    def plan(self, spark: SparkSession, records: DataFrame | None = None) -> DataFrame:
        cfg = self.config
        # read_any: migration-era stores mixing legacy JSON and parquet
        # segments restore without a conversion step (S5 dual format)
        out = records if records is not None else self.store.read_any(spark)
        out = filters.topic_filter(out, cfg.include_topics, cfg.exclude_topics, include_internal=True)
        # P5 record filter; P4's segment prune is the same predicate reaching
        # parquet row-group stats via pushdown
        if cfg.window_start_ms is not None or cfg.window_end_ms is not None:
            from pyspark.sql import functions as F

            out = filters.pitr_filter(
                out,
                F.timestamp_millis(F.lit(cfg.window_start_ms)) if cfg.window_start_ms is not None else None,
                F.timestamp_millis(F.lit(cfg.window_end_ms)) if cfg.window_end_ms is not None else None,
            )
        if cfg.partitions is not None:
            out = filters.partition_filter(out, cfg.partitions)
        if cfg.inject_headers:
            out = projections.inject_restore_headers(out)
        out = projections.rename_topics(out, cfg.topic_mapping)
        if cfg.repartition_to is not None:
            if cfg.partition_mapping:
                # the two knobs route records by CONTRADICTORY rules (explicit
                # per-partition placement vs key-hash); silently ignoring the
                # mapping — the old behavior — put records on unintended
                # partitions with no warning
                raise ValueError(
                    "partition_mapping and repartition_to are mutually exclusive: "
                    "hash repartitioning would override the explicit mapping"
                )
            out = repartition.repartition_records(out, cfg.repartition_to, cfg.repartition_strategy)
        else:
            out = projections.remap_partitions(out, cfg.partition_mapping)
        return out
