"""Plan-A produce-offset capture (reference kafka/produce.rs:22-32).

The reference's restore path reads ``ProduceResponse.base_offset`` from every
produce request and reconstructs each record's broker-assigned offset as
``base_offset + index`` — so the source→target offset mapping exists even
when provenance-header injection is off.  Spark's built-in Kafka sink
discards assigned offsets (SURVEY.md §7 hard-part #1), so this module owns
the produce step instead:

  records → repartition(topic, partition) → sortWithinPartitions(offset)
          → mapInPandas(produce + delivery callbacks) → mapping DataFrame

Each task produces its (topic, partition) slice in source-offset order from
a single producer (preserving Kafka's per-partition ordering), delivery
callbacks report the broker-assigned offset per record, and the captured
mapping flows back as ordinary DataFrame rows — fully distributed, no driver
collect, no headers required.  Plan B (header reconciliation,
three_phase.build_offset_mapping) remains the fallback when the producing
system wasn't this module.

The producer is built by an injectable factory so the orchestration is
testable without a cluster (tests/test_produce_capture.py); the default
factory import-gates confluent-kafka inside the executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MAPPING_SCHEMA = (
    "topic string, partition int, source_offset long, target_offset long, timestamp long"
)


def default_producer_factory(bootstrap_servers: str):
    """Executor-side confluent-kafka producer (import-gated)."""

    def make():
        try:
            from confluent_kafka import Producer  # type: ignore
        except ImportError as e:  # pragma: no cover - no client lib in container
            raise NotImplementedError(
                "plan-A offset capture needs a Kafka client library "
                "(confluent-kafka) on the executors"
            ) from e
        return Producer({"bootstrap.servers": bootstrap_servers, "enable.idempotence": True})

    return make


def produce_with_offset_capture(
    records: DataFrame,
    producer_factory,
    poll_every: int = 1000,
) -> DataFrame:
    """Produce the canonical record stream and return the offset mapping
    (topic, partition, source_offset, target_offset, timestamp-ms).

    ``producer_factory() -> producer`` runs on the executor; the producer
    needs the confluent-kafka surface: ``produce(topic=, partition=, key=,
    value=, timestamp=, headers=, on_delivery=)``, ``poll(timeout)``,
    ``flush()``.  Callbacks fire on poll/flush within the same task, so the
    captured rows stay task-local until emitted."""
    import pandas as pd

    def produce_partition(batches):
        producer = producer_factory()
        captured: list[tuple] = []
        pending = 0

        def emit():
            if not captured:
                return pd.DataFrame(
                    columns=["topic", "partition", "source_offset", "target_offset", "timestamp"]
                )
            return pd.DataFrame(
                captured,
                columns=["topic", "partition", "source_offset", "target_offset", "timestamp"],
            )

        def make_cb(topic: str, part: int, src: int, ts: int):
            def cb(err, msg):
                if err is not None:
                    raise RuntimeError(f"produce failed for {topic}:{part}@{src}: {err}")
                captured.append((topic, part, src, msg.offset(), ts))

            return cb

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ts = int(row.timestamp.value // 10**6) if hasattr(row.timestamp, "value") else int(row.timestamp)
                # row.headers arrives as a numpy array under Arrow; bare
                # truthiness on a 2+ element array raises "ambiguous", so
                # the null check must be explicit (ADVICE r2).
                row_headers = row.headers if row.headers is not None else []
                headers = [
                    (h["key"], bytes(h["value"]) if h["value"] is not None else None)
                    for h in row_headers
                ]
                producer.produce(
                    topic=row.topic,
                    partition=int(row.partition),
                    key=None if row.key is None else bytes(row.key),
                    value=None if row.value is None else bytes(row.value),
                    timestamp=ts,
                    headers=headers,
                    on_delivery=make_cb(row.topic, int(row.partition), int(row.offset), ts),
                )
                pending += 1
                if pending % poll_every == 0:
                    producer.poll(0)
        producer.flush()
        yield emit()

    # one task per (topic, partition), records in source-offset order — the
    # single in-order producer per partition preserves Kafka ordering, and at
    # 1000 executors each partition produces independently
    ordered = records.repartition("topic", "partition").sortWithinPartitions(
        "topic", "partition", "offset"
    )
    return ordered.mapInPandas(produce_partition, MAPPING_SCHEMA)
