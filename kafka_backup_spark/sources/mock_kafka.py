"""In-memory Kafka producer double (the produce-side analogue of the
reference's memory storage backend, storage/memory.rs — used by its tests to
prove engine logic without a broker).

Lives in the package, not under tests/, because executor Python workers must
unpickle it by module reference when a Spark task carries the factory
closure; the tests directory is not importable on workers.
"""

from __future__ import annotations


class _Msg:
    def __init__(self, offset: int):
        self._offset = offset

    def offset(self) -> int:
        return self._offset


class MockProducer:
    """confluent-kafka Producer surface: assigns contiguous offsets per
    (topic, partition) from a configured log-end and fires delivery
    callbacks on poll/flush — a broker with batched acks."""

    def __init__(self, log_end: dict | None = None):
        self.log_end = dict(log_end or {})
        self._queue: list = []
        self.produced: list = []

    def produce(self, topic, partition, key, value, timestamp, headers, on_delivery):
        self.produced.append((topic, partition, key, value, timestamp, headers))
        self._queue.append((topic, partition, on_delivery))

    def poll(self, timeout=0):
        self._deliver()

    def flush(self):
        self._deliver()

    def _deliver(self):
        for topic, partition, cb in self._queue:
            off = self.log_end.get((topic, partition), 0)
            self.log_end[(topic, partition)] = off + 1
            cb(None, _Msg(off))
        self._queue.clear()


def mock_producer_factory(log_end: dict | None = None):
    """Factory for produce_with_offset_capture: every task gets its own
    producer seeded with the same per-partition log-ends (tasks own disjoint
    partitions, so the counters never conflict)."""
    ends = dict(log_end or {})

    def make() -> MockProducer:
        return MockProducer(ends)

    return make
