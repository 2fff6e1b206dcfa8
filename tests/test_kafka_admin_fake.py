"""Cluster-optional admin orchestration tests via an injected fake client.

The reference exercises ListOffsets batching (kafka/partition_router.rs:
370-436), topic create + ready-wait (restore/engine.rs:1104-1255),
DeleteRecords purge (restore/engine.rs:785-853), and offset-reset commits
against a live broker; here the SAME orchestration code runs against a fake
with the confluent-kafka AdminClient surface, so the logic is proven without
a cluster and the real client drops in unchanged.
"""

from __future__ import annotations

from types import SimpleNamespace

import pytest

from kafka_backup_spark.sources import kafka_io


class _Done:
    def __init__(self, value):
        self._value = value

    def result(self):
        if isinstance(self._value, Exception):
            raise self._value
        return self._value


class FakeAdmin:
    def __init__(self):
        self.topics = {"existing": 3}
        self.offsets = {("click", 0): (0, 100), ("click", 1): (5, 250)}  # (earliest, latest)
        self.committed: list = []
        self.created: list = []
        self.deleted: list = []
        self.ready_after_polls = 0  # topics visible immediately by default
        self._polls = 0

    # confluent_kafka.admin.AdminClient surface ---------------------------
    def list_topics(self, timeout=None):
        self._polls += 1
        visible = dict(self.topics)
        if self._polls <= self.ready_after_polls:
            visible = {t: n for t, n in visible.items() if t == "existing"}
        return SimpleNamespace(topics=visible)

    def list_offsets(self, request):
        out = {}
        for tp, spec in request.items():
            earliest, latest = self.offsets[(tp.topic, tp.partition)]
            off = latest if str(spec).lower().find("latest") >= 0 or spec == "latest" else earliest
            out[tp] = _Done(SimpleNamespace(offset=off))
        return out

    def create_topics(self, reqs):
        futures = {}
        for r in reqs:
            name, parts = (r if isinstance(r, tuple) else (r.topic, r.num_partitions))
            self.created.append((name, parts))
            self.topics[name] = parts
            futures[name] = _Done(None)
        return futures

    def delete_records(self, tps):
        futures = {}
        for tp in tps:
            self.deleted.append((tp.topic, tp.partition, tp.offset))
            futures[tp] = _Done(SimpleNamespace(low_watermark=tp.offset))
        return futures

    def alter_consumer_group_offsets(self, reqs):
        futures = {}
        for r in reqs:
            self.committed.extend(
                (r.group_id, tp.topic, tp.partition, tp.offset) for tp in r.topic_partitions
            )
            futures[r.group_id] = _Done(
                SimpleNamespace(topic_partitions=list(r.topic_partitions))
            )
        return futures


@pytest.fixture()
def fake():
    client = FakeAdmin()
    kafka_io.set_admin_factory(lambda servers: client)
    yield client
    kafka_io.set_admin_factory(None)


def test_list_offsets_batched(fake):
    got = kafka_io.list_offsets("b:9092", [("click", 0), ("click", 1)])
    assert got == {("click", 0): 100, ("click", 1): 250}
    assert kafka_io.list_offsets("b:9092", [("click", 0)], spec="earliest") == {
        ("click", 0): 0
    }


def test_ensure_topics_creates_only_missing(fake):
    created = kafka_io.ensure_topics_exist("b:9092", {"existing": 3, "fresh": 6})
    assert created == ["fresh"]
    assert fake.created == [("fresh", 6)]
    # second call is a no-op
    assert kafka_io.ensure_topics_exist("b:9092", {"existing": 3, "fresh": 6}) == []


def test_ensure_topics_ready_wait_polls_until_visible(fake):
    fake.ready_after_polls = 2  # first two metadata fetches miss the new topic
    created = kafka_io.ensure_topics_exist("b:9092", {"slow": 2}, timeout_s=5.0)
    assert created == ["slow"]
    assert fake._polls >= 3


def test_ensure_topics_ready_wait_times_out(fake):
    fake.ready_after_polls = 10**9
    with pytest.raises(TimeoutError):
        kafka_io.ensure_topics_exist("b:9092", {"never": 1}, timeout_s=0.3)


def test_purge_advances_low_watermark(fake):
    got = kafka_io.purge_topics("b:9092", [("click", 0, 42), ("click", 1, 7)])
    assert got == {("click", 0): 42, ("click", 1): 7}
    assert fake.deleted == [("click", 0, 42), ("click", 1, 7)]


def test_commit_group_offsets_groups_requests(fake):
    res = kafka_io.commit_group_offsets(
        "b:9092",
        [("g1", "click", 0, 10), ("g1", "click", 1, 20), ("g2", "view", 0, 5)],
    )
    assert res == {"g1": 2, "g2": 1}
    assert ("g1", "click", 1, 20) in fake.committed and ("g2", "view", 0, 5) in fake.committed


def test_create_topic_failure_propagates(fake):
    def failing_create(reqs):
        return {"boom": _Done(RuntimeError("TOPIC_AUTHORIZATION_FAILED"))}

    fake.create_topics = failing_create
    with pytest.raises(RuntimeError, match="AUTHORIZATION"):
        kafka_io.ensure_topics_exist("b:9092", {"boom": 1})


def test_without_factory_is_import_gated():
    kafka_io.set_admin_factory(None)
    with pytest.raises(NotImplementedError, match="confluent-kafka"):
        kafka_io.list_offsets("b:9092", [("t", 0)])
