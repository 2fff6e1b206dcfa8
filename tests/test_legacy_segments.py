"""S5 dual-format: legacy JSON segment reader round-trip.

Reference behavior: restore/helpers.rs:17-52 reads a segment as binary when
it starts with MAGIC_BYTES, else parses it as the legacy JSON array with
compression detected from the file extension (compression.rs:46-54); record
serde is base64 key/value/header-value + epoch-ms timestamp
(manifest.rs:183-266).
"""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from kafka_backup_spark.sources.segments import SegmentStore, write_legacy_segments

RECS = [
    {
        "topic": "orders",
        "partition": 0,
        "offset": 7,
        "ts_ms": 1704067200123,
        "key": b"k7",
        "value": b"\x00\xffbinary",
        "headers": [("x-source", b"orders"), ("trace", b"\x01\x02")],
    },
    {
        "topic": "orders",
        "partition": 0,
        "offset": 8,
        "ts_ms": 1704067201000,
        "key": None,  # null key: optional-bytes decode branch
        "value": b"v8",
        "headers": [],
    },
    {
        "topic": "orders",
        "partition": 1,
        "offset": 3,
        "ts_ms": 1704067300000,
        "key": b"k3",
        "value": None,  # null value too
        "headers": [("h", b"x"), ("h-null", None)],  # null header value: stays null on the wire
    },
    {
        "topic": "audit.log",
        "partition": 2,
        "offset": 0,
        "ts_ms": 1704000000000,
        "key": b"a",
        "value": b"b",
        "headers": [("x-source", b"audit.log")],
    },
]


def test_legacy_roundtrip_with_gzip(spark, tmp_path):
    root = str(tmp_path / "store")
    n = write_legacy_segments(root, RECS, gzip_partitions=frozenset({0}))
    assert n == 3  # (orders,0) (orders,1) (audit.log,2)
    out = SegmentStore(root).read_legacy(spark)
    rows = {(r["topic"], r["partition"], r["offset"]): r for r in out.collect()}
    assert len(rows) == 4
    r7 = rows[("orders", 0, 7)]
    assert bytes(r7["key"]) == b"k7"
    assert bytes(r7["value"]) == b"\x00\xffbinary"
    assert r7["timestamp"].isoformat().startswith("2024-01-01")
    assert [(h["key"], bytes(h["value"])) for h in r7["headers"]] == [
        ("x-source", b"orders"),
        ("trace", b"\x01\x02"),
    ]
    r8 = rows[("orders", 0, 8)]
    assert r8["key"] is None and bytes(r8["value"]) == b"v8" and r8["headers"] == []
    r3 = rows[("orders", 1, 3)]
    assert r3["value"] is None and bytes(r3["key"]) == b"k3"
    assert [(h["key"], h["value"] if h["value"] is None else bytes(h["value"]))
            for h in r3["headers"]] == [("h", b"x"), ("h-null", None)]
    assert rows[("audit.log", 2, 0)]["topic"] == "audit.log"


def test_legacy_wire_format_matches_reference_serde(tmp_path):
    """The emitted JSON must be exactly the reference's serde shape: base64
    strings, nullable header values serialized as JSON null (not ""),
    compact arrays."""
    root = str(tmp_path / "store")
    write_legacy_segments(root, RECS[:1])
    p = tmp_path / "store/topics/orders/partition=0/segment-00000000000000000007.json"
    payload = json.loads(p.read_bytes())
    assert payload == [
        {
            "key": "azc=",
            "value": "AP9iaW5hcnk=",
            "headers": [
                {"key": "x-source", "value": "b3JkZXJz"},
                {"key": "trace", "value": "AQI="},
            ],
            "timestamp": 1704067200123,
            "offset": 7,
        }
    ]


def test_legacy_gzip_bytes_on_disk(tmp_path):
    root = str(tmp_path / "store")
    write_legacy_segments(root, RECS, gzip_partitions=frozenset({0, 1, 2}))
    p = tmp_path / "store/topics/orders/partition=1/segment-00000000000000000003.json.gz"
    assert json.loads(gzip.decompress(p.read_bytes()))[0]["offset"] == 3


def test_legacy_reader_schema_is_canonical(spark, tmp_path):
    """Columns + types line up with the parquet segment source so every
    downstream operator works on either format unchanged."""
    root = str(tmp_path / "store")
    write_legacy_segments(root, RECS)
    out = SegmentStore(root).read_legacy(spark)
    assert [f.name for f in out.schema.fields] == [
        "key",
        "value",
        "topic",
        "partition",
        "offset",
        "timestamp",
        "timestampType",
        "headers",
    ]
    # a canonical-stream operator runs unchanged on the legacy source
    agg = out.groupBy("topic").agg(F.count(F.lit(1)).alias("n")).collect()
    assert {(r["topic"], r["n"]) for r in agg} == {("orders", 3), ("audit.log", 1)}


def test_restore_engine_reads_mixed_store(spark, tmp_path):
    """A store holding BOTH parquet and legacy JSON segments restores as one
    stream (the migration scenario the dual-format reader exists for)."""
    from kafka_backup_spark.engine import RestoreConfig, RestoreEngine
    from kafka_backup_spark.schema import RECORD_SCHEMA

    root = str(tmp_path / "store")
    store = SegmentStore(root)
    modern = spark.createDataFrame(
        [
            (b"mk", b"mv", "orders", 0, 100, __import__("datetime").datetime(2024, 1, 2), 0, []),
        ],
        schema=RECORD_SCHEMA,
    )
    store.write(modern)
    write_legacy_segments(root, RECS, gzip_partitions=frozenset({0}))
    out = RestoreEngine(store, RestoreConfig()).plan(spark)
    got = {(r["topic"], r["partition"], r["offset"]) for r in out.collect()}
    assert ("orders", 0, 100) in got  # parquet side
    assert ("orders", 0, 7) in got and ("audit.log", 2, 0) in got  # legacy side
    assert len(got) == 5
