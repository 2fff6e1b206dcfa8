"""Manifest build/merge/describe (A1/A2/J6) + resume anti-join (J5) +
backup→restore roundtrip over the segment store."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_backup_spark import manifest as mani
from kafka_backup_spark.engine import BackupConfig, BackupEngine, RestoreConfig, RestoreEngine
from kafka_backup_spark.schema import events_as_records, load_table
from kafka_backup_spark.sources.segments import SegmentStore


def _records(spark, sf_dir):
    return events_as_records(load_table(spark, sf_dir, "events"))


def test_build_manifest_totals(spark, sf_dir):
    recs = _records(spark, sf_dir)
    m = mani.build_manifest(recs, segment_span=1000)
    t = mani.manifest_totals(m).collect()[0]
    assert t["total_records"] == recs.count()
    assert t["total_segments"] == m.count()
    # per-partition ranges consistent
    bad = m.filter(F.col("start_offset") > F.col("end_offset")).count()
    assert bad == 0


def test_merge_manifests_existing_wins(spark):
    cols = (
        "topic string, partition int, key string, start_offset long, end_offset long,"
        " start_ts long, end_ts long, record_count long, uncompressed_size long, compressed_size long"
    )
    existing = spark.createDataFrame(
        [
            ("t", 0, "k0", 0, 99, 0, 1, 100, 1000, 300),
            ("t", 0, "k1", 100, 199, 0, 1, 100, 1000, 300),
        ],
        cols,
    )
    current = spark.createDataFrame(
        [
            ("t", 0, "k1", 100, 199, 0, 1, 50, 500, 150),  # dup key → existing wins
            ("t", 0, "k2", 100, 180, 0, 1, 80, 800, 240),  # dup start_offset → existing wins
            ("t", 0, "k3", 200, 299, 0, 1, 100, 1000, 300),  # new
            ("t", 1, "k0", 0, 99, 0, 1, 100, 1000, 300),  # other partition, same key ok
        ],
        cols,
    )
    merged = mani.merge_manifests(existing, current)
    rows = {(r["topic"], r["partition"], r["key"]): r for r in merged.collect()}
    assert set(rows) == {("t", 0, "k0"), ("t", 0, "k1"), ("t", 0, "k3"), ("t", 1, "k0")}
    assert rows[("t", 0, "k1")]["record_count"] == 100  # existing won
    # idempotence: merging the merged result with current again changes nothing
    again = mani.merge_manifests(merged, current)
    assert again.count() == merged.count()


def test_skip_completed_anti_join(spark):
    m = spark.createDataFrame([("a",), ("b",), ("c",)], "key string")
    done = spark.createDataFrame([("b",)], "key string")
    left = sorted(r["key"] for r in mani.skip_completed(m, done).collect())
    assert left == ["a", "c"]


def test_backup_restore_roundtrip(spark, sf_dir, tmp_path):
    recs = _records(spark, sf_dir)
    store = SegmentStore(str(tmp_path / "store"))
    engine = BackupEngine(store, BackupConfig(inject_headers=False, segment_span=500))
    manifest = engine.run(recs)

    restored = RestoreEngine(store).plan(spark)
    src = recs.groupBy("topic", "partition").agg(
        F.count(F.lit(1)).alias("n"), F.min("offset").alias("lo"), F.max("offset").alias("hi")
    )
    dst = restored.groupBy("topic", "partition").agg(
        F.count(F.lit(1)).alias("n"), F.min("offset").alias("lo"), F.max("offset").alias("hi")
    )
    diff = src.exceptAll(dst).count() + dst.exceptAll(src).count()
    assert diff == 0
    # manifest agrees with the store contents (A4-shape check)
    m_counts = manifest.groupBy("topic", "partition").agg(F.sum("record_count").alias("n"))
    diff2 = m_counts.exceptAll(src.select("topic", "partition", "n")).count()
    assert diff2 == 0


def test_pitr_restore_window(spark, sf_dir, tmp_path):
    recs = _records(spark, sf_dir)
    store = SegmentStore(str(tmp_path / "store2"))
    BackupEngine(store, BackupConfig(inject_headers=False)).run(recs)
    lo, hi = 1704500000000, 1705500000000
    out = RestoreEngine(store, RestoreConfig(window_start_ms=lo, window_end_ms=hi)).plan(spark)
    expected = recs.filter(
        (F.unix_millis("timestamp") >= lo) & (F.unix_millis("timestamp") <= hi)
    ).count()
    assert out.count() == expected
    assert out.filter(F.unix_millis("timestamp") < lo).count() == 0


def test_compaction_plan_reconciles_and_packs_greedily(spark):
    """compaction_plan invariants: bucket totals reconcile with the input
    manifest exactly, buckets are consecutive per partition, offset ranges
    nest without overlap, and each bucket crosses the target at most via
    its final boundary segment (greedy prefix)."""
    from kafka_backup_spark import manifest as mani

    rows = [
        # (topic, partition, key, start, end, s_ts, e_ts, records, unc, comp)
        ("t", 0, f"seg-{i}", i * 100, i * 100 + 99, 0, 1, 100, 600, sz)
        for i, sz in enumerate([300, 300, 300, 100, 700, 50, 50, 50])
    ] + [("t", 1, "seg-x", 0, 99, 0, 1, 100, 600, 120)]
    m = spark.createDataFrame(
        rows,
        "topic string, partition int, key string, start_offset long, "
        "end_offset long, start_ts long, end_ts long, record_count long, "
        "uncompressed_size long, compressed_size long",
    )
    plan = mani.compaction_plan(m, 512).collect()
    assert sum(r["bucket_bytes"] for r in plan) == 300 * 3 + 100 + 700 + 50 * 3 + 120
    assert sum(r["n_segments"] for r in plan) == 9
    p0 = sorted((r for r in plan if r["partition"] == 0), key=lambda r: r["bucket"])
    # greedy prefix with target 512 over sizes [300,300,300,100,700,50,50,50]:
    # cum-before: 0,300,600,900,1000,1700,1750,1800 → buckets 0,0,1,1,1,3,3,3
    assert [(r["bucket"], r["n_segments"], r["bucket_bytes"]) for r in p0] == [
        (0, 2, 600), (1, 3, 1100), (3, 3, 150),
    ]
    # offset ranges are disjoint and ordered per partition
    spans = [(r["start_offset"], r["end_offset"]) for r in p0]
    assert spans == sorted(spans) and all(
        a[1] < b[0] for a, b in zip(spans, spans[1:])
    )
    p1 = [r for r in plan if r["partition"] == 1]
    assert [(r["bucket"], r["n_segments"]) for r in p1] == [(0, 1)]
