"""CorpusStore: versioned snapshots with cross-version incremental dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_backup_spark.corpus_store import CorpusStore


def _docs(spark, sf_dir, pred):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").filter(pred)


def test_versions_dedup_across_and_within(spark, sf_dir, tmp_path):
    store = CorpusStore(str(tmp_path / "corpus"))
    d = F.col("doc_id")

    # v0: docs 0..199, with doc 0's text duplicated under a fake id (within-
    # batch dup — exactly one copy may survive)
    base = _docs(spark, sf_dir, d < 200)
    clone = base.filter(d == 0).withColumn("doc_id", F.lit(999_999))
    e0 = store.write_version(base.unionByName(clone))
    assert e0["version"] == 0 and e0["parent"] is None
    assert e0["n_input"] == 201 and e0["n_new"] == 200  # within-batch dedup

    # v1: half overlap (100..299) → only 200..299 are new
    e1 = store.write_version(_docs(spark, sf_dir, (d >= 100) & (d < 300)))
    assert e1["version"] == 1 and e1["parent"] == 0
    assert e1["n_new"] == 100

    # v2: full overlap → nothing new
    e2 = store.write_version(_docs(spark, sf_dir, d < 300))
    assert e2["n_new"] == 0

    corpus = store.read_corpus(spark)
    assert corpus.count() == 300
    # the corpus text set equals the source's first 300 docs exactly
    assert corpus.select("h").distinct().count() == 300
    # as-of reads prune to the version chain
    assert store.read_corpus(spark, up_to=0).count() == 200
    assert store.read_version(spark, 1).count() == 100
    assert [v["version"] for v in store.versions()] == [0, 1, 2]


def test_first_version_may_be_empty(spark, sf_dir, tmp_path):
    """An empty first batch must still commit version 0 with n_new=0 (no
    partition dir is written, so the count falls back to 0) instead of
    raising inside the writer lock — and the next real write is v1."""
    store = CorpusStore(str(tmp_path / "corpus"))
    e0 = store.write_version(_docs(spark, sf_dir, F.lit(False)))
    assert (e0["version"], e0["n_input"], e0["n_new"]) == (0, 0, 0)
    e1 = store.write_version(_docs(spark, sf_dir, F.col("doc_id") < 10))
    assert (e1["version"], e1["n_new"]) == (1, 10)
    assert store.read_corpus(spark).count() == 10


def test_version_write_plan_has_no_constant_key_shuffle(spark, sf_dir, tmp_path):
    """The version column is constant per write: a repartition("version")
    before the sink would hash every row to ONE shuffle partition and
    serialize the whole version write through a single task — the r4-advice
    scale bug.  Pin the plan: the written frame must contain no exchange
    hash-partitioned on `version`.  (AQE may still coalesce the dedup
    shuffle at toy scale — that one is data-sized, which is exactly right.)"""
    import contextlib
    import io

    store = CorpusStore(str(tmp_path / "corpus"))
    docs = _docs(spark, sf_dir, F.col("doc_id") < 400)
    # reproduce the write-path frame construction up to the sink
    hashed = docs.withColumn(
        "h", F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary"))
    )
    fresh = (
        hashed.withColumn("_all", F.struct(*[c for c in hashed.columns if c != "h"]))
        .groupBy("h")
        .agg(F.min("_all").alias("_all"))
        .select("h", "_all.*")
        .withColumn("version", F.lit(0))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fresh.explain("formatted")
    plan = buf.getvalue()
    assert "hashpartitioning(version" not in plan, plan
    # and the real write still round-trips
    store.write_version(docs)
    assert store.read_version(spark, 0).count() == 400


def test_prior_scan_prunes_to_hash_column(spark, sf_dir, tmp_path):
    """The anti-join's prior side must read ONLY the hash column — at scale
    the text payload of every earlier version must never load."""
    store = CorpusStore(str(tmp_path / "corpus"))
    store.write_version(_docs(spark, sf_dir, F.col("doc_id") < 100))
    seen = store.read_corpus(spark).select("h").distinct()
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        seen.explain("formatted")
    read_schema = [l for l in buf.getvalue().splitlines() if "ReadSchema" in l][0]
    assert "h" in read_schema and "text" not in read_schema


def test_stream_into_corpus_dedups_per_batch(spark, sf_dir, tmp_path):
    """File-source stream → one deduped version per micro-batch; replaying
    identical content adds a version with n_new=0 (exactly-once corpus from
    at-least-once delivery)."""
    from kafka_backup_spark.corpus_store import CorpusStore, stream_into_corpus

    src = str(tmp_path / "incoming")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    docs.write.parquet(src)
    store = CorpusStore(str(tmp_path / "corpus"))
    schema = spark.read.parquet(src).schema

    q = stream_into_corpus(
        spark.readStream.schema(schema).parquet(src),
        store,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert store.read_corpus(spark).count() == 40
    # second stream over the SAME content (fresh checkpoint = full replay):
    # every doc already known → versions advance, corpus does not grow
    q2 = stream_into_corpus(
        spark.readStream.schema(schema).parquet(src),
        store,
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert store.read_corpus(spark).count() == 40
    assert store.versions()[-1]["n_new"] == 0


def test_null_text_is_content_equal_to_empty(spark, sf_dir, tmp_path):
    """NULL text hashes like empty text: no unpredictable collapse within a
    batch, and no forever-readmitted null doc across versions."""
    from pyspark.sql import functions as F

    store = CorpusStore(str(tmp_path / "corpus"))
    base = _docs(spark, sf_dir, F.col("doc_id") < 10)
    nulled = base.filter(F.col("doc_id") < 2).withColumn(
        "text", F.lit(None).cast("string")
    ).withColumn("doc_id", F.col("doc_id") + 500)
    e0 = store.write_version(base.unionByName(nulled))
    # 10 real texts + ONE representative of the null/empty content class
    assert e0["n_new"] == 11
    # replaying nulls in a later version admits nothing new
    e1 = store.write_version(nulled)
    assert e1["n_new"] == 0


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_near_dedup_drops_cross_version_near_copies(spark, tmp_path):
    """near_dedup=True: a later batch's lightly-perturbed copy of a stored
    doc band-matches the persistent signature index and is dropped; genuinely
    new text survives.  Exact-dup filtering still applies first."""
    store = CorpusStore(str(tmp_path / "c"))
    base = "the quick brown fox jumps over the lazy dog again and again today"
    e1 = store.write_version(
        _mk(spark, [(0, "en", base), (1, "en", "completely different text about spark and kafka pipelines at scale")]),
        near_dedup=True,
    )
    assert e1["n_new"] == 2
    import os

    assert any(e.startswith("version=") for e in os.listdir(store.signatures_path()))
    # batch 2: near-copy (tail-perturbed), exact copy, and a new doc
    e2 = store.write_version(
        _mk(
            spark,
            [
                (10, "en", base + " zz"),  # near-dup: shares almost all shingles
                (11, "en", base),  # exact dup — removed by the hash anti-join
                (12, "en", "an entirely unrelated report on manifest validation and offset recovery"),
            ],
        ),
        near_dedup=True,
    )
    assert e2["n_new"] == 1
    survivors = {r["doc_id"] for r in store.read_version(spark, 1).collect()}
    assert survivors == {12}
    # the new survivor's signatures joined the index (probed by version 3)
    e3 = store.write_version(
        _mk(spark, [(20, "en", "an entirely unrelated report on manifest validation and offset recovery plus")]),
        near_dedup=True,
    )
    assert e3["n_new"] == 0  # near-dup of the version-1 survivor


def test_near_dedup_off_keeps_near_copies(spark, tmp_path):
    store = CorpusStore(str(tmp_path / "c"))
    base = "the quick brown fox jumps over the lazy dog again and again today"
    store.write_version(_mk(spark, [(0, "en", base)]))
    e2 = store.write_version(_mk(spark, [(1, "en", base + " zz")]))
    assert e2["n_new"] == 1  # exact-only mode admits near-copies


def test_near_dedup_replay_is_idempotent(spark, tmp_path):
    """Crash-replay: rewriting the same version under dynamic overwrite
    regenerates identical data AND signature partitions (no duplicates)."""
    store = CorpusStore(str(tmp_path / "c"))
    base = "the quick brown fox jumps over the lazy dog again and again today"
    store.write_version(_mk(spark, [(0, "en", base)]), near_dedup=True)
    # simulate replay of version 1: same batch written twice via the
    # manifest-less path (drop the manifest entry, rewrite)
    batch = _mk(spark, [(1, "en", "fresh content that belongs to version one only right here")])
    store.write_version(batch, near_dedup=True)
    sigs_v1 = store._read_signatures(spark).filter(F.col("version") == 1)
    n_sigs = sigs_v1.count()
    # manifest rollback + rewrite (the crash-replay shape)
    entries = store.versions()
    import json

    with open(store._manifest_path(), "w") as fh:
        json.dump(entries[:-1], fh)
    store.write_version(batch, near_dedup=True)
    assert store._read_signatures(spark).filter(F.col("version") == 1).count() == n_sigs
    assert store.read_version(spark, 1).count() == 1


def test_near_dedup_backfills_exact_only_versions(spark, tmp_path):
    """A near-dedup ingest must see near-copies of versions written WITHOUT
    the flag: missing signature partitions backfill from the stored docs."""
    store = CorpusStore(str(tmp_path / "c"))
    base = "the quick brown fox jumps over the lazy dog again and again today"
    store.write_version(_mk(spark, [(0, "en", base)]))  # exact-only ingest
    e = store.write_version(_mk(spark, [(1, "en", base + " zz")]), near_dedup=True)
    assert e["n_new"] == 0  # near-copy of the exact-only version is dropped
    sigs = store._read_signatures(spark)
    assert sigs.filter(F.col("version") == 0).count() > 0  # backfilled


def test_excise_spans_cuts_corpus_seen_spans(spark, tmp_path):
    """excise_spans=True (incremental Lee et al.): a later batch's document
    that embeds a span the corpus already stores lands with that span CUT,
    while its genuinely new text survives verbatim; the span index
    partitions exist for both the backfilled v0 and the new version."""
    import os

    store = CorpusStore(str(tmp_path / "c"))
    header = (
        "this standard license header paragraph is repeated verbatim across "
        "every file of the project and carries no information at all"
    )
    store.write_version(
        _mk(spark, [(0, "en", header + " original body about offsets and manifests")])
    )  # exact-only ingest — no index yet; the next ingest must backfill it
    e = store.write_version(
        _mk(
            spark,
            [
                (
                    10,
                    "en",
                    header
                    + " a brand new continuation describing restore validation checks",
                )
            ],
        ),
        excise_spans=True,
    )
    assert e["n_new"] == 1
    stored = store.read_version(spark, 1).collect()[0]["text"]
    assert "standard license header paragraph" not in stored  # excised
    assert "restore validation checks" in stored  # new tail survives
    have = {
        d for d in os.listdir(store.span_index_path()) if d.startswith("version=")
    }
    assert have == {"version=0", "version=1"}
    assert store.span_index_covers()


def test_excise_spans_replay_is_idempotent(spark, tmp_path):
    """Crash-replay of an excising ingest: the index read is committed-
    versions-only, so a replayed batch re-excises identically (never
    against its own orphan partition), re-dedups to no new rows, and the
    index partition regenerates without duplicates."""
    import json

    store = CorpusStore(str(tmp_path / "c"))
    header = (
        "this standard license header paragraph is repeated verbatim across "
        "every file of the project and carries no information at all"
    )
    store.write_version(
        _mk(spark, [(0, "en", header + " original body about offsets and manifests")]),
        excise_spans=True,
    )
    batch = _mk(
        spark,
        [(10, "en", header + " fresh second-version content on watermark checks")],
    )
    store.write_version(batch, excise_spans=True)
    text1 = store.read_version(spark, 1).collect()[0]["text"]
    n_idx = (
        store._read_span_index(spark).filter(F.col("version") == 1).count()
    )
    entries = store.versions()
    with open(store._manifest_path(), "w") as fh:
        json.dump(entries[:-1], fh)  # crash between index write and commit
    store.write_version(batch, excise_spans=True)
    assert store.read_version(spark, 1).collect()[0]["text"] == text1
    assert (
        store._read_span_index(spark).filter(F.col("version") == 1).count() == n_idx
    )
    assert store.read_version(spark, 1).count() == 1


def test_dup_span_stats_from_index_match_scan(spark, tmp_path):
    """The index-served extents report equals the full-scan operator row
    for row on a multi-version store (ensure_span_index retrofits the
    version ingested without the flag)."""
    from kafka_backup_spark.queries.pipeline import dup_span_extents_frame

    store = CorpusStore(str(tmp_path / "c"))
    shared = (
        "an often repeated boilerplate notice sentence that shows up in many "
        "documents of this synthetic corpus for testing purposes"
    )
    store.write_version(
        _mk(
            spark,
            [
                (0, "en", shared + " first unique documentary tail right here"),
                (1, "en", "wholly distinct text on segment rotation and compaction plans"),
            ],
        ),
        excise_spans=True,
    )
    # second version ingested WITHOUT the flag — the shared span persists
    # in the corpus and its index partition is missing until the retrofit
    store.write_version(
        _mk(spark, [(10, "en", shared + " second unique closing words over there")])
    )
    assert not store.span_index_covers()
    store.ensure_span_index(spark)
    assert store.span_index_covers()
    via_index = sorted(
        (r["doc_id"], r["n_spans"], r["dup_chars"], r["spans"], r["clean_hash"])
        for r in store.dup_span_extents_from_index(spark).collect()
    )
    via_scan = sorted(
        (r["doc_id"], r["n_spans"], r["dup_chars"], r["spans"], r["clean_hash"])
        for r in dup_span_extents_frame(
            store.read_corpus(spark).select("doc_id", "text")
        ).collect()
    )
    assert via_index == via_scan
    assert any(n > 0 for _, n, _, _, _ in via_index)  # the signal is real


def test_index_stats_ignore_same_doc_across_versions(spark, tmp_path):
    """A doc_id re-ingested with UPDATED text (new content hash, shared
    >=SPAN_LEN span with its earlier edition) holds span-index rows in two
    version partitions; the index-served stats must count it as ONE owner —
    row-counting would report nd=2 and wrongly excise self-overlap
    (ADVICE r8 #1).  The full-scan operator (grouped on (h, doc_id)) is the
    semantic reference; parity must hold on exactly this shape."""
    from kafka_backup_spark.queries.pipeline import dup_span_extents_frame

    store = CorpusStore(str(tmp_path / "c"))
    shared = (
        "an often repeated boilerplate notice sentence that shows up in many "
        "documents of this synthetic corpus for testing purposes"
    )
    store.write_version(
        _mk(spark, [(5, "en", shared + " first edition documentary tail here")])
    )
    # same doc_id, updated text: survives exact dedup (different hash) but
    # shares the long boilerplate span with its own earlier edition
    store.write_version(
        _mk(spark, [(5, "en", shared + " revised edition with new closing words")])
    )
    store.ensure_span_index(spark)
    assert store.span_index_covers()
    via_index = sorted(
        (r["doc_id"], r["n_spans"], r["dup_chars"], r["spans"], r["clean_hash"])
        for r in store.dup_span_extents_from_index(spark).collect()
    )
    via_scan = sorted(
        (r["doc_id"], r["n_spans"], r["dup_chars"], r["spans"], r["clean_hash"])
        for r in dup_span_extents_frame(
            store.read_corpus(spark).select("doc_id", "text")
        ).collect()
    )
    assert via_index == via_scan
    # the shared span is SELF-overlap only — no cross-doc duplication exists
    assert all(n == 0 for _, n, _, _, _ in via_index)


def test_excise_ingest_releases_batch_cache(spark, tmp_path):
    """_excise_against_index persists each incoming batch for its multiple
    consumers; write_version must RELEASE the handle once the manifest
    commits, or a long-running stream leaks one cached frame per micro-batch
    (ADVICE r8 #2)."""
    store = CorpusStore(str(tmp_path / "c"))
    store.write_version(
        _mk(spark, [(0, "en", "a sufficiently long first document about segment rotation plans")]),
        excise_spans=True,
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    for k in range(1, 4):
        store.write_version(
            _mk(spark, [(k, "en", f"batch {k} carries wholly new text on compaction manifests and offsets")]),
            excise_spans=True,
        )
    after = jsc.getPersistentRDDs().size()
    assert after <= before, f"excise ingest leaked cached frames: {before} -> {after}"


def test_stream_ingest_soak_bounded_cache_and_excision(spark, tmp_path):
    """Streaming soak (VERDICT r9 #6): 12 foreachBatch micro-batches of
    stream_into_corpus(excise_spans=True) through the SAME harness the
    tier_smoke --soak flag ships.  Asserts the structural invariants the
    long-run claim rests on — the per-batch cache stays bounded while the
    stream runs, nothing stays cached after it ends, every post-0 version
    is span-trimmed (excision did real work each batch), and versions
    advance one per micro-batch."""
    import tier_smoke

    s = tier_smoke.ingest_soak(spark, str(tmp_path), batches=12, per_batch=60)
    assert s["batches"] == 12
    assert s["max_cached_rdds"] <= 4, s
    assert s["residual_cached_rdds"] == 0, s
    assert s["excision_held"], s


# ── prior-set snapshots (r11): O(1)-dir ingest priors ─────────────────────


def test_prior_hash_snapshot_matches_full_scan_across_rebuilds(
    spark, sf_dir, tmp_path
):
    """The rolling snapshot must return EXACTLY read_corpus().h.distinct()
    at every version count — before the first rebuild, while serving
    snapshot+tail, and across a rebuild boundary (> SNAP_REFRESH_EVERY
    tail dirs)."""
    store = CorpusStore(str(tmp_path / "c"))
    d = F.col("doc_id")
    lo = 0
    for step in range(store.SNAP_REFRESH_EVERY + 3):
        store.write_version(_docs(spark, sf_dir, (d >= lo) & (d < lo + 30)))
        lo += 30
        got = sorted(r.h for r in store._prior_hashes(spark).collect())
        want = sorted(
            r.h for r in store.read_corpus(spark).select("h").distinct().collect()
        )
        assert got == want, f"snapshot diverged at version {step}"
    # snapshot dir exists, is unique, and _SUCCESS-marked
    snaps = [
        e
        for e in __import__("os").listdir(store._snap_root("h"))
        if e.startswith("upto=")
    ]
    assert len(snaps) == 1


def test_torn_snapshot_is_ignored_and_rebuilt(spark, sf_dir, tmp_path):
    import os
    import shutil

    store = CorpusStore(str(tmp_path / "c"))
    d = F.col("doc_id")
    store.write_version(_docs(spark, sf_dir, d < 50))
    store._prior_hashes(spark)  # builds upto=0
    root = store._snap_root("h")
    snap = os.path.join(root, "upto=0")
    os.remove(os.path.join(snap, "_SUCCESS"))  # simulate torn write
    assert store._snap_latest("h") is None
    got = store._prior_hashes(spark)  # rebuilds
    assert got.count() == 50
    assert store._snap_latest("h") == 0
    shutil.rmtree(root)  # missing snapshots rebuild too
    assert store._prior_hashes(spark).count() == 50


def test_excision_prior_snapshot_parity(spark, tmp_path):
    """_prior_span_hashes == _read_span_index().sh.distinct() with the
    committed-only filter preserved, across enough excising ingests to
    cross a snapshot rebuild."""
    store = CorpusStore(str(tmp_path / "c"))
    base = "the quick brown fox jumps over the lazy dog " * 8
    for i in range(store.SNAP_REFRESH_EVERY + 2):
        rows = [(i * 10 + j, "en", f"batch{i}doc{j}head " + base) for j in range(3)]
        store.write_version(
            _mk(spark, rows), excise_spans=True
        )
        got = sorted(r.sh for r in store._prior_span_hashes(spark).collect())
        want = sorted(
            r.sh
            for r in store._read_span_index(spark)
            .select("sh")
            .distinct()
            .collect()
        )
        assert got == want, f"span prior diverged at ingest {i}"


def test_stray_snapshot_entries_are_skipped(spark, sf_dir, tmp_path):
    """A non-numeric upto=* entry in prior_snap/<kind>/ must be skipped like
    any other torn/foreign snapshot state, not raise ValueError and break
    every subsequent ingest (ADVICE r11 #2)."""
    import os

    store = CorpusStore(str(tmp_path / "c"))
    d = F.col("doc_id")
    store.write_version(_docs(spark, sf_dir, d < 20))
    store._prior_hashes(spark)  # builds upto=0
    os.makedirs(os.path.join(store._snap_root("h"), "upto=garbage"))
    assert store._snap_latest("h") == 0
    e = store.write_version(_docs(spark, sf_dir, (d >= 20) & (d < 30)))
    assert e["n_new"] == 10


def test_replay_rewrite_does_not_bake_orphan_hashes(spark, tmp_path):
    """ADVICE r11 #1: a snapshot must never vouch for an UNCOMMITTED orphan
    dir.  Crash between data write and manifest append, then a snapshot
    rebuild with the orphan on disk, then a replay that rewrites the orphan
    with different content — a later doc matching the VANISHED orphan text
    must be accepted as new (the full-scan prior always did this)."""
    import json
    import shutil

    store = CorpusStore(str(tmp_path / "c"))
    store.write_version(_mk(spark, [(0, "en", "alpha text body")]))
    store.write_version(_mk(spark, [(1, "en", "ORPHAN ONLY TEXT")]))
    # simulate the crash: v1's partition dir exists, manifest never saw it
    entries = store.versions()
    with open(store._manifest_path(), "w") as fh:
        json.dump(entries[:1], fh)
    # force a snapshot rebuild while the orphan is on disk
    shutil.rmtree(store._snap_root("h"), ignore_errors=True)
    prior = store._prior_hashes(spark)
    assert prior.count() == 2  # orphan content still counts (live tail)
    assert store._snap_latest("h") == 0  # ...but the snapshot excludes it
    # replay claims version 1 with DIFFERENT content (rewrites the orphan)
    e1 = store.write_version(_mk(spark, [(2, "en", "replacement body")]))
    assert (e1["version"], e1["n_new"]) == (1, 1)
    # the vanished orphan text is genuinely new now — must NOT be dropped
    e2 = store.write_version(_mk(spark, [(3, "en", "ORPHAN ONLY TEXT")]))
    assert (e2["version"], e2["n_new"]) == (2, 1)


def test_snapshot_pointer_protocol_crash_window(spark, sf_dir, tmp_path):
    """Marker-pointer commit (r12): a snapshot dir WITHOUT a pointer update
    (crash between the parquet write and the LATEST PUT) must be invisible
    — the old pointer keeps serving the old snapshot; a torn pointer reads
    as no-snapshot and rebuilds."""
    import json
    import os

    store = CorpusStore(str(tmp_path / "c"))
    d = F.col("doc_id")
    store.write_version(_docs(spark, sf_dir, d < 20))
    store._prior_hashes(spark)  # commits upto=0
    root = store._snap_root("h")
    assert store._snap_latest("h") == 0
    # simulate the crash: a newer dir lands but the pointer never flips
    spark.range(1).selectExpr("cast(id as string) AS h").write.parquet(
        os.path.join(root, "upto=7")
    )
    assert store._snap_latest("h") == 0  # old pointer still authoritative
    # torn pointer → no snapshot → next read rebuilds and re-commits
    with open(os.path.join(root, "LATEST"), "w") as fh:
        fh.write("{not json")
    assert store._snap_latest("h") is None
    assert store._prior_hashes(spark).count() == 20
    assert json.loads(open(os.path.join(root, "LATEST")).read())["upto"] == 0


def test_snapshot_cache_on_remote_style_root(spark, sf_dir, tmp_path, monkeypatch):
    """The snapshot cache rides the fsio seam: with a snapshot_root forced
    through the REMOTE branch (Hadoop FS + pointer PUT, no os.rename /
    os.listdir), the prior set still equals the full scan across a rebuild
    boundary (VERDICT r11 #5)."""
    from kafka_backup_spark import fsio

    monkeypatch.setattr(
        fsio, "is_remote", lambda p: str(p).startswith("file://")
    )
    snap_root = f"file://{tmp_path}/snapcache"
    store = CorpusStore(str(tmp_path / "c"), snapshot_root=snap_root)
    d = F.col("doc_id")
    lo = 0
    for step in range(store.SNAP_REFRESH_EVERY + 2):
        store.write_version(_docs(spark, sf_dir, (d >= lo) & (d < lo + 25)))
        lo += 25
        got = sorted(r.h for r in store._prior_hashes(spark).collect())
        want = sorted(
            r.h for r in store.read_corpus(spark).select("h").distinct().collect()
        )
        assert got == want, f"remote-backed snapshot diverged at step {step}"
    # the pointer and dirs really live under the remote-style root
    assert fsio.exists(f"{snap_root}/h/LATEST")


def test_tiered_rebuild_merges_previous_snapshot(spark, sf_dir, tmp_path):
    """The cadence rebuild must be O(tail): new snapshot = old snapshot ∪
    committed tail, NOT a corpus rescan.  Proven by planting a sentinel row
    inside the old snapshot parquet — a rescan would drop it, the tiered
    merge carries it forward."""
    import os

    store = CorpusStore(str(tmp_path / "c"))
    d = F.col("doc_id")
    store.write_version(_docs(spark, sf_dir, d < 10))
    store._prior_hashes(spark)  # upto=0 committed
    snap0 = os.path.join(store._snap_root("h"), "upto=0")
    spark.createDataFrame([("sentinel-not-in-corpus",)], "h string").write.mode(
        "append"
    ).parquet(snap0)
    lo = 10
    for _ in range(store.SNAP_REFRESH_EVERY):  # cross the rebuild boundary
        store.write_version(_docs(spark, sf_dir, (d >= lo) & (d < lo + 10)))
        lo += 10
    prior = {r.h for r in store._prior_hashes(spark).collect()}
    n = store._snap_latest("h")
    assert n is not None and n > 0
    snap_rows = {
        r.h
        for r in spark.read.parquet(
            os.path.join(store._snap_root("h"), f"upto={n}")
        ).collect()
    }
    assert "sentinel-not-in-corpus" in snap_rows  # merged, not rescanned
    assert "sentinel-not-in-corpus" in prior
    # and apart from the sentinel, content still equals the full scan
    want = {
        r.h for r in store.read_corpus(spark).select("h").distinct().collect()
    }
    assert snap_rows - {"sentinel-not-in-corpus"} == want
