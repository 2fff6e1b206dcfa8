"""Physical-plan regression guards for the SCALE.md properties: pushdown
reaches parquet on the segment store, dimension joins broadcast, and hot
hashing paths contain no Python UDFs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_backup_spark import catalog
from kafka_backup_spark.schema import events_as_records, load_table
from kafka_backup_spark.sources.segments import SegmentStore


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _node_indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-*=<"))


def _live_exchange_count(plan: str) -> int:
    """Count Exchange nodes that RUN per query in `formatted` output —
    of ANY partitioning (a reintroduced per-query spread() is round-robin
    and must count) — excluding subtrees under InMemoryRelation, whose
    exchanges are one-time pin-build cost, not per-query cost."""
    import re

    started = False
    skip_below = None
    count = 0
    for line in plan.split("== Physical Plan ==", 1)[-1].splitlines():
        if not line.strip():
            if started:
                break  # end of the tree; numbered detail sections follow
            continue
        started = True
        ind = _node_indent(line)
        if skip_below is not None:
            if ind > skip_below:
                continue
            skip_below = None
        if "InMemoryRelation" in line:
            skip_below = ind
            continue
        if re.search(r"\bExchange \(", line):
            count += 1
    return count


def test_segment_store_pushes_pitr_predicates(spark, sf_dir, tmp_path):
    store = SegmentStore(str(tmp_path / "store"))
    store.write(events_as_records(load_table(spark, sf_dir, "events")))
    df = store.read(spark).filter(
        (F.col("timestamp") >= F.timestamp_millis(F.lit(1704500000000)))
        & (F.col("offset") >= 1000)
    ).select("topic", "partition", "offset")
    plan = _plan(df)
    # P4: the time window and offset range reach the parquet scan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "GreaterThanOrEqual(timestamp" in pushed
    assert "GreaterThanOrEqual(offset,1000)" in pushed
    # column pruning: value/key bytes are not read for a 3-column projection
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "value" not in read_schema and "headers" not in read_schema


def test_tpch_q5_uses_broadcast_joins_only(spark):
    df = catalog.queries()["tpch_q5_region_volume"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_streamed_scans_prune_lineitem_columns(spark, monkeypatch):
    """Blanket pruning audit for every TPC-H catalog entry on the STREAMED
    path (pin gate forced off, so the parquet scans are visible): each
    lineitem scan's ReadSchema must exclude the wide columns the query
    doesn't touch — a scan reading all 11 lineitem columns for a 4-column
    query would multiply 100-TB scan bytes by ~3×."""
    from kafka_backup_spark.queries import common, pipeline

    monkeypatch.setattr(common, "_HOT_TABLE_MAX_BYTES", 1)
    # fresh views: the memo may hold pinned-path views from other tests
    for k in [k for k in pipeline._VIEWS]:
        pipeline._VIEWS.pop(k, None)
    try:
        tpch = [n for n in catalog.ALL_QUERIES if n.startswith("tpch_")]
        assert len(tpch) >= 12
        qs = catalog.queries()
        catalog.release_plan_cache(spark)
        for name in tpch:
            plan = _plan(qs[name](spark, "/root/testdata/sf0.001"))
            li_scans = [
                l for l in plan.splitlines()
                if "ReadSchema" in l and "l_orderkey" in l or
                   ("ReadSchema" in l and "l_suppkey" in l)
            ]
            if not li_scans:  # query doesn't read lineitem (q13/q22)
                continue
            for line in li_scans:
                ncols = line.count(":")  # struct<a:long,b:double,...>
                assert ncols <= 8, (name, line)
                # the unused payload columns never survive to the scan
                if name in ("tpch_q1_pricing", "tpch_q6_forecast"):
                    assert "l_partkey" not in line, name
    finally:
        for k in [k for k in pipeline._VIEWS]:
            pipeline._VIEWS.pop(k, None)
        catalog.release_plan_cache(spark)


def test_hashing_paths_have_no_python_udfs(spark):
    qs = catalog.queries()
    for name in ("minhash_signatures", "lsh_candidates", "simhash", "dedup_exact",
                 "doc_fingerprint", "near_dup_jaccard"):
        plan = _optimized(qs[name](spark, "/root/testdata/sf0.001"))
        assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan, name


def test_simhash_is_single_exchange_hash_agg(spark):
    """The packed-lane simhash must stay one shuffle (groupBy doc_id straight
    off the exploded stream) and keep its 12-long agg buffer in HashAggregate
    — no intermediate (doc_id, word) exchange, no SortAggregate."""
    df = catalog.queries()["simhash"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "HashAggregate" in plan and "SortAggregate" not in plan


def test_manifest_agg_is_single_exchange(spark, sf_dir):
    from kafka_backup_spark import manifest as mani
    from kafka_backup_spark.queries.common import build_manifest_df

    # the uncached derivation: partial + final hash aggregate with exactly
    # one shuffle for the rollup on top of the one manifest-build shuffle
    df = mani.describe(build_manifest_df(spark, sf_dir))
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") <= 3  # build + expand + agg
    assert "HashAggregate" in plan
    # the catalog query itself must START from the shared cached manifest
    # (one persisted metadata frame feeds every describe/validate/reset
    # query — commands/validate.rs loads the manifest once per run)
    cached = _plan(catalog.queries()["describe_rollup"](spark, sf_dir))
    assert "InMemoryTableScan" in cached


def test_load_table_survives_vanilla_session(spark, sf_dir):
    """Regression for round-1 gate failure: the driver harness builds its own
    SparkSession without spark.sql.legacy.parquet.nanosAsLong, and testdata
    events.parquet carries TIMESTAMP(NANOS).  load_table must self-heal."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, sf_dir, "events")
        assert df.count() > 0
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_repartition_plans_scale(spark, sf_dir):
    """R1/R2 must be pure projections + one hash shuffle, with no Exchange
    SinglePartition (the old row_number() window funneled every row through
    one task).  The catalog murmur2 entry runs the Arrow-batched numpy
    kernel (the recommended hot-path impl) — Arrow-batched, never
    row-at-a-time Python; round-robin stays Python-free entirely."""
    from kafka_backup_spark.operators.repartition import assign_target_partitions
    from kafka_backup_spark.queries.common import records_df

    qs = catalog.queries()
    for name in ("murmur2_repartition", "round_robin_repartition"):
        df = qs[name](spark, sf_dir)
        plan = _plan(df)
        assert "BatchEvalPython" not in plan, name  # no per-row Python ever
        assert "Exchange SinglePartition" not in plan, name
        assert "Window" not in plan, name
    rr = _plan(qs["round_robin_repartition"](spark, sf_dir))
    assert "ArrowEvalPython" not in rr
    # the portability default (impl="jvm") stays a pure-expression fold:
    # zero Python nodes of any kind in the plan
    jvm = _plan(
        assign_target_partitions(records_df(spark, sf_dir), 5, impl="jvm")
    )
    assert "ArrowEvalPython" not in jvm and "BatchEvalPython" not in jvm


def test_dedup_exact_scans_cold_parquet_not_the_pin(spark, sf_dir):
    """VERDICT r5 #1: whole-text hash scans must NOT read through the
    deserialized hot-table pin — the vectorized parquet scan is faster for
    a single-pass wide read.  Both union branches scan parquet directly,
    with the projection pruned to (doc_id, text)."""
    plan = _plan(catalog.queries()["dedup_exact"](spark, sf_dir))
    assert "InMemoryRelation" not in plan and "InMemoryTableScan" not in plan
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scans and all(
        "doc_id" in s and "text" in s and "lang" not in s and "source" not in s
        for s in scans
    )


def test_asof_windows_use_running_frames_only(spark, sf_dir):
    """r6 as-of rewrite: no UnboundedFollowing window frames anywhere in the
    as-of family (Spark's frame processor for them re-evaluates the
    aggregate from each row to the partition end — O(rows²) per partition),
    and exactly ONE live exchange feeds each union-window (the probes'
    distinct() exchange was folded into the window stage)."""
    qs = catalog.queries()
    for name in ("asof_offset_lookup", "timestamp_asof", "group_reset_plan"):
        df = qs[name](spark, sf_dir)
        plan = _plan(df).lower()
        # (currentrow, unboundedfollowing) is the quadratic frame processor;
        # (unboundedpreceding, unboundedfollowing) — group_reset_plan's
        # whole-partition bool_and — evaluates once per partition and is fine
        assert "currentrow$(), unboundedfollowing$()" not in plan, name
    # timestamp_asof specifically: the pre-r6 shape paid a distinct()
    # exchange + a fallback-join exchange on top of the window's
    asof_plan = _plan(qs["timestamp_asof"](spark, sf_dir))
    assert _live_exchange_count(asof_plan) == 1


def test_contamination_check_broadcasts_benchmark_semi_join(spark, sf_dir):
    """Decontamination must be the near-linear shape: benchmark gram set
    broadcast, LeftSemi join, no cartesian/pair explosion."""
    plan = _plan(catalog.queries()["contamination_check"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_stratified_sample_is_map_side_filter(spark, sf_dir):
    """The sampling predicate must run before any exchange: the only shuffle
    is the final per-language count."""
    plan = _plan(catalog.queries()["stratified_sample"](spark, sf_dir))
    # one LIVE exchange of any kind (pin-build exchanges inside the
    # InMemoryRelation subtree are excluded; a reintroduced per-query
    # spread() would be round-robin and must still fail this)
    assert _live_exchange_count(plan) == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_dedup_keep_best_single_exchange_no_window(spark, sf_dir):
    """Representative selection must stay a min(struct) agg: one shuffle on
    the content hash, no window/sort over the duplicate groups."""
    plan = _plan(catalog.queries()["dedup_keep_best"](spark, sf_dir))
    # one LIVE exchange of any kind (see _live_exchange_count)
    assert _live_exchange_count(plan) == 1
    assert "HashAggregate" in plan and "SortAggregate" not in plan
    assert "Window" not in plan


def test_entry_runs_on_vanilla_session(spark):
    """The driver smoke-checks entry() on its own session; it must return a
    non-empty DataFrame with a stable schema."""
    import __spark_entry__ as em

    df = em.entry(spark)
    cols = list(df.columns)
    assert df.count() >= 0 and len(cols) > 0
    assert cols == list(em.entry(spark).columns)


def test_legacy_reader_splits_per_file(spark, tmp_path):
    """S5 legacy scan must not use multiLine whole-file mode: line-mode scans
    split per file and stream — assert the json relation reads with the
    declared schema (no inference job) and yields one partition per file."""
    from kafka_backup_spark.sources.segments import SegmentStore, write_legacy_segments

    recs = [
        {"topic": "t", "partition": p, "offset": o, "ts_ms": 1704067200000 + o,
         "key": b"k", "value": b"v", "headers": []}
        for p in (0, 1, 2) for o in range(3)
    ]
    root = str(tmp_path / "store")
    write_legacy_segments(root, recs)
    out = SegmentStore(root).read_legacy(spark)
    assert out.count() == 9
    assert out.rdd.getNumPartitions() >= 3  # one split per segment file


def test_tpch_q4_uses_semi_join(spark):
    """The correlated EXISTS must compile to a semi join, not a subquery
    re-execution per row."""
    plan = _plan(catalog.queries()["tpch_q4_exists"](spark, "/root/testdata/sf0.001"))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q19_disjunction_stays_equi_join(spark):
    """Q19's OR-of-ANDs selection must ride the l_partkey = p_partkey hash
    join as a post-join filter - never degrade to a cartesian/BNLJ."""
    plan = _plan(catalog.queries()["tpch_q19_disjunctive"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bucketed_segment_join_skips_exchange(spark, sf_dir, tmp_path):
    """write_bucketed pre-shuffles once: a (topic, partition)-keyed join of
    two bucketed tables runs with NO exchange on either side."""
    recs = events_as_records(load_table(spark, sf_dir, "events"))
    store = SegmentStore(str(tmp_path / "store"))
    spark.sql("DROP TABLE IF EXISTS bk_records")
    spark.sql("DROP TABLE IF EXISTS bk_watermarks")
    store.write_bucketed(recs, "bk_records", buckets=8)
    wm = recs.groupBy("topic", "partition").agg(
        F.max("offset").alias("hwm")
    )
    store.write_bucketed(
        wm.withColumnRenamed("hwm", "offset"), "bk_watermarks", buckets=8
    )
    a = spark.table("bk_records")
    b = spark.table("bk_watermarks").select(
        "topic", "partition", F.col("offset").alias("hwm")
    )
    # force the merge join (Catalyst would broadcast the small test fixture;
    # at scale both sides are big and SMJ is what bucketing de-shuffles).
    # NB: no offset==hwm filter here — Catalyst folds equality filters into
    # the join keys, which would widen them past the bucket columns and
    # disable the bucketed scan.
    joined = a.hint("merge").join(b, ["topic", "partition"])
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # both sides read co-located buckets
    assert joined.count() > 0


def test_timestamp_asof_has_no_join_expansion(spark):
    """J2 must stay the union-window shape: the old probes×pairs broadcast
    join-then-filter expanded O(probes × pairs-per-partition) rows before
    its min_by, a quadratic blowup at 100-TB mapping sizes (VERDICT r2)."""
    df = catalog.queries()["timestamp_asof"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    for node in ("BroadcastHashJoin", "SortMergeJoin", "BroadcastNestedLoopJoin",
                 "CartesianProduct", "ShuffledHashJoin"):
        assert node not in plan, f"J2 plan regressed to a join: {node}"
    # two LIVE shuffles only (probe-dedup agg + the union-window sort);
    # pin-build exchanges inside InMemoryRelation subtrees don't count, a
    # reintroduced per-query spread() (round-robin) does
    assert _live_exchange_count(plan) <= 2


def test_sequence_packing_window_parallelism(spark, sf_dir):
    """The packing running-sum must NOT be a per-lang window (5 langs ⇒ 5
    reducer tasks sorting the whole corpus at scale).  Assert the two-level
    shape: every Window node's partition spec includes the doc_id bucket
    alongside lang, and the bucket offsets join back via broadcast."""
    df = catalog.queries()["sequence_packing"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected window nodes in the packing plan"

    # only the PARTITION columns count — they are the args before the first
    # ordered (ASC/DESC) column, so a lang-only window with bkt merely in
    # its ORDER BY cannot sneak past.  The level-1 offsets window is
    # legitimately lang-partitioned (it runs over the tiny bucket-totals
    # frame), so the requirement is: at least one window — the level-2
    # running sum over the full corpus — partitions on the bucket.
    def part_cols(spec: str) -> list[str]:
        cols = []
        for arg in spec.split(","):
            if " ASC" in arg or " DESC" in arg:
                break
            cols.append(arg.strip())
        return cols

    assert any(
        any("bkt" in c for c in part_cols(s)) for s in specs
    ), f"no bucket-partitioned window in the packing plan: {specs}"
    assert "BroadcastHashJoin" in plan  # offsets frame joins back broadcast
    # and the big side is never range/single-partitioned for a global sort
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan


def test_tpch_q12_conditional_agg_single_hash_agg(spark):
    """The CASE-WHEN buckets must fold into ONE hash aggregate over the
    join, and the bucket counts must partition the total."""
    df = catalog.queries()["tpch_q12_priority_lines"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "HashAggregate" in plan and "SortAggregate" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert rows and all(
        r["returned_lines"] + r["kept_lines"] == r["total_lines"] for r in rows
    )


def test_shared_meta_cache_single_entry_and_release(spark, sf_dir):
    """Metadata frames (manifest/watermarks/checks) build once per
    (session, sf_dir, kind), store as ONE cached partition, equal the
    uncached derivation, and release empties the registry."""
    from kafka_backup_spark import manifest as mani
    from kafka_backup_spark.queries import common

    common.release_meta_cache()
    m1 = common.manifest_df(spark, sf_dir)
    m2 = common.manifest_df(spark, sf_dir)
    assert m1 is m2  # one shared frame, not one per call
    app = spark.sparkContext.applicationId
    # the records/table pins (hot_table, records_df) share this registry;
    # the manifest must still be a single entry
    keys = [k for k in common._META_CACHE if k[0] == app and k[2].startswith("manifest")]
    assert keys == [(app, sf_dir, "manifest:1000")]
    assert m1.rdd.getNumPartitions() == 1  # metadata = one partition
    fresh = mani.build_manifest(common.records_df(spark, sf_dir), 1000)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, fresh.collect()))
    common.release_meta_cache(spark)
    assert not [k for k in common._META_CACHE if k[0] == app]
    assert not m1.is_cached


def test_meta_cache_bounded_eviction(spark, sf_dir):
    """Registry cap: inserting past _META_CACHE_CAP evicts (and unpersists)
    the oldest entry instead of pinning storage forever."""
    from kafka_backup_spark.queries import common

    common.release_meta_cache()
    frames = {}
    for i in range(common._META_CACHE_CAP + 3):
        kind = f"__evict_test_{i}"
        frames[kind] = common._shared_meta(
            spark, sf_dir, kind, lambda i=i: spark.range(i + 1)
        )
    app = spark.sparkContext.applicationId
    live = [k for k in common._META_CACHE if k[0] == app]
    assert len(live) <= common._META_CACHE_CAP
    assert (app, sf_dir, "__evict_test_0") not in common._META_CACHE  # oldest out
    assert not frames["__evict_test_0"].is_cached  # and unpersisted
    assert frames[f"__evict_test_{common._META_CACHE_CAP + 2}"].is_cached
    common.release_meta_cache(spark)


def test_hot_table_size_gate_streams_large_tables(spark, sf_dir, monkeypatch):
    """hot_table pins small tables (spread InMemoryRelation) but must STREAM
    anything over the gate straight from parquet — pinning a 100-TB fact
    table would be wrong, and the scan's own splits provide parallelism at
    that size."""
    from kafka_backup_spark.queries import common

    common.release_meta_cache(spark)
    app = spark.sparkContext.applicationId

    pinned = common.hot_table(spark, sf_dir, "documents")
    assert (app, sf_dir, "table:documents") in common._META_CACHE
    assert "InMemoryRelation" in pinned._jdf.queryExecution().optimizedPlan().toString()

    common.release_meta_cache(spark)
    monkeypatch.setattr(common, "_HOT_TABLE_MAX_BYTES", 1)  # everything is big now
    streamed = common.hot_table(spark, sf_dir, "documents")
    assert (app, sf_dir, "table:documents") not in common._META_CACHE
    plan = streamed._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in plan and "Relation" in plan
    # records_df honors the same gate: over-gate events stream uncached
    r = common.records_df(spark, sf_dir)
    assert (app, sf_dir, "records") not in common._META_CACHE
    assert "InMemoryRelation" not in r._jdf.queryExecution().optimizedPlan().toString()
    common.release_meta_cache(spark)


def test_pin_partitions_scale_with_table_size(spark, sf_dir):
    """r6: pinned tables spread to a SIZE-PROPORTIONAL partition count
    (floor 8, cap defaultParallelism) — a 0.6 MB fixture spread over 32
    partitions made every consumer schedule 32 near-empty tasks whose
    launch overhead exceeded the query (simhash 0.48 s @32 → 0.20 s @8).
    The floor keeps CPU-heavy consumers parallel on tiny fixtures; at the
    cap and beyond, the size gate streams the table anyway."""
    from kafka_backup_spark.queries import common

    dp = spark.sparkContext.defaultParallelism
    floor = min(dp, 8)  # the floor itself is capped by session parallelism
    assert common.spread_parts(spark, 0) == floor
    assert common.spread_parts(spark, 600_000) == floor    # documents @ sf0.1
    per_part = common._SPREAD_BYTES_PER_PART
    want = -(-(11 << 20) // per_part)  # lineitem @ sf0.1, ceil division
    assert common.spread_parts(spark, 11 << 20) == min(dp, max(8, want))
    assert common.spread_parts(spark, 1 << 30) == dp       # capped
    common.release_meta_cache(spark)
    docs = common.hot_table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() == floor
    common.release_meta_cache(spark)


def test_plan_cache_serves_same_dataframe_and_releases(spark, sf_dir):
    """catalog.queries() is a prepared-statement cache: same (session,
    query, sf_dir) → the identical DataFrame object; release empties it."""
    q1 = catalog.queries()["text_metrics"]
    q2 = catalog.queries()["text_metrics"]
    a = q1(spark, sf_dir)
    b = q2(spark, sf_dir)  # fresh wrapper, same module-level cache
    assert a is b
    other = q1(spark, "/root/testdata/sf0.01")
    assert other is not a  # keyed by sf_dir
    catalog.release_plan_cache(spark)
    assert q1(spark, sf_dir) is not a
    catalog.release_plan_cache(spark)


def test_hot_table_size_gate_measures_directory_datasets(spark, tmp_path, monkeypatch):
    """Spark writes parquet datasets as DIRECTORIES; os.path.getsize on a
    directory returns the ~4 KB inode, which would silently disarm the pin
    gate for every Spark-written table.  The gate must size the dataset
    recursively and stream an over-gate directory dataset."""
    from kafka_backup_spark.queries import common

    out = str(tmp_path / "big.parquet")
    spark.range(2000).withColumn("pad", F.lit("x" * 64)).write.parquet(out)
    assert common._dataset_bytes(out) > 4096  # not the inode size
    monkeypatch.setattr(common, "_HOT_TABLE_MAX_BYTES", 4096)
    streamed = common.hot_table(spark, str(tmp_path), "big")
    app = spark.sparkContext.applicationId
    assert (app, str(tmp_path), "table:big") not in common._META_CACHE
    plan = streamed._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in plan


def test_release_plan_cache_drops_tpch_view_memo(spark, sf_dir):
    """A temp view holds its own analyzed plan (file listing included), so
    the release path must drop the TPC-H view memo together with the plan
    cache — otherwise post-release queries would resolve stale views."""
    from kafka_backup_spark.queries import pipeline

    catalog.queries()["tpch_q6_forecast"](spark, sf_dir)
    app = spark.sparkContext.applicationId
    assert any(k[0] == app for k in pipeline._VIEWS)
    catalog.release_plan_cache(spark)
    assert not [k for k in pipeline._VIEWS if k[0] == app]
    # and the query still works after release (views re-register)
    assert catalog.queries()["tpch_q6_forecast"](spark, sf_dir).count() >= 0


def test_compact_small_is_identity_beyond_the_gate(spark, sf_dir, monkeypatch):
    """The metadata-query coalesce must vanish when the fact table exceeds
    the pin gate — coalescing a real fact-table scan would cap its
    parallelism at 100 TB."""
    from kafka_backup_spark.queries import common

    df = spark.range(100).repartition(16)
    small = common.compact_small(df, sf_dir, parts=2)
    assert small.rdd.getNumPartitions() == 2  # under the gate: coalesced
    monkeypatch.setattr(common, "_HOT_TABLE_MAX_BYTES", 1)
    big = common.compact_small(df, sf_dir, parts=2)
    assert big is df  # beyond the gate: untouched


def test_tuning_knobs_read_session_conf(spark, sf_dir):
    """VERDICT r6 #6: _SPREAD_BYTES_PER_PART and COMPACT_PARTS were tuned on
    local[32]; a real cluster overrides them per session via spark.conf —
    the defaults must hold when the conf keys are unset or garbage."""
    from kafka_backup_spark.queries import common

    dp = spark.sparkContext.defaultParallelism
    base = common.spread_parts(spark, 11 << 20)
    try:
        # 1 MiB per part → 11 MiB wants 11 partitions
        spark.conf.set("spark.kafkaBackupSpark.spreadBytesPerPart", str(1 << 20))
        assert common.spread_parts(spark, 11 << 20) == min(dp, max(8, 11))
        # garbage / non-positive values fall back to the default
        spark.conf.set("spark.kafkaBackupSpark.spreadBytesPerPart", "banana")
        assert common.spread_parts(spark, 11 << 20) == base
        spark.conf.set("spark.kafkaBackupSpark.spreadBytesPerPart", "-5")
        assert common.spread_parts(spark, 11 << 20) == base

        spark.conf.set("spark.kafkaBackupSpark.compactParts", "3")
        df = spark.range(100).repartition(16)
        assert common.compact_small(df, sf_dir).rdd.getNumPartitions() == 3
        # explicit parts argument still wins over the conf
        assert common.compact_small(df, sf_dir, parts=2).rdd.getNumPartitions() == 2
    finally:
        spark.conf.unset("spark.kafkaBackupSpark.spreadBytesPerPart")
        spark.conf.unset("spark.kafkaBackupSpark.compactParts")
    assert common.spread_parts(spark, 11 << 20) == base


def test_all_catalog_plans_are_hygienic(spark):
    """Blanket guard over EVERY catalog query's optimized plan: no
    row-at-a-time Python (BatchEvalPython) anywhere, and no cartesian /
    cross joins outside the documented brute-force baselines.

    cosine_topk is the one allowed cartesian: it is the deliberate
    all-pairs recall baseline for ivf_topk (probes × corpus with a fixed
    tiny probe set), kept brute-force so the approximate path has an exact
    yardstick — SCALE.md documents it as non-scale-path.  ann_recall
    embeds that same baseline as its ground-truth side (a recall
    evaluation NEEDS the exact answer), so it inherits the allowance.

    Partitionless windows (Window.partitionBy() — every row funneled to a
    single partition) are flagged too (VERDICT r7 #4).  The allowed
    exceptions all run their window over a POST-AGGREGATION frame whose
    cardinality is the group-key domain, never fact rows: tpch_q15 (one row
    per supplier; the broadcast scalar-max alternative was A/B-measured ~2×
    slower at sf0.1 because the rev aggregation executes twice — negative
    result pinned in the q15 docstring) and the two mixture rollups (one
    row per source; the normalizing sum must see every source)."""
    allowed_cartesian = {"cosine_topk", "ann_recall"}
    allowed_partitionless_window = {
        "tpch_q15_top_supplier",
        "mixture_weights",
        "filtered_mixture",
    }
    sf = "/root/testdata/sf0.001"
    offenders = {}
    for name, fn in catalog.queries().items():
        plan = _optimized(fn(spark, sf))
        flags = []
        if "BatchEvalPython" in plan:
            flags.append("row-python")
        if ("Join Cross" in plan or "CartesianProduct" in plan) and name not in allowed_cartesian:
            flags.append("cartesian")
        if _partitionless_window_specs(plan) and name not in allowed_partitionless_window:
            flags.append("partitionless-window")
        if flags:
            offenders[name] = flags
    assert not offenders, offenders


def _partitionless_window_specs(plan: str) -> list[str]:
    """Window specs whose PARTITION column list is empty — the single-
    partition funnel the audit exists to catch.  A bare substring match on
    'windowspecdefinition(specifiedwindowframe' missed Window.orderBy(x)
    GLOBAL windows (order spec prints first, partition list still empty —
    the exact same straggler class; ADVICE r8 #5).  Order columns are
    recognized by their ASC/DESC direction tokens; everything before them
    is a partition column."""
    import re

    specs = re.findall(
        r"windowspecdefinition\(([^)]*?)(?:, specifiedwindowframe|\))", plan
    )
    bad = []
    for spec in specs:
        args = [a.strip() for a in spec.split(",") if a.strip()]
        part_cols = [a for a in args if " ASC" not in a and " DESC" not in a]
        if not part_cols:
            bad.append(spec)
    return bad


def test_partitionless_window_audit_catches_global_orderby(spark):
    """The audit helper must flag Window.orderBy(x) with no partitioning
    (global funnel) and must NOT flag a properly partitioned window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(10).withColumn("k", F.col("id") % 2)
    global_w = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert _partitionless_window_specs(_optimized(global_w))
    part_w = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert not _partitionless_window_specs(_optimized(part_w))


def test_money_modes_agree(spark):
    """The adaptive single-BIGINT money sum must produce BIT-IDENTICAL
    results to the overflow-safe hi/lo split wherever the footer-stat gate
    admits it (the constant-zero hi keeps the reconstruction expression
    unchanged, so equality here is exact doubles, not approximate).  Runs
    the money-bearing TPC-H shapes in both forced modes, including q9
    whose amounts go NEGATIVE."""
    from kafka_backup_spark.queries import pipeline

    sf = "/root/testdata/sf0.001"
    names = [
        "tpch_q1_pricing", "tpch_q5_region_volume", "tpch_q6_forecast",
        "tpch_q9_profit", "tpch_q14_promo", "tpch_q15_top_supplier",
    ]
    results = {}
    for mode in ("single", "hilo"):
        spark.conf.set("spark.kafkaBackupSpark.moneyMode", mode)
        catalog.release_plan_cache(spark)
        try:
            for n in names:
                fn = catalog.queries()[n]
                rows = sorted(map(tuple, fn(spark, sf).collect()))
                results.setdefault(n, {})[mode] = rows
        finally:
            spark.conf.unset("spark.kafkaBackupSpark.moneyMode")
    catalog.release_plan_cache(spark)
    for n in names:
        assert results[n]["single"] == results[n]["hilo"], n


def test_cents_cast_matches_round(spark):
    """The trunc-form cent cast `CAST(x*100 + sign(x)*0.5D AS BIGINT)`
    (_cents_sql, r9: Spark's round() boxes BigDecimal per row) must equal
    `CAST(round(x*100) AS BIGINT)` for every two-decimal value BOTH
    engines can see — the whole TPC-H grid including negatives (c_acctbal)
    and the classic decimal-representability traps (x.x25/x.x75 whose
    doubles sit just under or over the printed value).  Exhaustive over
    the ±100.00 two-decimal grid plus scaled spot values."""
    vals = [n / 100.0 for n in range(-10000, 10001)]
    vals += [2.675, -2.675, 0.285, -0.285, 123456.78, -98765.43, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    bad = df.selectExpr(
        "x",
        "CAST(round(x * 100) AS BIGINT) AS r",
        "CAST(x * 100 + sign(x) * 0.5D AS BIGINT) AS t",
    ).where("r <> t")
    assert bad.count() == 0, bad.limit(5).collect()


def test_cents_sql_rewrites_only_the_pattern():
    """_cents_sql touches exactly the cent-cast pattern and leaves every
    other round()/CAST alone — and the ORACLE strings keep round() so the
    driver hash-compare proves the equivalence on data, every round."""
    from kafka_backup_spark.queries.pipeline import (
        SQL_TPCH_Q1,
        _cents_sql,
    )

    src = "CAST(round(l_discount * 100) AS BIGINT), round(x, 4), CAST(a AS BIGINT)"
    out = _cents_sql(src)
    assert "CAST(l_discount * 100 + sign(l_discount) * 0.5D AS BIGINT)" in out
    assert "round(x, 4)" in out and "CAST(a AS BIGINT)" in out
    # oracle text stays on round()
    assert "CAST(round(" in SQL_TPCH_Q1 and "0.5D" not in SQL_TPCH_Q1


def test_dim_broadcastable_gate():
    """q16's footer-gated broadcast: admits a dim whose parquet footers
    prove a small row count, refuses past the threshold, and refuses when
    footers are unreadable (object stores) — the scale-safe default."""
    from kafka_backup_spark.queries.pipeline import _dim_broadcastable

    sf = "/root/testdata/sf0.001"
    assert _dim_broadcastable(sf, "part", 8_000_000) is True
    assert _dim_broadcastable(sf, "part", 1) is False
    assert _dim_broadcastable("/nonexistent", "part", 8_000_000) is False


def test_hilo_reconstruction_bound():
    """The provable parity window of the single-sum money gate (ADVICE r9
    #1/#3): the oracle's hi/lo double reconstruction `hi*1e6 + lo` equals
    `double(total)` for EVERY integer total below 2^59 (hi*15625 < 2^53 so
    hi*1e6 is exact, lo < 2^53 is exact, one rounded add is correctly
    rounded), while in [2^59, 2^62) — the window the old 2^62 gate wrongly
    admitted — 1-ulp divergences are real and common.  Pure-Python IEEE
    doubles, no Spark: this is exactly the arithmetic both engines emit."""

    def recon(total: int) -> float:
        hi, lo = divmod(total, 1_000_000)
        return float(hi) * 1e6 + float(lo)

    lo_step = (2**59 - 2**53) // 20011 or 1
    below = range(2**53 + 7, 2**59, lo_step)
    assert all(recon(t) == float(t) for t in below)
    hi_step = (2**62 - 2**59) // 20011 or 1
    above = range(2**59 + 7, 2**62, hi_step)
    bad = sum(1 for t in above if recon(t) != float(t))
    # ADVICE r9 measured ~20% divergence in this window; assert it is
    # clearly non-trivial so the test stays robust to stride choice.
    assert bad > 1000, bad


def test_money_gate_flips_at_2pow59(spark, monkeypatch):
    """The gate admits single mode strictly by rows*worst < 2^59 (with the
    lo-exactness side condition), derived from footer min/max of price,
    quantity, discount and tax — synthetic footers pin the flip point."""
    from kafka_backup_spark.queries import pipeline

    def fake_stats(path, *cols):
        if "lineitem" in path:
            return (
                fake_stats.rows,
                {
                    "l_extendedprice": 100.0,
                    "l_quantity": 1.0,
                    "l_discount": 1.0,
                    "l_tax": 0.08,
                },
                {"l_extendedprice": 1.0, "l_quantity": 1.0, "l_discount": 0.0, "l_tax": 0.0},
            )
        return (1, {"p_retailprice": 1.0}, {"p_retailprice": 1.0})

    monkeypatch.setattr(pipeline, "_parquet_footer_stats", fake_stats)
    # pc=1e4 cents, disc_amp=100, tax_amp=108 → worst = 1.08e8
    worst = 1e4 * 100 * 108
    flip = int(float(2**59) / worst)
    fake_stats.rows = flip - 1
    assert pipeline._money_single(spark, "/fake/below") is True
    fake_stats.rows = flip + 1
    assert pipeline._money_single(spark, "/fake/above") is False
    # the lo-exactness side condition arms independently: tiny worst but
    # row count past 2^53/1e6 must still refuse single mode
    fake_stats.rows = int(float(2**53) / 1e6) + 1

    def tiny_stats(path, *cols):
        if "lineitem" in path:
            return (
                fake_stats.rows,
                {"l_extendedprice": 0.0001, "l_quantity": 0.0001, "l_discount": 0.0,
                 "l_tax": 0.0},
                {"l_extendedprice": 0.0, "l_quantity": 0.0, "l_discount": 0.0,
                 "l_tax": 0.0},
            )
        return (1, {"p_retailprice": 0.0001}, {"p_retailprice": 0.0001})

    monkeypatch.setattr(pipeline, "_parquet_footer_stats", tiny_stats)
    assert pipeline._money_single(spark, "/fake/lo-bound") is False


def test_money_gate_reads_footers(spark):
    """The single-sum gate derives its overflow bound from parquet footer
    statistics: admits the small fixtures, refuses when stats are absent."""
    from kafka_backup_spark.queries.pipeline import (
        _money_single,
        _parquet_footer_stats,
    )

    st = _parquet_footer_stats(
        "/root/testdata/sf0.001/lineitem.parquet", "l_extendedprice", "l_quantity"
    )
    assert st is not None and st[0] > 0 and st[1]["l_extendedprice"] > 0
    assert _money_single(spark, "/root/testdata/sf0.001") is True
    assert _parquet_footer_stats("/nonexistent/lineitem.parquet", "x") is None
    assert _money_single(spark, "/nonexistent") is False


def test_money_gate_per_expression_kinds(spark, monkeypatch):
    """Per-expression money gating (VERDICT r13 #5): each aggregate shape
    carries its OWN footer-derived per-row bound — at a row count between
    the rev and charge thresholds, q1's revenue sums run single while its
    charge column stays hi/lo, and the mixed-mode result is bit-identical
    to forced hi/lo (each aggregate's reconstruction is independent)."""
    from kafka_backup_spark import catalog
    from kafka_backup_spark.queries import pipeline

    sf = "/root/testdata/sf0.001"
    bounds = pipeline._money_bounds(sf)
    assert bounds is not None
    b = bounds["bounds"]
    # ordering invariants on real footers: the triple product dominates
    # its own factors, and worst is the max of all kinds
    assert b["rev"] < b["charge"]
    assert b["disc"] <= b["rev"]  # TPC-H discounts ≤ 10% ⇒ |dc| ≤ |100−dc|
    assert b["worst"] == max(b.values())

    # craft a boundary dataset: rows chosen so rows*rev < 2^59 ≤ rows*charge
    rows = int(float(2**59) / b["charge"]) + 1
    crafted = dict(bounds, rows=rows)
    monkeypatch.setitem(pipeline._MONEY_BOUNDS, "/fake/boundary", crafted)
    assert pipeline._money_single(spark, "/fake/boundary", "rev") is True
    assert pipeline._money_single(spark, "/fake/boundary", "charge") is False
    assert pipeline._money_single(spark, "/fake/boundary", "worst") is False

    # the shipped mixed-mode q1 at the real fixture must match forced hilo
    # bit-for-bit (the driver oracle always runs hi/lo)
    fn = catalog.queries()["tpch_q1_pricing"]
    auto = sorted(map(tuple, fn(spark, sf).collect()))
    spark.conf.set("spark.kafkaBackupSpark.moneyMode", "hilo")
    catalog.release_plan_cache(spark)
    try:
        hilo = sorted(map(tuple, fn(spark, sf).collect()))
    finally:
        spark.conf.unset("spark.kafkaBackupSpark.moneyMode")
        catalog.release_plan_cache(spark)
    assert auto == hilo


def _live_node_count(plan: str, node: str) -> int:
    """Count ``node`` occurrences in the live `formatted` tree, excluding
    subtrees under InMemoryRelation (one-time index-build cost, not
    per-query cost) — same walk as _live_exchange_count."""
    started = False
    skip_below = None
    count = 0
    for line in plan.split("== Physical Plan ==", 1)[-1].splitlines():
        if not line.strip():
            if started:
                break
            continue
        started = True
        ind = _node_indent(line)
        if skip_below is not None:
            if ind > skip_below:
                continue
            skip_below = None
        if "InMemoryRelation" in line:
            skip_below = ind
            continue
        if node in line:
            count += 1
    return count


def test_embedding_near_dup_single_pair_cosine_eval(spark):
    """The pair-scoring work must cross the Python boundary exactly ONCE.

    History (r15): the original pandas-UDF scorer was planned TWICE — the
    threshold filter references the UDF column, and filter pushdown
    re-evaluates it below the filter (guide §4.4) — fixed first with an
    asNondeterministic pin, then structurally by fusing score+threshold
    into one mapInArrow stage (_score_pairs, guide §4.2).  The shipped
    shape goes further (guide §2.4/§8): pairs are GENERATED inside one
    per-cell groupBy().applyInArrow stage (_cell_pairs_fn) — the same-cell
    self-join, candidate distinct, and vector-attach joins are gone, and
    each vector crosses the boundary once per probe cell instead of once
    per candidate pair.  Pin: exactly one live Python-boundary node of any
    flavor (the index-build UDFs live under InMemoryRelation and are
    excluded, as in _live_exchange_count), and it is the per-cell
    FlatMapGroupsInArrow stage."""
    qs = catalog.queries()
    try:
        df = qs["embedding_near_dup"](spark, "/root/testdata/sf0.001")
        plan = _plan(df)
        live = sum(
            _live_node_count(plan, node)
            for node in (
                "ArrowEvalPython",
                "BatchEvalPython",
                "MapInArrow",
                "MapInPandas",
                "FlatMapGroupsInArrow",
            )
        )
        assert live == 1, plan
        assert _live_node_count(plan, "FlatMapGroupsInArrow") == 1, plan
    finally:
        catalog.release_plan_cache(spark)


def test_media_stats_single_python_boundary(spark):
    """audio_stats / image_stats must cross the Python boundary ONCE.

    History (r15, guide §4.1): the original bodies ran TWO back-to-back
    mapInPandas stages — synth shipped every payload Python→JVM only for
    the stats stage to ship it straight back.  The fused stage
    synthesizes and reduces each payload in place (multimodal
    audio_stat_row / image_stat_row — the operators' own code path), so
    only narrow id/param rows enter and narrow stats rows leave."""
    qs = catalog.queries()
    try:
        for name in ("audio_stats", "image_stats"):
            plan = _plan(qs[name](spark, "/root/testdata/sf0.001"))
            assert _live_node_count(plan, "MapInPandas") == 1, (name, plan)
    finally:
        catalog.release_plan_cache(spark)


def test_ivf_topk_single_python_boundary(spark):
    """ivf_topk's scorer is the same one-mapInArrow shape (_score_pairs):
    exactly one live MapInArrow for the candidate-scoring stage, nothing
    pandas-serialized there (r15, guide §4.2).  The ONE other live Python
    node is the probe-side ``_cells_udf`` ArrowEvalPython (5 probe vectors
    assigned to their nprobe cells at query time — constant-size, not a
    per-candidate cost); the corpus-side cell assignment lives under
    InMemoryRelation and is excluded."""
    qs = catalog.queries()
    try:
        df = qs["ivf_topk"](spark, "/root/testdata/sf0.001")
        plan = _plan(df)
        assert _live_node_count(plan, "MapInArrow") == 1, plan
        assert _live_node_count(plan, "ArrowEvalPython") == 1, plan
        assert _live_node_count(plan, "BatchEvalPython") == 0, plan
        assert _live_node_count(plan, "MapInPandas") == 0, plan
    finally:
        catalog.release_plan_cache(spark)
