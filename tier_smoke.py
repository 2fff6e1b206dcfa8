#!/usr/bin/env python
"""Tier-scaling smoke: amplify the documents corpus 1×/5×/20× and measure
warm per-query throughput for the text-pipeline family on the CURRENT
architecture (hot pins + plan cache + shared gram/LSH index).

Replicas get a perturbed suffix so they are near-dups, not exact dups (the
near-dup path must do real candidate work, not collapse on identical
hashes).  Caches are released before each tier, so "cold" prices the full
index/pin build and "warm" prices the steady-state query.

The 20× tier additionally runs with the hot-table pin gate forced OFF
(common._HOT_TABLE_MAX_BYTES = 1) to demonstrate the streamed path — what a
100-TB corpus would take — scales the same way.

Usage: python tier_smoke.py [--factors 1,5,20] [--out /tmp/tier_smoke]
Prints one JSON line per (tier, mode, query).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

QUERIES = ["dedup_exact", "simhash", "minhash_signatures", "lsh_candidates",
           "near_dup_pipeline", "text_analysis", "dup_span_fraction"]
# metadata/as-of family (VERDICT r5 #7): these read the EVENTS-derived
# record stream + offset mapping, so the events table is amplified too —
# per-partition mapping depth grows with the tier, which is exactly what
# the union-window as-of shape must absorb
ASOF_QUERIES = ["asof_offset_lookup", "timestamp_asof", "group_reset_plan"]


def amplify_events(spark, src_dir: str, factor: int, out_dir: str) -> int:
    """Replicate events with shifted event_id (offset) and ts: same topics
    and partitions, ×factor offsets/mapping-pairs per partition and an
    extended time range — the axis the as-of lookups scale along."""
    from pyspark.sql.types import LongType

    ev = spark.read.parquet(f"{src_dir}/events.parquet")
    n = ev.count()
    maxid = ev.agg(F.max("event_id")).collect()[0][0] + 1
    ts_is_long = isinstance(ev.schema["ts"].dataType, LongType)  # nanos-as-long
    reps = []
    for i in range(factor):
        shifted = (
            F.col("ts") + F.lit(i * 3_600_000_000_000)  # +i hours of nanos
            if ts_is_long
            else F.col("ts") + F.expr(f"make_interval(0, 0, 0, 0, {i}, 0, 0)")
        )
        reps.append(
            ev.select(
                (F.col("event_id") + maxid * i).alias("event_id"),
                "event_type",
                "user_id",
                "props",
                shifted.alias("ts"),
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    return n * factor


def amplify(spark, src_dir: str, factor: int, out_dir: str) -> int:
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    n = docs.count()
    reps = []
    for i in range(factor):
        text = (
            F.concat(F.col("text"), F.lit(f" tiervariant{i}")) if i else F.col("text")
        )
        reps.append(
            docs.select(
                (F.col("doc_id") + 10_000_000 * i).alias("doc_id"),
                text.alias("text"), "lang", "source",
            ).withColumn("n_chars", F.length("text").cast("long"))
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    return n * factor


def release_all(spark) -> None:
    from kafka_backup_spark import catalog
    from kafka_backup_spark.queries import common, textops

    textops.release_gram_cache(spark)   # grams + ANN + tagged persists
    common.release_meta_cache(spark)    # meta frames + hot pins
    catalog.release_plan_cache(spark)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,5,20")
    ap.add_argument("--out", default="/tmp/tier_smoke")
    ap.add_argument("--src", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from kafka_backup_spark import catalog
    from kafka_backup_spark.queries import common
    from kafka_backup_spark.session import get_spark

    spark = get_spark("tier-smoke")
    spark.read.parquet(f"{args.src}/documents.parquet").count()
    qs = catalog.queries()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for factor in [int(f) for f in args.factors.split(",")]:
        tier_dir = f"{args.out}/t{factor}"
        shutil.rmtree(tier_dir, ignore_errors=True)
        os.makedirs(tier_dir, exist_ok=True)
        ndocs = amplify(spark, args.src, factor, tier_dir)
        nevents = amplify_events(spark, args.src, factor, tier_dir)
        modes = [("pinned", None)] + ([("streamed", 1)] if factor == max(
            int(f) for f in args.factors.split(",")) else [])
        for mode, gate in modes:
            saved = common._HOT_TABLE_MAX_BYTES
            if gate is not None:
                common._HOT_TABLE_MAX_BYTES = gate
            try:
                release_all(spark)
                for name in QUERIES + ASOF_QUERIES:
                    rows = nevents if name in ASOF_QUERIES else ndocs
                    cold = run(name, tier_dir)
                    warm = min(run(name, tier_dir) for _ in range(3))
                    print(json.dumps({
                        "tier": factor, "docs": rows, "mode": mode,
                        "query": name, "cold_s": round(cold, 3),
                        "warm_s": round(warm, 3),
                        "warm_docs_per_s": round(rows / warm),
                    }))
            finally:
                common._HOT_TABLE_MAX_BYTES = saved
        release_all(spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
