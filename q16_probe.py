#!/usr/bin/env python
"""q16 distinct-pair pre-aggregate ON the partkey bucket family (VERDICT
r12 next-round #1).

r9 pinned `distinct (l_partkey, l_suppkey) before the joins` as a 7.68 s
negative — but that cost was the distinct's full fact SHUFFLE.  The r12
partkey layout removes it: HashPartitioning(l_partkey) from the bucketed
scan satisfies ClusteredDistribution(l_partkey, l_suppkey), so the
pre-distinct runs exchange-free on sorted buckets.  This probe measures
whether that converts r9's negative into a win.

Context the probe itself establishes (printed up front): the fixture's
(l_partkey, l_suppkey) pairs are ~98.5% unique (59.10M distinct of 60M
rows at sf10 — the generator draws l_suppkey independently, unlike real
TPC-H's 4-suppliers-per-part partsupp), so ANY distinct-pair shape can
shrink the countDistinct input by at most ~1.5%.

Variants (parity-checked against shipped before timing):
  v_scan     join-first (shipped shape) with lineitem served from the
             partkey-bucketed table — isolates the scan-layout effect
  v_pre      pre-distinct (l_partkey, l_suppkey) on the bucketed scan
             (exchange-free), then the broadcast joins + countDistinct
  v_post     bucketed scan -> broadcast part join -> distinct on
             (b,t,s,partkey,suppkey) (exchange-free: partkey in keys),
             then countDistinct over the deduped survivors

Usage: python q16_probe.py [--explain] [v_scan v_pre v_post]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kafka_backup_spark.queries import layout  # noqa: E402
from kafka_backup_spark.queries.pipeline import (  # noqa: E402
    _view,
    q_tpch_q16,
)
from kafka_backup_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
OUT = os.environ.get("BUCKETED_OUT", "/tmp/kbs_bucketed_sf10")
N = int(os.environ.get("PROBE_REPEATS", "6"))


def _part_filtered(spark):
    return F.broadcast(
        spark.table("part")
        .where(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )


def _bad_suppliers(spark):
    return F.broadcast(
        spark.table("supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    )


def v_scan(spark, sf_dir):
    _view(spark, sf_dir, "part", "supplier")
    return (
        spark.table("lineitem_partkey_b")
        .select("l_partkey", "l_suppkey")
        .join(_part_filtered(spark), F.col("p_partkey") == F.col("l_partkey"))
        .join(_bad_suppliers(spark), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def v_pre(spark, sf_dir):
    _view(spark, sf_dir, "part", "supplier")
    pairs = (
        spark.table("lineitem_partkey_b")
        .select("l_partkey", "l_suppkey")
        .distinct()  # exchange-free: bucket HashPartitioning(l_partkey)
    )
    return (
        pairs.join(_part_filtered(spark), F.col("p_partkey") == F.col("l_partkey"))
        .join(_bad_suppliers(spark), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def v_post(spark, sf_dir):
    _view(spark, sf_dir, "part", "supplier")
    return (
        spark.table("lineitem_partkey_b")
        .select("l_partkey", "l_suppkey")
        .join(_part_filtered(spark), F.col("p_partkey") == F.col("l_partkey"))
        .join(_bad_suppliers(spark), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .select("p_brand", "p_type", "p_size", "l_partkey", "l_suppkey")
        .distinct()  # exchange-free: l_partkey still in the keys
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


VARIANTS = {"v_scan": v_scan, "v_pre": v_pre, "v_post": v_post}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv
    names = args or list(VARIANTS)
    spark = get_spark("q16_probe", master="local[32]", shuffle_partitions=32)
    if layout.register_bucketed(spark, OUT) is None:
        t0 = time.monotonic()
        layout.materialize_bucketed(spark, SF_DIR, OUT)
        print(f"materialize: {time.monotonic() - t0:.1f} s")
    rows, pairs = (
        spark.table("lineitem_partkey_b")
        .agg(
            F.count("*"),
            F.countDistinct("l_partkey", "l_suppkey"),
        )
        .first()
    )
    print(f"lineitem rows {rows} distinct (partkey,suppkey) pairs {pairs} "
          f"({100 * pairs / rows:.1f}% unique)")

    def run(fn):
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    base = {tuple(r) for r in q_tpch_q16(spark, SF_DIR).collect()}
    for name in names:
        fn = VARIANTS[name]
        got = {tuple(r) for r in fn(spark, SF_DIR).collect()}
        if got != base:
            print(f"{name}: PARITY MISMATCH ({len(base ^ got)} rows differ)")
            continue
        if explain:
            fn(spark, SF_DIR).explain("formatted")
            continue
        ship_t, cand_t = [], []
        run(q_tpch_q16)
        run(fn)
        for _ in range(N):
            ship_t.append(run(q_tpch_q16))
            cand_t.append(run(fn))
        print(
            f"{name}: shipped min {min(ship_t):.3f} cand min {min(cand_t):.3f} "
            f"delta {(1 - min(cand_t) / min(ship_t)) * 100:+.1f}%  "
            f"ship {[round(t, 2) for t in ship_t]} cand {[round(t, 2) for t in cand_t]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
