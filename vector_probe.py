#!/usr/bin/env python
"""q18/q16 vectorization probe at sf10 (VERDICT r10 #7).

The pinned floors: 92% of q18's sf10 wall is the 60M-row -> 15M-group
lineitem rollup; q16's residue is the countDistinct over ~7.5M join
survivors.  Both are aggregate constant factor, not plan shape.  The one
lever left is WHERE the aggregate runs: Tungsten hash agg (JVM) vs an
Arrow-side per-partition partial aggregate (pyarrow group_by / pandas
drop_duplicates) feeding a much smaller JVM final agg.

Variants (all produce bit-identical results — partial sums are exact
BIGINT, dedup is idempotent):
  q18_full        the shipped catalog query
  q18_rollup_jvm  just the groupBy(l_orderkey).sum(qc) fragment
  q18_rollup_arrow mapInArrow: whole-partition pyarrow group_by partial
                   sums -> JVM final groupBy sum
  q16_full        the shipped catalog query
  q16_arrow       same joins, then mapInArrow whole-partition distinct on
                   (brand,type,size,suppkey) -> JVM countDistinct

Interleaved min-of-N, one session, noop writes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from kafka_backup_spark import catalog
from kafka_backup_spark.queries.pipeline import _dim_broadcastable, _view
from kafka_backup_spark.session import get_spark


def q18_rollup_jvm(spark, sf_dir):
    _view(spark, sf_dir, "lineitem")
    qc = (F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    return (
        spark.table("lineitem")
        .select("l_orderkey", qc.alias("qc"))
        .groupBy("l_orderkey")
        .agg(F.sum("qc").alias("qty_c"))
        .filter(F.col("qty_c") > 25000)
    )


def q18_rollup_arrow(spark, sf_dir):
    _view(spark, sf_dir, "lineitem")
    qc = (F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    narrow = spark.table("lineitem").select("l_orderkey", qc.alias("qc"))

    def partial(batches):
        import pyarrow as pa

        t = pa.Table.from_batches(list(batches))
        g = t.group_by("l_orderkey").aggregate([("qc", "sum")])
        yield from g.rename_columns(["l_orderkey", "qc"]).to_batches()

    part = narrow.mapInArrow(partial, "l_orderkey long, qc long")
    return (
        part.groupBy("l_orderkey")
        .agg(F.sum("qc").alias("qty_c"))
        .filter(F.col("qty_c") > 25000)
    )


def q16_arrow(spark, sf_dir):
    _view(spark, sf_dir, "part", "lineitem", "supplier")
    pf = (
        spark.table("part")
        .where(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    if _dim_broadcastable(sf_dir, "part", 8_000_000):
        pf = F.broadcast(pf)
    bad = spark.table("supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    if _dim_broadcastable(sf_dir, "supplier", 4_000_000):
        bad = F.broadcast(bad)
    joined = (
        spark.table("lineitem")
        .select("l_partkey", "l_suppkey")
        .join(pf, F.col("p_partkey") == F.col("l_partkey"))
        .join(bad, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .select("p_brand", "p_type", "p_size", "l_suppkey")
    )

    def dedup(batches):
        import pyarrow as pa

        t = pa.Table.from_batches(list(batches))
        cols = ["p_brand", "p_type", "p_size", "l_suppkey"]
        g = t.group_by(cols).aggregate([])
        yield from g.select(cols).to_batches()

    deduped = joined.mapInArrow(
        dedup, "p_brand string, p_type string, p_size int, l_suppkey long"
    )
    return deduped.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
    spark = get_spark("vector_probe")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    qs = catalog.queries()
    variants = {
        "q18_full": lambda: qs["tpch_q18_large_orders"](spark, sf_dir),
        "q18_rollup_jvm": lambda: q18_rollup_jvm(spark, sf_dir),
        "q18_rollup_arrow": lambda: q18_rollup_arrow(spark, sf_dir),
        "q16_full": lambda: qs["tpch_q16_supplier_cnt"](spark, sf_dir),
        "q16_arrow": lambda: q16_arrow(spark, sf_dir),
    }
    # parity check first (cheap aggregates of the variants must agree)
    a = q18_rollup_jvm(spark, sf_dir).agg(
        F.count("*"), F.sum("qty_c")
    ).collect()[0]
    b = q18_rollup_arrow(spark, sf_dir).agg(
        F.count("*"), F.sum("qty_c")
    ).collect()[0]
    assert tuple(a) == tuple(b), f"q18 rollup parity: {tuple(a)} != {tuple(b)}"
    c = sorted(map(tuple, qs["tpch_q16_supplier_cnt"](spark, sf_dir).collect()))
    d = sorted(map(tuple, q16_arrow(spark, sf_dir).collect()))
    assert c == d, "q16 parity mismatch"
    print("parity OK", flush=True)

    samples = {v: [] for v in variants}
    for v, fn in variants.items():  # warm
        fn().write.format("noop").mode("overwrite").save()
    for i in range(repeats):
        for v, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples[v].append(time.perf_counter() - t0)
        print(f"pass {i+1} done", flush=True)
    out = {v: {"min": round(min(ts), 3), "spread": [round(x, 3) for x in ts]}
           for v, ts in samples.items()}
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
