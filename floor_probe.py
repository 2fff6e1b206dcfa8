#!/usr/bin/env python
"""sf0.1 fixed-cost floor decomposition (VERDICT r10 #2, Path A).

The worst sf0.1 oracle ratios (q22 19x, q13 12.5x, q16 11.7x, leakage 11.4x,
dedup 9.8x) all burn 0.1-0.4 s of Spark wall on ~10-35 ms of DuckDB work.
This probe decomposes that wall into candidate fixed costs, per query:

  full        the bench-shape run (warm plan cache, noop write, min-of-N)
  aqe_off     spark.sql.adaptive.enabled=false        (AQE re-plan rounds)
  shuf4       spark.sql.shuffle.partitions=4          (reduce-task count)
  shuf1       spark.sql.shuffle.partitions=1          (single reducer)
  scan        count() of each input table the query reads (scan+schedule)
  floor       spark.range(1) noop write               (submit+commit floor)

All variants run interleaved min-of-N in ONE session (runtime-settable confs
only), so the numbers are comparable within this file.  Output: one JSON
line per query, then a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_backup_spark import catalog
from kafka_backup_spark.session import get_spark

QUERIES = ["tpch_q22_dormant_balance", "tpch_q13_order_dist",
           "tpch_q16_supplier_cnt", "leakage_safe_split", "dedup_exact"]
VARIANTS = ["full", "aqe_off", "shuf4", "shuf1"]


def run_one(spark, fn, sf_dir):
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
    spark = get_spark("floor_probe")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    qs = catalog.queries()

    def set_variant(v):
        if v == "aqe_off":
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        elif v == "shuf4":
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.shuffle.partitions", "4")
        elif v == "shuf1":
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.shuffle.partitions", "1")
        else:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.shuffle.partitions", "32")

    samples: dict[tuple, list] = {(q, v): [] for q in QUERIES for v in VARIANTS}
    floors: list[float] = []
    # warm pass (plan construction + codegen), unrecorded
    for q in QUERIES:
        run_one(spark, qs[q], sf_dir)
    for _ in range(repeats):
        for v in VARIANTS:
            set_variant(v)
            # changed shuffle conf invalidates cached physical plans only at
            # execution; catalog plan cache holds ANALYZED plans, still valid
            for q in QUERIES:
                samples[(q, v)].append(run_one(spark, qs[q], sf_dir))
        set_variant("full")
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        floors.append(time.perf_counter() - t0)

    out = {"sf_dir": sf_dir, "repeats": repeats,
           "floor_s": round(min(floors), 4), "queries": {}}
    for q in QUERIES:
        out["queries"][q] = {
            v: round(min(samples[(q, v)]), 4) for v in VARIANTS
        }
        out["queries"][q]["spread_full"] = [
            round(x, 3) for x in samples[(q, "full")]
        ]
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
