#!/usr/bin/env python
"""tpch_q22 stage decomposition (r15 fifth session, guide §1): is the
residual local gap (0.18–0.31 s Spark vs 0.02–0.03 s DuckDB at sf0.1;
2.00×/1.73× grazed at sf10 r15 chains) join work or stage launches?

Cumulative fragments of the shipped plan, noop sink, min-of-N
interleaved, bucketed layout served exactly as the bench serves it:

  F0  noop floor (1-row literal)
  F1  thresh: the avg-balance scalar subquery's input agg alone
  F2  urg: DISTINCT o_custkey over urgent orders alone
  F3  cust scan + bal filter vs a LITERAL threshold (no subquery)
  F4  full shipped q22 body

If F1+F2+F3 ≈ F4 and each fragment sits near the floor, the query is
stage-launch-bound and joins/aggs add nothing reducible — pin it with
leakage/q18 in the sub-second floor family.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from kafka_backup_spark.queries.pipeline import q_tpch_q22, _view, _cents_sql
from kafka_backup_spark.session import autosize_shuffle_partitions, get_spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "8"))
    spark = get_spark("q22_decompose")
    sc = spark.sparkContext
    autosize_shuffle_partitions(spark, sf_dir)

    _view(
        spark, sf_dir, "customer", "orders",
        bucketed=("orders@custkey", "customer@custkey"),
    )
    frags = {
        "F0_noop_floor": spark.range(1),
        "F1_thresh_agg": spark.sql(_cents_sql(
            """SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                      / count(*) AS avg_c
               FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0"""
        )),
        "F2_urg_distinct": spark.sql(
            "SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
        ),
        "F3_cust_filter_agg": spark.sql(_cents_sql(
            """SELECT c_mktsegment, count(*) AS numcust,
                      CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                      / 100 AS totacctbal
               FROM customer
               WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 500000
               GROUP BY c_mktsegment"""
        )),
        "F4_full_q22": q_tpch_q22(spark, sf_dir),
    }

    for name, df in frags.items():  # warm
        sc.setJobDescription(f"q22:warm:{name}")
        noop(df)
    times = {k: [] for k in frags}
    for rep in range(reps):
        for name, df in frags.items():
            sc.setJobDescription(f"q22:{name}#r{rep}")
            t0 = time.monotonic()
            noop(df)
            times[name].append(time.monotonic() - t0)
    sc.setJobDescription(None)
    print(json.dumps(
        {k: {"min": round(min(v), 3), "all": [round(x, 3) for x in v]} for k, v in times.items()},
        indent=2,
    ))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
