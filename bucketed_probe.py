#!/usr/bin/env python
"""Bucketed co-partitioned layout A/B at sf10 (VERDICT r11 next-round #1).

Builds the orderkey-bucketed lineitem/orders layout once (queries/layout.py),
then for each weak orderkey-family query runs shipped-vs-bucketed parity +
min-of-N interleaved timing in ONE session.  The bucketed variants are the
shipped SQL with the fact tables swapped to the bucketed catalog tables and
the now-redundant shuffle hints dropped — semantics identical, storage
layout does the work the hints/exchanges did.

Usage: python bucketed_probe.py [--explain] [q3 q5 q18 q21 ...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kafka_backup_spark.queries import layout  # noqa: E402
from kafka_backup_spark.queries.pipeline import (  # noqa: E402
    _cents_sql,
    _money_single,
    _money_sum,
    _view,
    q_tpch_q3,
    q_tpch_q5,
    q_tpch_q18,
    q_tpch_q21,
)
from kafka_backup_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
OUT = os.environ.get("BUCKETED_OUT", "/tmp/bucketed_sf10")
N = int(os.environ.get("PROBE_REPEATS", "6"))


def q3_bucketed(spark, sf_dir):
    _view(spark, sf_dir, "customer")
    rev = _money_sum("pc * (100 - dc)", "rev_hi", "rev_lo", "div", _money_single(spark, sf_dir))
    return spark.sql(_cents_sql(f"""
WITH li AS (
  SELECT l_orderkey, l_shipdate,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(round(l_discount * 100) AS BIGINT) AS dc
  FROM lineitem_b
), t AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         {rev}
  FROM customer, orders_b, li
  WHERE c_mktsegment = 'BUILDING'
    AND c_custkey = o_custkey
    AND l_orderkey = o_orderkey
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT l_orderkey,
       (CAST(rev_hi AS DOUBLE) * 1e6 + CAST(rev_lo AS DOUBLE)) / 1e4 AS revenue,
       unix_millis(cast(o_orderdate as timestamp)) AS o_orderdate_ms,
       o_orderpriority
FROM t
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""))


def q5_bucketed(spark, sf_dir):
    _view(spark, sf_dir, "customer", "supplier", "nation", "region")
    rev = _money_sum("pc * (100 - dc)", "rev_hi", "rev_lo", "div", _money_single(spark, sf_dir))
    return spark.sql(_cents_sql(f"""
WITH asia AS (
  SELECT n_nationkey, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
), sa AS (
  SELECT s_suppkey, s_nationkey, n_name FROM supplier JOIN asia ON s_nationkey = n_nationkey
), li AS (
  SELECT l_orderkey, l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(round(l_discount * 100) AS BIGINT) AS dc
  FROM lineitem_b
), t AS (
  SELECT n_name,
         {rev}
  FROM li
  JOIN sa ON l_suppkey = s_suppkey
  JOIN orders_b ON l_orderkey = o_orderkey
  JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY n_name
)
SELECT n_name,
       (CAST(rev_hi AS DOUBLE) * 1e6 + CAST(rev_lo AS DOUBLE)) / 1e4 AS revenue
FROM t
"""))


def q5_bucketed_shj(spark, sf_dir):
    """Co-located SHUFFLED hash join over the buckets: both sides already
    satisfy the hash distribution, so the hint swaps the SMJ merge for a
    per-bucket hash build WITHOUT re-introducing an exchange."""
    _view(spark, sf_dir, "customer", "supplier", "nation", "region")
    rev = _money_sum("pc * (100 - dc)", "rev_hi", "rev_lo", "div", _money_single(spark, sf_dir))
    return spark.sql(_cents_sql(f"""
WITH asia AS (
  SELECT n_nationkey, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
), sa AS (
  SELECT s_suppkey, s_nationkey, n_name FROM supplier JOIN asia ON s_nationkey = n_nationkey
), li AS (
  SELECT l_orderkey, l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(round(l_discount * 100) AS BIGINT) AS dc
  FROM lineitem_b
), t AS (
  SELECT /*+ SHUFFLE_HASH(orders_b) */ n_name,
         {rev}
  FROM li
  JOIN sa ON l_suppkey = s_suppkey
  JOIN orders_b ON l_orderkey = o_orderkey
  JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY n_name
)
SELECT n_name,
       (CAST(rev_hi AS DOUBLE) * 1e6 + CAST(rev_lo AS DOUBLE)) / 1e4 AS revenue
FROM t
"""))


def q21_bucketed_shj(spark, sf_dir):
    _view(spark, sf_dir, "supplier")
    return spark.sql(_cents_sql("""
WITH lf AS (
  SELECT /*+ SHUFFLE_HASH(orders_b) */ l_orderkey, l_suppkey, l_returnflag
  FROM lineitem_b JOIN orders_b ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
), per_os AS (
  SELECT l_orderkey, l_suppkey,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r_rows
  FROM lf GROUP BY l_orderkey, l_suppkey
), per AS (
  SELECT l_suppkey, r_rows,
         count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
         sum(CASE WHEN r_rows > 0 THEN 1 ELSE 0 END)
             OVER (PARTITION BY l_orderkey) AS n_supp_r
  FROM per_os
)
SELECT s_name, CAST(sum(r_rows) AS BIGINT) AS numwait
FROM per JOIN supplier ON s_suppkey = l_suppkey
WHERE r_rows > 0 AND n_supp >= 2 AND n_supp_r = 1
GROUP BY s_name
"""))


def q18_bucketed(spark, sf_dir):
    _view(spark, sf_dir, "customer")
    qc = (F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    big_k = (
        spark.table("lineitem_b")
        .select("l_orderkey", qc.alias("qc"))
        .groupBy("l_orderkey")
        .agg(F.sum("qc").alias("qty_c"))
        .filter(F.col("qty_c") > 25000)
        .orderBy(F.desc("qty_c"), "l_orderkey")
        .limit(100)
    )
    return (
        spark.table("orders_b")
        .join(F.broadcast(big_k), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(spark.table("customer"), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            (F.col("qty_c").cast("double") / 100).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(10)
    )


def q21_bucketed(spark, sf_dir):
    _view(spark, sf_dir, "supplier")
    return spark.sql(_cents_sql("""
WITH lf AS (
  SELECT l_orderkey, l_suppkey, l_returnflag
  FROM lineitem_b JOIN orders_b ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
), per_os AS (
  SELECT l_orderkey, l_suppkey,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r_rows
  FROM lf GROUP BY l_orderkey, l_suppkey
), per AS (
  SELECT l_suppkey, r_rows,
         count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
         sum(CASE WHEN r_rows > 0 THEN 1 ELSE 0 END)
             OVER (PARTITION BY l_orderkey) AS n_supp_r
  FROM per_os
)
SELECT s_name, CAST(sum(r_rows) AS BIGINT) AS numwait
FROM per JOIN supplier ON s_suppkey = l_suppkey
WHERE r_rows > 0 AND n_supp >= 2 AND n_supp_r = 1
GROUP BY s_name
"""))


PAIRS = {
    "q3": (q_tpch_q3, q3_bucketed),
    "q5": (q_tpch_q5, q5_bucketed),
    "q5h": (q_tpch_q5, q5_bucketed_shj),
    "q18": (q_tpch_q18, q18_bucketed),
    "q21": (q_tpch_q21, q21_bucketed),
    "q21h": (q_tpch_q21, q21_bucketed_shj),
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv
    names = args or list(PAIRS)
    spark = get_spark("bucketed_probe", master="local[32]", shuffle_partitions=32)
    if layout.register_bucketed(spark, OUT) is None:
        t0 = time.monotonic()
        layout.materialize_bucketed(spark, SF_DIR, OUT)
        print(f"materialize: {time.monotonic() - t0:.1f} s")

    def run(fn):
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    for name in names:
        ship_fn, cand_fn = PAIRS[name]
        a = {tuple(round(v, 4) if isinstance(v, float) else v for v in r)
             for r in ship_fn(spark, SF_DIR).collect()}
        b = {tuple(round(v, 4) if isinstance(v, float) else v for v in r)
             for r in cand_fn(spark, SF_DIR).collect()}
        if a != b:
            print(f"{name}: PARITY MISMATCH ({len(a ^ b)} rows differ)")
            continue
        if explain:
            cand_fn(spark, SF_DIR).explain("formatted")
            continue
        ship_t, cand_t = [], []
        run(lambda s, d: ship_fn(s, d))
        run(lambda s, d: cand_fn(s, d))
        for _ in range(N):
            ship_t.append(run(ship_fn))
            cand_t.append(run(cand_fn))
        print(
            f"{name}: shipped min {min(ship_t):.3f} bucketed min {min(cand_t):.3f} "
            f"delta {(1 - min(cand_t) / min(ship_t)) * 100:+.1f}%  "
            f"ship {[round(t, 2) for t in ship_t]} cand {[round(t, 2) for t in cand_t]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
