#!/usr/bin/env python
"""Bounded A/B: q5's dimension-product broadcast vs the shipped SHJ(orders).

Hypothesis: the expensive piece of shipped q5 at sf10 is the orderkey
exchange — SHUFFLE_HASH(orders) still shuffles ~12M surviving lineitem
rows plus the 4.3M date-filtered orders.  Pre-joining orders (date
window) with ASIA customers yields a ~860k-row (o_orderkey, n_name)
product at sf10 — small enough to BROADCAST, which removes every
exchange on the 60M-row fact side (the only remaining shuffle is the
5-row groupBy).  q18's pinned broadcast negative was a 15M-row survivor
set; this is 17× smaller, so it deserves its own measurement.

Protocol: one session, parity check first, then min-of-N interleaved.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from kafka_backup_spark.queries.pipeline import q_tpch_q5, _view, _money_sum, _money_single, _cents_sql  # noqa: E402
from kafka_backup_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
N = int(os.environ.get("PROBE_REPEATS", "6"))


def q5_dim_broadcast(spark, sf_dir):
    _view(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    rev = _money_sum("pc * (100 - dc)", "rev_hi", "rev_lo", "div", _money_single(spark, sf_dir))
    return spark.sql(_cents_sql(f"""
WITH asia AS (
  SELECT n_nationkey, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
), sa AS (
  SELECT s_suppkey, s_nationkey FROM supplier JOIN asia ON s_nationkey = n_nationkey
), dim AS (
  SELECT o_orderkey, c_nationkey
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    AND c_nationkey IN (SELECT n_nationkey FROM asia)
), li AS (
  SELECT l_orderkey, l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(round(l_discount * 100) AS BIGINT) AS dc
  FROM lineitem
), t AS (
  SELECT /*+ BROADCAST(dim) */ s_nationkey,
         {rev}
  FROM li
  JOIN sa ON l_suppkey = s_suppkey
  JOIN dim ON l_orderkey = o_orderkey AND c_nationkey = s_nationkey
  GROUP BY s_nationkey
)
SELECT n_name,
       (CAST(rev_hi AS DOUBLE) * 1e6 + CAST(rev_lo AS DOUBLE)) / 1e4 AS revenue
FROM t JOIN asia ON s_nationkey = n_nationkey
"""))


def main():
    spark = get_spark("q5_probe", master="local[32]", shuffle_partitions=32)
    shipped = lambda: q_tpch_q5(spark, SF_DIR)  # noqa: E731
    cand = lambda: q5_dim_broadcast(spark, SF_DIR)  # noqa: E731

    a = {tuple(r) for r in shipped().collect()}
    b = {(r[0], round(r[1], 4)) for r in cand().collect()}
    a4 = {(r[0], round(r[1], 4)) for r in a}
    print("parity:", "OK" if a4 == b else f"MISMATCH {a4 ^ b}")
    if a4 != b:
        return 1

    def run(fn):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    ship_t, cand_t = [], []
    for i in range(N):
        ship_t.append(run(shipped))
        cand_t.append(run(cand))
    print("shipped SHJ(orders) repeats:", [round(t, 3) for t in ship_t], "min", round(min(ship_t), 3))
    print("dim-broadcast repeats:      ", [round(t, 3) for t in cand_t], "min", round(min(cand_t), 3))
    print("delta:", f"{(1 - min(cand_t) / min(ship_t)) * 100:+.1f}% (negative = candidate slower)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
