#!/usr/bin/env python
"""q5 stage decomposition at sf10 (VERDICT r11 #4 / next-round #2): say
where the ~3.2 s GOES before touching the query again.

Fragments are CUMULATIVE prefixes of the shipped plan, each ended with a
noop write so the measured cost is the real executed pipeline up to that
point (same recipe that found the round() BigDecimal tax in r9 and the
orders-join cost in r10):

  F0  lineitem scan + cents projection only
  F1  F0 + supplier/nation/region broadcast probe (the ASIA filter)
  F2  orders scan + date filter only                 (build-side scan floor)
  F3  F2 + exchange on o_orderkey                    (the SHJ build input)
  F4  F1 ⋈ F3 via SHUFFLE_HASH(orders)               (adds li exchange + SHJ)
  F5  F4 ⋈ customer (BHJ) — the c_nationkey = s_nationkey constraint
  F6  full shipped q5 (adds the 5-row groupBy + dollar reconstruction)

Interpretation feeds the bucketed-layout decision (next-round #1): if
F4−max(F1,F3) dominates, the orderkey exchanges are the cost and bucketing
lineitem+orders by orderkey removes them; if F3−F2 is small and F4 large,
the SHJ build/probe itself is the floor and bucketing won't pay.

Protocol: one session, min-of-N interleaved fragments.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from kafka_backup_spark.queries.pipeline import (  # noqa: E402
    _cents_sql,
    _money_single,
    _money_sum,
    _view,
    q_tpch_q5,
)
from kafka_backup_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
N = int(os.environ.get("PROBE_REPEATS", "5"))

_LI = """
  SELECT l_orderkey, l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(round(l_discount * 100) AS BIGINT) AS dc
  FROM lineitem
"""

_SA = """
WITH asia AS (
  SELECT n_nationkey, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
), sa AS (
  SELECT s_suppkey, s_nationkey, n_name FROM supplier JOIN asia ON s_nationkey = n_nationkey
), li AS (%s)
""" % _LI


def fragments(spark, sf_dir):
    _view(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    rev = _money_sum("pc * (100 - dc)", "rev_hi", "rev_lo", "div", _money_single(spark, sf_dir))
    sql = lambda s: spark.sql(_cents_sql(s))  # noqa: E731
    return {
        "F0_li_scan": lambda: sql(f"SELECT l_orderkey, l_suppkey, pc, dc FROM ({_LI})"),
        "F1_li_x_sa": lambda: sql(
            _SA + "SELECT l_orderkey, s_nationkey, pc, dc FROM li JOIN sa ON l_suppkey = s_suppkey"
        ),
        "F2_orders_scan": lambda: sql("""
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"""),
        "F3_orders_exchange": lambda: sql("""
            SELECT /*+ REPARTITION(o_orderkey) */ o_orderkey, o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"""),
        "F4_join_orders": lambda: sql(
            _SA
            + """
            SELECT /*+ SHUFFLE_HASH(orders) */ l_orderkey, s_nationkey, o_custkey, pc, dc
            FROM li
            JOIN sa ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"""
        ),
        "F5_join_customer": lambda: sql(
            _SA
            + """
            SELECT /*+ SHUFFLE_HASH(orders) */ n_name, pc, dc
            FROM li
            JOIN sa ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"""
        ),
        "F6_full_q5": lambda: q_tpch_q5(spark, sf_dir),
    }


def main():
    spark = get_spark("q5_decompose", master="local[32]", shuffle_partitions=32)
    frags = fragments(spark, SF_DIR)

    def run(fn):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    times = {k: [] for k in frags}
    for k in frags:  # warm the scans once
        run(frags[k])
    for _ in range(N):
        for k, fn in frags.items():
            times[k].append(run(fn))
    for k, ts in times.items():
        print(f"{k:22s} min {min(ts):6.3f}  repeats {[round(t, 3) for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
