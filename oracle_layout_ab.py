#!/usr/bin/env python
"""Bound the oracle-layout asymmetry with a number (VERDICT r12 #6).

The sf10 chain serves Spark the bucketed (orderkey-SORTED, ~14% smaller)
fact copies while DuckDB reads the original unsorted parquet.  The
asymmetry is disclosed in every bench JSON; this probe measures what the
sorted files would refund DuckDB: the SAME oracle SQL, same session,
min-of-N interleaved, with lineitem/orders views pointed either at the
originals or at the layout's sorted copies (DuckDB sees zone-map-ordered
row groups; it has no bucketed-join machinery, so sort order + size are
the whole effect).

Usage: python oracle_layout_ab.py [--sf-dir /tmp/sf10]
                                  [--layout /tmp/kbs_bucketed_sf10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from kafka_backup_spark import catalog

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# the TPC-H members of the sf10 weak-set chain (the ones that touch
# lineitem/orders — the only views the layout re-points)
QUERIES = [
    "tpch_q1_pricing", "tpch_q3_priority", "tpch_q5_region_volume",
    "tpch_q6_forecast", "tpch_q7_nation_volume", "tpch_q9_profit",
    "tpch_q10_returns", "tpch_q13_order_dist", "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt", "tpch_q17_small_qty", "tpch_q18_large_orders",
    "tpch_q21_sole_returns", "tpch_q22_dormant_balance",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--layout", default="/tmp/kbs_bucketed_sf10")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    sqls = catalog.oracle_sql()
    cons = {}
    for mode, li, od in (
        ("orig", f"{args.sf_dir}/lineitem.parquet/*.parquet",
         f"{args.sf_dir}/orders.parquet/*.parquet"),
        ("sorted", f"{args.layout}/lineitem_b/*.parquet",
         f"{args.layout}/orders_b/*.parquet"),
    ):
        con = duckdb.connect()
        for t in TABLES:
            p = f"{args.sf_dir}/{t}.parquet"
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            if t == "lineitem":
                src = li
            elif t == "orders":
                src = od
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        cons[mode] = con

    # parity guard: identical result hashes across both sources
    for name in QUERIES:
        a = sorted(map(str, cons["orig"].sql(sqls[name]).fetchall()))
        b = sorted(map(str, cons["sorted"].sql(sqls[name]).fetchall()))
        if a != b:
            print(f"{name}: PARITY MISMATCH between sources", file=sys.stderr)
            return 1

    samples: dict[str, dict[str, list[float]]] = {
        n: {"orig": [], "sorted": []} for n in QUERIES
    }
    for _ in range(args.repeats):
        for name in QUERIES:
            for mode in ("orig", "sorted"):
                t0 = time.perf_counter()
                cons[mode].sql(sqls[name]).fetchall()
                samples[name][mode].append(time.perf_counter() - t0)
    tot = {"orig": 0.0, "sorted": 0.0}
    for name in QUERIES:
        o = min(samples[name]["orig"])
        s = min(samples[name]["sorted"])
        tot["orig"] += o
        tot["sorted"] += s
        print(json.dumps({
            "query": name, "orig_s": round(o, 3), "sorted_s": round(s, 3),
            "refund_pct": round((1 - s / o) * 100, 1),
        }), flush=True)
    print(json.dumps({
        "metric": "oracle_layout_asymmetry",
        "sf_dir": args.sf_dir,
        "orig_total_s": round(tot["orig"], 3),
        "sorted_total_s": round(tot["sorted"], 3),
        "refund_pct": round((1 - tot["sorted"] / tot["orig"]) * 100, 1),
        "repeats": args.repeats,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
