#!/usr/bin/env python
"""Oracle-ratio report: time the DuckDB twins of the bench headline at
$SPARK_GRAFT_SF_DIR and print per-query spark/oracle ratios against a bench
JSON (default: the most recent BENCH_r*.json, else a fresh `bench.py` line
piped in via --bench-json).

The ratio is floor-adjusted on the Spark side (bench's measured noop floor)
because sub-second Spark entries are dominated by fixed plan/codegen/schedule
cost that amortizes at scale — see SCALE.md's measured 1×→50× scaling smoke.

Usage:
    python oracle_bench.py                 # newest BENCH_r*.json
    python oracle_bench.py --bench-json bench_out.json
"""

from __future__ import annotations

import argparse
import glob
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench-json", help="bench.py output JSON (file path)")
    # SYMMETRIC with the Spark side (VERDICT r5 #4): bench.py runs min-of-5
    # INTERLEAVED passes, so the oracle runs the same protocol — 5 full
    # passes over all queries, min per query — instead of 3 back-to-back
    # repeats that let one noise episode blanket a query's whole sample
    ap.add_argument("--repeats", type=int, default=5)
    # harness hygiene, not an engine knob (VERDICT r8 #8): a handful of
    # DuckDB twins are 30-100× slower than everything else at sf1
    # (dup_membership rebuilds the whole LSH+verify chain, timestamp_asof's
    # ASOF JOIN degrades super-linearly), and five repeats of those alone
    # would dominate the oracle pass.  A query whose FIRST sample already
    # exceeds this many seconds keeps that one honest sample instead of
    # re-running on later passes — it is still timed and still verified,
    # just not re-sampled; the summary names every capped query (the
    # no-silent-caps rule).  min-of-1 vs min-of-5 noise only ever makes the
    # ORACLE look slower, i.e. the comparison errs against Spark.
    ap.add_argument("--slow-once-sec", type=float, default=15.0)
    args = ap.parse_args()

    if args.bench_json:
        bench_source = args.bench_json
        bench = json.load(open(args.bench_json))
    else:
        files = sorted(glob.glob("BENCH_r*.json"))
        if not files:
            print("no BENCH_r*.json found; pass --bench-json", file=sys.stderr)
            return 2
        bench_source = files[-1]
        # the default pairs fresh oracle times with the DRIVER's bench —
        # a DIFFERENT session, possibly a different box state.  Valid for
        # the per-round report; for a within-chain record run bench.py
        # first and pass its output via --bench-json (r14 lesson: two
        # artifacts were discarded for exactly this mispairing).
        print(
            f"WARNING: pairing against {bench_source} (cross-session); "
            "pass --bench-json <fresh bench output> for a within-chain record",
            file=sys.stderr,
        )
        bench = json.load(open(files[-1]))
    # driver BENCH_r*.json wraps the bench line under "parsed"; raw bench.py
    # output is the dict itself
    bench = bench.get("parsed", bench)
    timings: dict[str, float] = bench["queries"]
    floor = float(bench.get("noop_floor_sec", 0.0))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    con = duckdb.connect()
    for t in TABLES:
        # Spark-written tables are DIRECTORIES of part files (the sf1
        # amplifier's output); the driver's testdata are single files —
        # glob the directory form so both layouts register
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    sqls = catalog.oracle_sql()

    # SPARK_GRAFT_ORACLE_ALT (comma names): route these twins through
    # textops.run_alt_oracle — the pytest-pinned-identical scale
    # formulations selfcheck already uses at sf10 (SPARK_GRAFT_SELF_ALT).
    # Why a timing harness needs it too: DuckDB 1.x plans the inlined
    # reference text from sampled parquet stats, and on some (content-
    # identical, task-scheduling-dependent) part-file layouts the
    # pair-verify join order flips pathological — measured 94-135 s vs
    # 5.2 s for the materialized/sliced alt AT THE SAME sf1 inputs, same
    # 304,220 rows.  Timing the flipped plan would overstate Spark by 10×+
    # on that entry; the alt is DuckDB's reasonable formulation of the
    # same work (r11 de-pathologization precedent).  Routed names are
    # recorded in the summary JSON (no silent substitutions).
    alt_names = {
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_ORACLE_ALT", "").split(",")
        if s.strip()
    }
    # fail fast, not deep inside the timed repeat loop (ADVICE r12)
    from kafka_backup_spark.queries.textops import ALT_ORACLE_NAMES

    bad = sorted(alt_names - ALT_ORACLE_NAMES)
    if bad:
        print(
            f"SPARK_GRAFT_ORACLE_ALT names with no alt implementation: {bad} "
            f"(supported: {sorted(ALT_ORACLE_NAMES)})",
            file=sys.stderr,
        )
        return 2

    def run_oracle(name: str):
        if name in alt_names:
            from kafka_backup_spark.queries.textops import run_alt_oracle

            rel = run_alt_oracle(con, name)
            if hasattr(rel, "fetchall"):
                rel.fetchall()
            return
        con.sql(sqls[name]).fetchall()

    named = [(n, s) for n, s in timings.items() if sqls.get(n) is not None]
    # interleaved passes, mirroring bench.py's repeat protocol exactly
    samples: dict[str, list[float]] = {n: [] for n, _ in named}
    for _ in range(max(1, args.repeats)):
        for name, _s in named:
            if samples[name] and min(samples[name]) > args.slow_once_sec:
                continue  # slow twin: keep the single sample (see --slow-once-sec)
            t0 = time.perf_counter()
            run_oracle(name)
            samples[name].append(time.perf_counter() - t0)
    capped = sorted(
        n for n, ts in samples.items() if len(ts) < max(1, args.repeats)
    )
    if capped:
        print(
            f"slow-once cap ({args.slow_once_sec:g}s): single-sampled "
            + ", ".join(capped),
            file=sys.stderr,
        )

    rows = []
    tot_s = tot_o = tot_net = 0.0
    for name, spark_s in named:
        best = min(samples[name])
        net = max(spark_s - floor, 0.001)
        rows.append((name, round(best, 3), spark_s, round(net / max(best, 0.001), 2)))
        tot_s += spark_s
        tot_o += best
        tot_net += net
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':26s} {'oracle_s':>8s} {'spark_s':>8s} {'net_ratio':>9s}")
    for name, o, s, r in rows:
        print(f"{name:26s} {o:8.3f} {s:8.3f} {r:9.2f}")
    spark_spreads = bench.get("repeat_times", {})
    if not spark_spreads:
        # r7 bench.py moves spreads to a side file so the driver's tail
        # capture can parse the compact summary line (VERDICT r6 #1); r8
        # parks the file outside the checkout — share bench's resolver so
        # the fallback always reads the path bench actually wrote
        import bench as _bench

        try:
            spark_spreads = json.load(open(_bench.spreads_path())).get(
                "repeat_times", {}
            )
        except (OSError, ValueError):
            pass
    print(
        json.dumps(
            {
                "metric": "oracle_ratio",
                "bench_source": bench_source,
                "spark_total_sec": round(tot_s, 3),
                "oracle_total_sec": round(tot_o, 3),
                "ratio": round(tot_s / tot_o, 2) if tot_o else None,
                "net_ratio": round(tot_net / tot_o, 2) if tot_o else None,
                "oracle_repeats": args.repeats,
                # per-repeat spreads, both sides, so a published point
                # estimate can be judged against its measurement noise
                "oracle_repeat_times": {
                    n: [round(x, 3) for x in ts] for n, ts in samples.items()
                },
                "oracle_single_sampled": capped,
                "oracle_alt": sorted(alt_names),
                "spark_repeat_times": spark_spreads,
                "sf_dir": sf_dir,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
