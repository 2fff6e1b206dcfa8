#!/usr/bin/env python
"""Driver-mimic correctness gate: run every queries() entry on Spark and its
oracle_sql() on DuckDB; compare row count, column names, and an
order-insensitive value hash. All rows must print OK.

Defaults to the driver's own gate scale (sf0.01); $SPARK_GRAFT_SELF_SF_DIR
points it at any other directory — e.g. the make_sf1.py output, catching
scale-dependent wrongness (overflow, tie-break instability under 10×
duplicates) the small-SF gate cannot see (VERDICT r8 #5).  Spark-written
tables (directories of part files) register via glob.

Usage: python selfcheck.py [query ...]   (default: all)
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SELF_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr of the double — bit-identical values stringify identically
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def table_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    only = set(sys.argv[1:])
    # Mimic the driver harness EXACTLY: a vanilla session with none of our
    # session.py config (no nanos conf, no UTC TZ, no PYTHONPATH export).
    # Round 1 failed precisely because selfcheck used get_spark() while the
    # driver did not — queries must be robust to a bare session.
    builder = (
        SparkSession.builder.master(
            os.environ.get("SPARK_GRAFT_SELF_MASTER", "local[8]")
        )
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SELF_SHUFFLE", "8"),
        )
        .appName("selfcheck")
    )
    if os.environ.get("SPARK_GRAFT_SELF_SF_DIR"):
        # scale override active: the driver-mimic default heap (1g) OOMs on
        # the 10× amplified data; a correctness run at scale deserves a
        # sized session — bare-session robustness stays proven by the
        # default sf0.01 gate
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_SELF_DRIVER_MEM", "24g"),
        )
        # A 103-query single session retains one SQL-UI execution graph per
        # query (big plans → MBs each) plus job/stage history — dead weight
        # that competes with task memory on the local-mode driver JVM.
        # Bound it for scale runs; the bare driver-mimic gate is untouched.
        builder = (
            builder.config("spark.ui.enabled", "false")
            .config("spark.sql.ui.retainedExecutions", "8")
            .config("spark.ui.retainedJobs", "100")
            .config("spark.ui.retainedStages", "100")
        )
    # extra session confs for scale runs, "k=v;k=v" (r15): some sandboxes
    # stall the local-mode driver event loop for minutes under full-core
    # Arrow load (observed: 147 s heartbeat gaps → executor suicide after
    # 60 failures, job cancelled mid-collect).  Correctness runs at scale
    # may need e.g. spark.executor.heartbeatInterval=60s and
    # spark.network.timeout=600s; a knob keeps the driver-mimic default
    # session untouched.
    for kv in os.environ.get("SPARK_GRAFT_SELF_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    con = duckdb.connect()
    # Bound the oracle's memory (r10): DuckDB defaults to 80% of RAM, and
    # with a 48g Spark driver JVM beside it the sf10 run was OOM-killed at
    # 77 GB python RSS.  A hard cap + temp dir makes it spill instead.
    try:
        con.sql(f"SET memory_limit='{os.environ.get('SPARK_GRAFT_SELF_DUCK_MEM', '32GB')}'")
        con.sql("SET temp_directory='/tmp/duckdb_selfcheck_spill'")
    except Exception:
        pass
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # Scale exemptions, recorded LOUDLY in the artifact: e.g. the brute-
    # force O(n²) exact-Jaccard baseline is definitionally infeasible at
    # sf10 (its 500k-doc pair join spills >70 GB; the LSH pipeline is the
    # scale path) — skipping must be an explicit, visible decision, never
    # a silent omission.
    skip = {
        s for s in os.environ.get("SPARK_GRAFT_SELF_SKIP", "").split(",") if s
    }
    # ALT oracles for scale runs (r11 label-prop + r12 pair-verify): the
    # closure twins' WITH RECURSIVE is quadratic in cluster size, and the
    # pair-verify stage's plain CTE text re-runs the gram explosion once
    # per reference site under DuckDB's inlining and materializes the
    # 1.6e9-row verify join for insertion-order preservation — both die at
    # sf10.  Named queries run textops.run_alt_oracle INSTEAD of their
    # oracle_sql text (MATERIALIZED CTEs + preserve_insertion_order=false
    # + label-prop closure) — marked in the output line; parity of
    # alt == reference == Spark is pinned by pytest at the gate scale.
    alt = {
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_SELF_ALT", "").split(",")
        if s.strip()
    }
    from kafka_backup_spark.queries.textops import ALT_ORACLE_NAMES

    bad_alt = sorted(alt - ALT_ORACLE_NAMES)
    if bad_alt:  # fail before the hours-long loop, not inside it
        raise SystemExit(
            f"SPARK_GRAFT_SELF_ALT names with no alt implementation: {bad_alt}"
        )
    # Scale-run session hygiene (r11): the first single-session sf10 run
    # heap-OOM'd a task at query ~98 of 103 — not any one query's fault
    # (all six "failures" pass solo in a fresh session; r10's stitched
    # partial runs never held a session long enough to see it) but ~97
    # queries of accumulated driver-JVM state: pinned shared caches (gram
    # arrays, ANN index, corpus persists), SQL-UI execution graphs, and
    # codegen/broadcast remnants squeezing unified memory until one 10M-row
    # build OOMs.  Every HYGIENE_EVERY attempted queries, release every
    # module-pinned frame (release_gram_cache also drops the plan cache —
    # results recompute, bit-identical) and clear the block-manager cache.
    # Only active on scale overrides; the sf0.01 driver-mimic stays bare.
    hygiene_every = int(os.environ.get("SPARK_GRAFT_SELF_HYGIENE", "12"))
    scale_run = bool(os.environ.get("SPARK_GRAFT_SELF_SF_DIR"))
    attempted = 0
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in skip:
            print(f"SKIP {name}: excluded via SPARK_GRAFT_SELF_SKIP (scale exemption)")
            continue
        if scale_run and attempted and attempted % hygiene_every == 0:
            from kafka_backup_spark.queries.textops import release_gram_cache

            release_gram_cache(spark)
            spark.catalog.clearCache()
        attempted += 1
        try:
            sdf = fn(spark, SF_DIR)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            if name in alt:
                from kafka_backup_spark.queries.textops import run_alt_oracle

                rel = run_alt_oracle(con, name)
            else:
                rel = con.sql(oracles[name])
            dcols = [c for c in rel.columns]
            dtypes = [str(t).upper() for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        # The driver fetches oracle results via pandas: HUGEINT/DECIMAL
        # become float64 there ("7.0" vs Spark's "7") while fetchall()
        # yields Python ints — so this script would print OK on a query the
        # driver hashes red (exactly the round-4 sequence_packing/
        # mixture_weights reds). Hard-fail those types up front.
        banned = [
            (c, t)
            for c, t in zip(dcols, dtypes)
            if any(k in t for k in ("HUGEINT", "DECIMAL"))
        ]
        if banned:
            print(
                f"FAIL {name}: oracle emits driver-unsafe types {banned}; "
                "wrap in CAST(... AS BIGINT/DOUBLE)"
            )
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sh = table_hash(srows, scols)
            dh = table_hash(drows, dcols)
            if sh != dh:
                problems.append(f"valuehash spark={sh} duck={dh}")
                # show a few differing lines for debugging
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = {"|".join(norm_cell(r[i]) for i in so) for r in srows}
                dset = {"|".join(norm_cell(r[i]) for i in do) for r in drows}
                for line in list(sset - dset)[:3]:
                    print(f"    spark-only: {line[:200]}")
                for line in list(dset - sset)[:3]:
                    print(f"    duck-only:  {line[:200]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            tag = " (alt-oracle)" if name in alt else ""
            print(f"OK   {name}: {len(srows)} rows{tag}")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
