#!/usr/bin/env python
"""Generate an sf1-equivalent dataset by 10×-amplifying the driver's sf0.1
tables with referential key-shifting (VERDICT r7 #2: measure the claimed
floor-dominated oracle ratios at a scale factor where Spark's fixed
per-query cost does not dominate).

Amplification semantics:
- TPC-H facts/dims (customer, supplier, part, orders, lineitem): FACTOR
  replicas with every key shifted by replica × (max key + 1), so the join
  topology is FACTOR disjoint copies of the original graph — filter
  selectivities, join fan-outs and attribute distributions are preserved
  exactly (replicating rows WITHOUT key shifts would square the join
  fan-out instead of scaling it linearly).
- region/nation stay fixed (dimension tables, same as real TPC-H scaling).
- events: FACTOR× offsets per partition (event_id shift), +1 h timestamp
  stagger per replica — the axis the as-of/mapping operators scale along.
- documents: perturbed near-dup replicas (suffix variant) — the dedup
  family must do real candidate work, not collapse on exact hashes.
- embeddings: deterministically perturbed replicas (component nudge),
  keeping vectors distinct so ANN candidate generation works.

Usage: python make_sf1.py [--src /root/testdata/sf0.1] [--out /tmp/sf1]
                          [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def amplified(df, shifts: dict[str, int], factor: int, extra=None):
    """Union FACTOR replicas, shifting each column in ``shifts`` by
    replica × shift; ``extra(df, i)`` may further transform a replica."""
    reps = []
    for i in range(factor):
        r = df
        for col, step in shifts.items():
            r = r.withColumn(col, F.col(col) + F.lit(step * i))
        if extra is not None:
            r = extra(r, i)
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from kafka_backup_spark.session import get_spark

    spark = get_spark("make-sf1")
    src, out, k = args.src, args.out, args.factor
    os.makedirs(out, exist_ok=True)

    def load(t):
        return spark.read.parquet(f"{src}/{t}.parquet")

    def save(df, t, parts=8):
        df.repartition(parts).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(t, "rows:", spark.read.parquet(f"{out}/{t}.parquet").count())

    def step(df, col):
        return df.agg(F.max(col)).collect()[0][0] + 1

    # fixed dims
    for t in ("region", "nation"):
        save(load(t), t, parts=1)

    cust, supp, part, orders, li = (
        load("customer"), load("supplier"), load("part"), load("orders"), load("lineitem"),
    )
    c_step, s_step, p_step, o_step = (
        step(cust, "c_custkey"), step(supp, "s_suppkey"),
        step(part, "p_partkey"), step(orders, "o_orderkey"),
    )
    save(amplified(cust, {"c_custkey": c_step}, k), "customer")
    save(amplified(supp, {"s_suppkey": s_step}, k, ), "supplier", parts=2)
    save(amplified(part, {"p_partkey": p_step}, k), "part")
    save(amplified(orders, {"o_orderkey": o_step, "o_custkey": c_step}, k), "orders", parts=16)
    save(
        amplified(
            li,
            {"l_orderkey": o_step, "l_partkey": p_step, "l_suppkey": s_step},
            k,
        ),
        "lineitem",
        parts=32,
    )

    # events: keep EVERY column (tier_smoke's amplifier drops `value`, which
    # the full catalog needs); nanos-as-long ts gets a +1 h stagger/replica
    from pyspark.sql.types import LongType

    ev = load("events")
    e_step = step(ev, "event_id")
    ts_long = isinstance(ev.schema["ts"].dataType, LongType)

    def ev_extra(r, i):
        if i == 0:
            return r
        shifted = (
            F.col("ts") + F.lit(i * 3_600_000_000_000)
            if ts_long
            else F.col("ts") + F.expr(f"make_interval(0, 0, 0, 0, {i}, 0, 0)")
        )
        return r.withColumn("ts", shifted)

    save(amplified(ev, {"event_id": e_step}, k, ev_extra), "events", parts=16)

    docs = load("documents")

    # Id-space contract (r14, learned the hard way): the replica shift is a
    # FIXED 1e7, so amplifying an ALREADY-AMPLIFIED corpus makes replica i
    # of source-replica j collide with (i', j') whenever i+j = i'+j' —
    # 500k rows with only ~95k distinct doc_ids at ×10-of-×10.  Duplicate
    # doc_ids violate the corpus primary-key contract and silently diverge
    # the per-row Spark gram arrays from the per-doc_id SQL twins
    # (selfcheck caught it as near-dup FAILs at sf10).  Always amplify
    # from the ORIGINAL sf0.1 with a larger --factor instead.
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0]
    if max_doc >= 10_000_000:
        raise SystemExit(
            f"--src documents look already amplified (max doc_id {max_doc} "
            ">= the 1e7 replica shift): re-amplifying would collide doc_ids; "
            "amplify from the original sf0.1 with a larger --factor"
        )

    def doc_extra(r, i):
        if i == 0:
            return r
        return r.withColumn(
            "text", F.concat(F.col("text"), F.lit(f" sfvariant{i}"))
        ).withColumn("n_chars", F.length("text").cast(docs.schema["n_chars"].dataType))

    save(amplified(docs, {"doc_id": 10_000_000}, k, doc_extra), "documents")

    emb = load("embeddings")

    def emb_extra(r, i):
        if i == 0:
            return r
        # deterministic small nudge on the first component keeps replicas
        # distinct but near their source (near-dup candidates stay real)
        return r.withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, j) -> CASE WHEN j = 0 "
                f"THEN CAST(x + {i} * 1e-4 AS FLOAT) ELSE x END)"
            ),
        )

    # shift by max+1 (=count for contiguous ids), NOT an arbitrary constant:
    # the ANN family's planted-copy convention parks synthetic ids at
    # +1_000_000 ABOVE the real id space and sizes its quantizer from the
    # contiguous-ids contract (TESTDATA.md) — an r8 draft shifted replicas
    # by exactly 1_000_000, colliding replica ids with planted ids, which
    # the sf1 selfcheck caught as a Spark/DuckDB member-count divergence.
    save(amplified(emb, {"vec_id": step(emb, "vec_id")}, k, emb_extra), "embeddings")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
