#!/usr/bin/env python
"""lsh_candidates / near_dup_pipeline stage decomposition + pair-gen A/B
(r16, VERDICT r15 #6: one §2 pass over the band-bucket join family).

Warm fragments over the shared persisted band table (exactly what the
bench's min-of-5 measures — the gram/band build is a session artifact):

  L0  noop floor
  L1  sized band table read (cached)
  L2  L1 + bucket-cap filter
  L3  L2 + band self-join (ordered pairs, no distinct)
  L4  full lsh_candidates (+ pair distinct)
  N5  full near_dup_pipeline (+ two array-attach joins + array_intersect
      verify + threshold)

A/B lever (the embedding per-cell trick transplanted): generate the a<b
pairs per (band, sig) bucket via sort_array(collect_list(doc_id)) + a
flatten/transform comprehension INSTEAD of the self-join — one hash
aggregate replaces the join's exchange pair.  HOF lambdas evaluate
interpreted, so this trades codegen join probes for per-element closure
calls; the bucket cap bounds per-bucket pair work either way.  Parity:
sorted-row hash vs the shipped shape.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from kafka_backup_spark.queries import textops as T
from kafka_backup_spark.session import autosize_shuffle_partitions, get_spark


def rows_hash(df) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_v_grouped(spark, sf_dir):
    """Per-bucket pair generation: collect each capped bucket's doc_ids,
    emit a<b pairs with a flatten/transform comprehension, distinct."""
    bands = T._capped_bands(T._shared_band_table(spark, sf_dir))
    buckets = bands.groupBy("band", "sig").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (a, i) -> "
                "transform(slice(ds, i + 2, size(ds) - i - 1), b -> struct(a as doc_a, b as doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return pairs.distinct()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "8"))
    spark = get_spark("lsh_decompose")
    sc = spark.sparkContext
    autosize_shuffle_partitions(spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    v_ship = T.q_lsh_candidates(spark, sf_dir)
    noop(v_ship)  # build + warm the shared band table
    v_grouped = build_v_grouped(spark, sf_dir)
    h_ship, h_grp = rows_hash(v_ship), rows_hash(v_grouped)
    print("parity:", json.dumps({"V_ship": h_ship, "V_grouped": h_grp}))
    assert h_ship == h_grp, "parity MISMATCH"

    bands_raw = T._shared_band_table(spark, sf_dir)
    capped = T._capped_bands(bands_raw)
    a, b = capped.alias("a"), capped.alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.sig") == F.col("b.sig"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))

    frags = {
        "L0_noop_floor": spark.range(1),
        "L1_bands_cached": bands_raw,
        "L2_capped": capped,
        "L3_selfjoin": joined,
        "L4_full_lsh": v_ship,
        "V_grouped": v_grouped,
        "N5_full_near_dup": T.q_near_dup_pipeline(spark, sf_dir),
    }
    for name, df in frags.items():  # warm
        sc.setJobDescription(f"lsh:warm:{name}")
        noop(df)
    times = {k: [] for k in frags}
    for rep in range(reps):
        for name, df in frags.items():
            sc.setJobDescription(f"lsh:{name}#r{rep}")
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
