#!/usr/bin/env python
"""minhash_signatures stage decomposition + ASCII-binary-slice A/B (r16,
guide §1 / VERDICT r15 #3: the 0.45–0.50 s entry was never decomposed).

Decomposition (cumulative fragments of the shipped plan, noop sink):

  F0  noop floor (1-row literal)
  F1  docs scan + len filter + explode(sequence) + substring(text, i, 8)
      (the shingle rows, NO hashing)
  F2  F1 + fast_hash64 (md5 + hex-slice + conv per shingle)
  F3  F2 + groupBy(doc_id) 4-seed min agg
  F4  full shipped body (+ stack unpivot)

Hypotheses the increments separate: the O(i) char-position walk inside
``substring(text, i, 8)`` (UTF8String counts chars from the start per
call → O(L²) byte steps per doc) vs the md5 per shingle.

A/B lever (value-preserving for ANY input): when a document is pure
ASCII (octet_length(text) = length(text)), the char slice equals the
byte slice, so ``substring(CAST(text AS BINARY), i, 8)`` — an O(1)
offset copy — feeds md5 the IDENTICAL bytes.  V_bin hoists the ASCII
check and the binary cast to one per DOCUMENT (before the explode; both
are O(L) once, not O(L) per shingle) and branches per shingle row on the
precomputed boolean; non-ASCII docs take the shipped char path, so
results are bit-identical for every possible corpus, not just the
fixtures.  Parity: sorted-row hash V_char vs V_bin before timing.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from kafka_backup_spark.functions.hashing import fast_hash64, seeded_hash
from kafka_backup_spark.queries.pipeline import (
    N_MINHASH_SEEDS,
    _docs_hot,
    q_minhash_signatures,
)
from kafka_backup_spark.session import autosize_shuffle_partitions, get_spark


def rows_hash(df) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _shingles_char(spark, sf_dir):
    docs = _docs_hot(spark, sf_dir).select("doc_id", "text").filter(
        F.length("text") >= 8
    )
    return docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text") - 7)).alias("i"),
        "text",
    ).select("doc_id", F.expr("substring(text, i, 8)").alias("shingle"))


def build_v_bin(spark, sf_dir):
    """Shipped body with the ASCII-guarded binary shingle slice."""
    docs = _docs_hot(spark, sf_dir).select("doc_id", "text").filter(
        F.length("text") >= 8
    )
    base = docs.select(
        "doc_id",
        "text",
        (F.octet_length("text") == F.length("text")).alias("is_ascii"),
        F.col("text").cast("binary").alias("tb"),
    )
    sh = base.select(
        "doc_id",
        "is_ascii",
        "tb",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text") - 7)).alias("i"),
    )
    h = F.when(
        F.col("is_ascii"),
        F.conv(F.substring(F.md5(F.expr("substring(tb, i, 8)")), 17, 14), 16, 10).cast("long"),
    ).otherwise(fast_hash64(F.expr("substring(text, i, 8)")))
    hs = sh.select("doc_id", h.alias("h"))
    mins = hs.groupBy("doc_id").agg(
        *[
            F.min(seeded_hash(F.col("h"), s)).alias(f"m{s}")
            for s in range(N_MINHASH_SEEDS)
        ]
    )
    stack = ", ".join(f"{s}, m{s}" for s in range(N_MINHASH_SEEDS))
    return mins.select(
        "doc_id",
        F.expr(f"stack({N_MINHASH_SEEDS}, {stack}) AS (seed, minhash)"),
    ).select("doc_id", F.col("seed").cast("int").alias("seed"), "minhash")


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "8"))
    spark = get_spark("minhash_ab")
    sc = spark.sparkContext
    autosize_shuffle_partitions(spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    v_char = q_minhash_signatures(spark, sf_dir)
    v_bin = build_v_bin(spark, sf_dir)
    noop(v_char)  # warm the hot pin + codegen

    h_char, h_bin = rows_hash(v_char), rows_hash(v_bin)
    print("parity:", json.dumps({"V_char": h_char, "V_bin": h_bin}))
    assert h_char == h_bin, "parity MISMATCH"

    sh = _shingles_char(spark, sf_dir)
    hashed = sh.withColumn("h", fast_hash64(F.col("shingle"))).drop("shingle")
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min(seeded_hash(F.col("h"), s)).alias(f"m{s}")
            for s in range(N_MINHASH_SEEDS)
        ]
    )
    frags = {
        "F0_noop_floor": spark.range(1),
        "F1_shingles": sh,
        "F2_hashed": hashed,
        "F3_minagg": mins,
        "F4_full_char": v_char,
        "V_bin": v_bin,
    }
    for name, df in frags.items():  # warm
        sc.setJobDescription(f"minhash:warm:{name}")
        noop(df)
    times = {k: [] for k in frags}
    for rep in range(reps):
        for name, df in frags.items():
            sc.setJobDescription(f"minhash:{name}#r{rep}")
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
