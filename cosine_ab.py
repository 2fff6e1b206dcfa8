#!/usr/bin/env python
"""cosine_topk / ann_recall dot-product A/B (r15, guide §4.3):

V_old : zip_with + aggregate fold — a Catalyst higher-order function whose
        lambda evaluates INTERPRETED, once per element, once per PAIR of
        the probe × corpus cross join (the pre-change shipped shape).
V_new : flat 64-term whole-stage-codegen expression with the fold's exact
        op sequence — ((0.0 + t0) + t1) + …, t_i = double(a_i)·double(b_i)
        (the candidate unroll — measured 3× SLOWER by this probe and
        REVERTED; the shipped body keeps the zip_with/aggregate fold).

Parity is a sorted-row hash before timing; min-of-N interleaved, noop
sink, per-rep job descriptions (guide §1.4/1.5).  ann_recall is timed
through the SHIPPED body (new dot) and through a reconstruction with the
old dot on its brute side, holding the IVF side identical.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_backup_spark.queries import textops as T
from kafka_backup_spark.queries.common import hot_table
from kafka_backup_spark.queries.pipeline import N_PROBES, TOP_K
from kafka_backup_spark.session import autosize_shuffle_partitions, get_spark


def rows_hash(df) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def dot_old(a, b):
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def dot_new(a, b):
    total = F.lit(0.0)
    for i in range(T.EMB_DIM):
        total = total + a[i].cast("double") * b[i].cast("double")
    return total


def cosine_topk_with(spark, sf_dir, dot):
    emb = hot_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("pn"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nn"),
    )
    pairs = F.broadcast(probes).crossJoin(corpus).filter(
        F.col("probe_id") != F.col("neighbor_id")
    )
    sims = pairs.select(
        "probe_id",
        "neighbor_id",
        F.round(
            dot(F.col("pe"), F.col("ne")) / (F.col("pn") * F.col("nn")), 4
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("probe_id", "neighbor_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )


def ann_recall_with(spark, sf_dir, dot):
    bf = cosine_topk_with(spark, sf_dir, dot).select("probe_id", "neighbor_id")
    iv = T.q_ivf_topk(spark, sf_dir).select(
        "probe_id", "neighbor_id", F.lit(1).alias("hit")
    )
    j = bf.join(iv, ["probe_id", "neighbor_id"], "left")
    return (
        j.agg(
            F.countDistinct("probe_id").alias("n_probes"),
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
        )
        .select(
            "n_probes",
            "n_true",
            "n_hit",
            F.expr(
                "CASE WHEN n_true = 0 THEN 0 ELSE (n_hit * 1000000) div n_true END"
            ).alias("recall_ppm"),
        )
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "8"))
    spark = get_spark("cosine_ab")
    sc = spark.sparkContext
    autosize_shuffle_partitions(spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    # warm the shared IVF index (ann_recall's IVF side) outside the timed region
    noop(T.q_ivf_topk(spark, sf_dir))

    variants = {
        "cosine_old": cosine_topk_with(spark, sf_dir, dot_old),
        "cosine_new": cosine_topk_with(spark, sf_dir, dot_new),
        "recall_old": ann_recall_with(spark, sf_dir, dot_old),
        "recall_new": ann_recall_with(spark, sf_dir, dot_new),
    }

    h = {k: rows_hash(df) for k, df in variants.items()}
    print("parity:", json.dumps(h))
    assert h["cosine_old"] == h["cosine_new"], "cosine parity MISMATCH"
    assert h["recall_old"] == h["recall_new"], "recall parity MISMATCH"

    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):
        for k, df in variants.items():
            sc.setJobDescription(f"ab:{k}#r{rep}")
            t0 = time.monotonic()
            noop(df)
            times[k].append(time.monotonic() - t0)
            sc.setJobDescription(None)
    summary = {
        k: {"min": round(min(v), 3), "all": [round(x, 3) for x in v]}
        for k, v in times.items()
    }
    print(json.dumps(summary, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
