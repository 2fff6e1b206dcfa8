#!/usr/bin/env python
"""audio_stats / image_stats A/B (r15): two-stage synth→decode vs fused.

Shipped shape: mapInPandas synth (payload Python→JVM) → mapInPandas stats
(payload JVM→Python) — the WAV/BMP/PNG/JPEG bytes cross the Arrow boundary
TWICE for no reason: both stages are Python, nothing between them is JVM
work (guide §4.1 — control how many columns cross, and how often).

Fused shape: ONE mapInPandas stage synthesizes each payload and reduces it
to its stats row in place (multimodal.audio_stat_row / image_stat_row —
the same code path the operators run).  The encode→decode roundtrip the
query exists to prove still executes in full; the payload simply never
leaves the Python worker.  Input is the narrow (media_id, params) frame,
output the narrow stats frame.

Parity: sorted-row hash vs shipped before timing.  min-of-N interleaved,
noop sink, per-rep job descriptions (guide §1.4/1.5).

NOTE: the A/B record quoted in OPTIMIZATION_r15.md was taken while the
catalog bodies still shipped the two-stage shape; after adoption the
"*_ship" variants build the fused plan too, so a re-run compares the fused
shape against itself (parity stays meaningful, the timing delta does not).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd
from pyspark.sql import functions as F

from kafka_backup_spark import catalog
from kafka_backup_spark.multimodal import (
    AUDIO_STATS_SCHEMA,
    IMAGE_STATS_SCHEMA,
    audio_stat_row,
    image_stat_row,
    synthesize_bmp,
    synthesize_jpeg,
    synthesize_png,
    synthesize_wav,
)
from kafka_backup_spark.queries.pipeline import _docs_hot
from kafka_backup_spark.session import autosize_shuffle_partitions, get_spark

AUDIO_COLS = ["media_id", "sample_rate", "n_samples", "sum_samples", "max_abs", "decoded"]
IMAGE_COLS = ["media_id", "width", "height", "n_px", "sum_r", "sum_g", "sum_b", "decoded"]


def rows_hash(df) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_audio_fused(spark, sf_dir):
    ids = _docs_hot(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        (200 + F.col("doc_id") % 50).cast("int").alias("n_samples"),
    )

    def synth_stats(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [
                    audio_stat_row(int(m), synthesize_wav(int(m), int(n)))
                    for m, n in zip(pdf["media_id"], pdf["n_samples"])
                ],
                columns=AUDIO_COLS,
            )

    return ids.mapInPandas(synth_stats, AUDIO_STATS_SCHEMA)


def build_image_fused(spark, sf_dir):
    ids = _docs_hot(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        (8 + F.col("doc_id") % 5).cast("int").alias("width"),
        (6 + F.col("doc_id") % 3).cast("int").alias("height"),
    )
    synths = (synthesize_bmp, synthesize_png, synthesize_jpeg)

    def synth_stats(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [
                    image_stat_row(int(m), synths[int(m) % 3](int(m), int(w), int(h)))
                    for m, w, h in zip(pdf["media_id"], pdf["width"], pdf["height"])
                ],
                columns=IMAGE_COLS,
            )

    return ids.mapInPandas(synth_stats, IMAGE_STATS_SCHEMA)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "8"))
    spark = get_spark("media_fuse_ab")
    sc = spark.sparkContext
    autosize_shuffle_partitions(spark, sf_dir)

    qs = catalog.queries()
    variants = {
        "audio_ship": qs["audio_stats"](spark, sf_dir),
        "audio_fuse": build_audio_fused(spark, sf_dir),
        "image_ship": qs["image_stats"](spark, sf_dir),
        "image_fuse": build_image_fused(spark, sf_dir),
    }
    for df in variants.values():
        noop(df)  # warm

    hashes = {k: rows_hash(df) for k, df in variants.items()}
    print("parity:", json.dumps(hashes))
    assert hashes["audio_ship"] == hashes["audio_fuse"], "audio parity MISMATCH"
    assert hashes["image_ship"] == hashes["image_fuse"], "image parity MISMATCH"

    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):
        for k, df in variants.items():
            sc.setJobDescription(f"media_fuse_ab:{k}#r{rep}")
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
