#!/usr/bin/env python
"""audio_stats stage decomposition (r15 fifth session, guide §1):

Where do 0.35 s go when the per-row Python work measures ~10 ms at
32-way parallelism?  Fragments, each min-of-N through the noop sink:

  F0  noop floor (1-row literal frame)
  F1  ids frame alone (hot documents scan + project)
  F2  ids -> mapInPandas PASS-THROUGH stats schema (constant rows, no
      synth/decode) — isolates the Arrow boundary + stage launch
  F3  ids -> fused synth+decode (the shipped q_audio_stats)
  F4  F3 but batch-vectorized stat assembly (candidate change, if built)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd
from pyspark.sql import functions as F

from kafka_backup_spark.queries.pipeline import q_audio_stats, _docs_hot
from kafka_backup_spark.multimodal import AUDIO_STATS_SCHEMA
from kafka_backup_spark.session import autosize_shuffle_partitions, get_spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "8"))
    spark = get_spark("media_floor_probe")
    sc = spark.sparkContext
    autosize_shuffle_partitions(spark, sf_dir)

    ids = _docs_hot(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        (200 + F.col("doc_id") % 50).cast("int").alias("n_samples"),
    )

    def passthrough(batches):
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "sample_rate": pd.Series([16000] * n, dtype="int32"),
                    "n_samples": pdf["n_samples"].astype("int64"),
                    "sum_samples": pd.Series([0] * n, dtype="int64"),
                    "max_abs": pd.Series([0] * n, dtype="int32"),
                    "decoded": pd.Series(["pcm16"] * n),
                }
            )

    frags = {
        "F0_noop_floor": spark.range(1),
        "F1_ids_scan": ids,
        "F2_arrow_passthrough": ids.mapInPandas(passthrough, AUDIO_STATS_SCHEMA),
        "F3_shipped": q_audio_stats(spark, sf_dir),
    }

    for name, df in frags.items():  # warm
        sc.setJobDescription(f"floor:warm:{name}")
        noop(df)
    times = {k: [] for k in frags}
    for rep in range(reps):
        for name, df in frags.items():
            sc.setJobDescription(f"floor:{name}#r{rep}")
            t0 = time.monotonic()
            noop(df)
            times[name].append(time.monotonic() - t0)
    sc.setJobDescription(None)
    print(json.dumps({k: {"min": round(min(v), 3), "all": [round(x, 3) for x in v]} for k, v in times.items()}, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
