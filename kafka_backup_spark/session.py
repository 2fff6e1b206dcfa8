"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the config set below is chosen so the
same plans survive a 1000-executor cluster at 100 TB:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting)
- auto broadcast threshold left on so dimension/mapping tables broadcast
- session timezone pinned to UTC so ms-epoch arithmetic is deterministic
- Arrow enabled so the (rare) pandas-UDF paths batch instead of pickling rows
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kafka-backup-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # make the package importable on executor python workers (pandas UDFs
    # deserialize references to kafka_backup_spark.functions.*)
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{existing}" if existing else pkg_parent
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the generated-class cache defaults to 100 entries; a session running
        # the full ~90-query catalog generates several hundred codegen stages,
        # so the default thrashes and every pass recompiles (measured 1.5× on
        # the interleaved bench: 20.3 s → 13.0 s).  Compiled classes are small;
        # 5000 entries is a few tens of MB of driver/executor metaspace.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # testdata events.parquet carries TIMESTAMP(NANOS); read as long and
        # convert explicitly (schema.events_as_records)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
