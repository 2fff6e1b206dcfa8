"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (describe rollup over the record stream) on sf0.001
queries()      — one entry per implemented operator (SURVEY.md §2 + M7 pipeline ops)
oracle_sql()   — DuckDB-equivalent ANSI SQL per query (column-name aligned)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from kafka_backup_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: backup-manifest describe rollup (A2) over the sf0.001 record
    stream — exercises schema mapping, manifest aggregation, and rollup."""
    # driver-provided sessions may lack our nanos config; set what's settable
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static config on some sessions; schema.events_as_records copes
    from kafka_backup_spark.queries.core import q_describe_rollup

    return q_describe_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
