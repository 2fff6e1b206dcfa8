"""Aggregated query catalog: every implemented operator exposed as a
(spark_fn, oracle_sql) pair for the driver contract in __spark_entry__.py."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_backup_spark.queries.core import CORE_QUERIES
from kafka_backup_spark.queries.extra import EXTRA_QUERIES
from kafka_backup_spark.queries.pipeline import PIPELINE_QUERIES
from kafka_backup_spark.queries.textops import TEXTOPS_QUERIES

ALL_QUERIES: dict[str, tuple] = {
    **CORE_QUERIES,
    **PIPELINE_QUERIES,
    **TEXTOPS_QUERIES,
    **EXTRA_QUERIES,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None}
