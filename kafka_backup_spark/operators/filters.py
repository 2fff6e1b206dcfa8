"""Predicates: topic selection, PITR time windows, offset ranges.

All are plain Catalyst filters so predicate pushdown / partition pruning /
parquet row-group skipping apply for free. The reference implements the same
semantics imperatively:

- topic glob include/exclude, exclude wins, empty include = all
  (backup/engine.rs:616-668, glob_match_impl engine.rs:1352-1385)  [P1]
- restore-side glob + ``~regex`` (restore/engine.rs:882-912, 1569-1584)  [P2]
- segment time-window overlap prune (manifest.rs:168-179)  [P4]
- record-level PITR filter, inclusive ms-precision bounds
  (restore/helpers.rs:55-73)  [P5]
- offset range [start, end) per partition (backup/engine.rs:903-974)  [P6]
- source-partition allowlist (restore/engine.rs:968-978)  [P7]
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_backup_spark.functions.globs import globs_to_regex

INTERNAL_TOPIC_PREFIX = "__"


def topic_filter(
    df: DataFrame,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    topic_col: str = "topic",
    include_internal: bool = False,
) -> DataFrame:
    """P1/P2: include/exclude glob (or ``~regex``) lists over a topic column.

    Empty/None include = all topics; exclude always wins; internal
    (``__``-prefixed) topics excluded unless opted in.
    """
    col = F.col(topic_col)
    pred: Column = F.lit(True)
    if include:
        pred = pred & col.rlike(globs_to_regex(include))
    if exclude:
        pred = pred & ~col.rlike(globs_to_regex(exclude))
    if not include_internal:
        pred = pred & ~col.startswith(INTERNAL_TOPIC_PREFIX)
    return df.filter(pred)


def pitr_filter(
    df: DataFrame,
    start_ts: Column | str | None = None,
    end_ts: Column | str | None = None,
    ts_col: str = "timestamp",
) -> DataFrame:
    """P5: record-level point-in-time filter. Both bounds inclusive, either
    side optional (reference restore/helpers.rs:55-73)."""
    col = F.col(ts_col)
    pred = F.lit(True)
    if start_ts is not None:
        pred = pred & (col >= start_ts)
    if end_ts is not None:
        pred = pred & (col <= end_ts)
    return df.filter(pred)


def segment_time_prune(
    manifest_df: DataFrame,
    window_start: Column | str | None = None,
    window_end: Column | str | None = None,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """P4: keep segments whose [start_ts, end_ts] overlaps the window —
    inclusive bounds, open-ended sides (manifest.rs:168-179). On the parquet
    data path Catalyst's min/max skipping makes this redundant; it stays as a
    cheap manifest-level pre-filter for file listing."""
    pred = F.lit(True)
    if window_end is not None:
        pred = pred & (F.col(start_col) <= window_end)
    if window_start is not None:
        pred = pred & (F.col(end_col) >= window_start)
    return manifest_df.filter(pred)


def offset_range_filter(
    df: DataFrame,
    start_offset: int | None = None,
    end_offset: int | None = None,
    offset_col: str = "offset",
) -> DataFrame:
    """P6: half-open offset range [start, end) — backup read bounds."""
    col = F.col(offset_col)
    pred = F.lit(True)
    if start_offset is not None:
        pred = pred & (col >= F.lit(start_offset))
    if end_offset is not None:
        pred = pred & (col < F.lit(end_offset))
    return df.filter(pred)


def partition_filter(df: DataFrame, partitions: list[int], partition_col: str = "partition") -> DataFrame:
    """P7: restore only the listed source partitions."""
    return df.filter(F.col(partition_col).isin(partitions))


def missing_literal_includes(df: DataFrame, include: list[str], topic_col: str = "topic") -> list[str]:
    """P3: literal (non-glob) include topics absent from the stream — the
    reference fails the run when this is non-empty (backup/engine.rs:1311-1350).
    Driver-side assertion over a tiny distinct set."""
    literals = {p for p in include if "*" not in p and "?" not in p and not p.startswith("~")}
    if not literals:
        return []
    present = {
        r[0]
        for r in df.select(topic_col).filter(F.col(topic_col).isin(list(literals))).distinct().collect()
    }
    return sorted(literals - present)
