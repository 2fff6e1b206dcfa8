"""Skew mitigation for hot keys (SCALE.md rule 6).

AQE's skew-join splitting handles sort-merge cases at runtime; these helpers
cover the two patterns AQE can't fix:

- ``salted_aggregate``: a two-phase aggregation for power-law grouping keys
  (e.g. one topic carrying 90% of records). Phase 1 aggregates on
  (key, salt) — spreading one hot key over N reducers — phase 2 combines
  the N partials. Correct for any algebraic aggregate (sum/count/min/max).
- ``salted_join``: replicate the small side N× with an explicit salt column
  so a hot key's rows on the big side scatter over N tasks instead of one.

Both are pure DataFrame rewrites — no RDDs, no custom partitioners — so
Catalyst still prunes/pushes around them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def with_salt(df: DataFrame, buckets: int = DEFAULT_SALT_BUCKETS, col: str = "_salt") -> DataFrame:
    """Uniform pseudo-random salt derived from a stable row fingerprint
    (no rand(): deterministic for tests and retries)."""
    fingerprint = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(col, F.pmod(fingerprint, F.lit(buckets)).cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output_name → "fn(col)" where fn ∈ {sum, count, min, max}.
    count is re-combined with sum in phase 2 (count of counts is wrong).
    """
    phase1_cols = []
    phase2_cols = []
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        col = col.rstrip(")")
        fn = fn.strip().lower()
        if fn == "count":
            phase1_cols.append(F.count(F.lit(1) if col in ("", "*", "1") else F.col(col)).alias(out))
            phase2_cols.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            phase1_cols.append(getattr(F, fn)(col).alias(out))
            phase2_cols.append(getattr(F, fn)(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_cols)
    return partial.groupBy(*keys).agg(*phase2_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = DEFAULT_SALT_BUCKETS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side over
    every salt value, join on keys + salt. Small side grows ×buckets — only
    use when the small side is broadcast-sized but the optimizer chose a
    shuffle join because of size estimates, or under shuffle-hash plans."""
    big_s = with_salt(big, buckets)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = big_s.join(small_s, [*on, "_salt"], how)
    return out.drop("_salt")
