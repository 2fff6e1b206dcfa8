"""fast_hash64 parity: Spark expression vs DuckDB oracle vs pure Python."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_backup_spark.functions import hashing

VALUES = ["", "a", "abc", "hello world", "Zürich", "文档", "x" * 100, "the quick brown fox"]


def py_hash64(s: str) -> int:
    d = hashlib.md5(s.encode()).digest()
    return int.from_bytes(d[8:15], "big")  # u56: md5 bytes 8..14 BE


def test_python_definition_matches_spark(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", hashing.fast_hash64(F.col("s")).alias("h")).collect()}
    for v in VALUES:
        assert got[v] == py_hash64(v), v


def test_duckdb_oracle_matches_spark(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "s string")
    srows = {
        r["s"]: (r["h"], r["h0"], r["h7"])
        for r in df.select(
            "s",
            hashing.fast_hash64(F.col("s")).alias("h"),
            hashing.seeded_hash(hashing.fast_hash64(F.col("s")), 0).alias("h0"),
            hashing.seeded_hash(hashing.fast_hash64(F.col("s")), 7).alias("h7"),
        ).collect()
    }
    con = duckdb.connect()
    h = hashing.fast_hash64_duckdb("s")
    vals = ", ".join(f"('{v}')" for v in VALUES)
    drows = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            f"SELECT s, {h}, {hashing.seeded_hash_duckdb(h, 0)}, "
            f"{hashing.seeded_hash_duckdb(h, 7)} FROM (VALUES {vals}) t(s)"
        ).fetchall()
    }
    assert srows == drows


def test_seeded_families_distinct(spark):
    df = spark.createDataFrame([(v,) for v in VALUES if v], "s string")
    h = hashing.fast_hash64(F.col("s"))
    cols = [hashing.seeded_hash(h, s).alias(f"h{s}") for s in range(len(hashing.SEED_A))]
    rows = df.select(*cols).collect()
    for row in rows:
        assert len(set(row)) == len(hashing.SEED_A)  # no family collisions
        assert all(0 <= v < hashing.P61 for v in row)
