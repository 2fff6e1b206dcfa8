"""LE binary codecs + header extraction (F7 / P8-P10)."""

from __future__ import annotations

import struct

import pyspark.sql.functions as F

from kafka_backup_spark.functions.codecs import (
    header_i64_or_string,
    le_i32_decode,
    le_i32_encode,
    le_i64_decode,
    le_i64_encode,
)


def test_le_i64_roundtrip(spark):
    vals = [0, 1, 255, 256, 2**31, 2**62, -1, -123456789, 9223372036854775807, -9223372036854775808]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select(
        "v",
        le_i64_encode("v").alias("enc"),
        le_i64_decode(le_i64_encode("v")).alias("dec"),
    ).collect()
    for r in rows:
        assert bytes(r["enc"]) == struct.pack("<q", r["v"]), r["v"]
        assert r["dec"] == r["v"]


def test_le_i32_roundtrip(spark):
    vals = [0, 1, 7, 65535, 2**31 - 1, -1, -42]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    rows = df.select(
        "v",
        le_i32_encode("v").alias("enc"),
        le_i32_decode(le_i32_encode("v")).alias("dec"),
    ).collect()
    for r in rows:
        assert bytes(r["enc"]) == struct.pack("<i", r["v"]), r["v"]
        assert r["dec"] == r["v"]


def test_header_dual_decode(spark):
    # 8-byte LE wins; UTF-8 digit string fallback; junk → null
    rows = [
        (struct.pack("<q", 4242),),
        (b"12345",),
        (b"not-a-number",),
        (b"\x01\x02",),
    ]
    df = spark.createDataFrame(rows, "hv binary")
    got = [r[0] for r in df.select(header_i64_or_string("hv")).collect()]
    assert got == [4242, 12345, None, None]
