"""Kafka-compatible murmur2 hash + default partitioner.

Spark's built-in ``hash()`` is Murmur3-x86-32 with seed 42; Kafka's default
partitioner uses murmur2 with seed 0x9747b28c (public Apache Kafka
``org.apache.kafka.common.utils.Utils.murmur2``; reference behavior at
crates/kafka-backup-core/src/restore/repartition.rs:36-75). Bit-compatibility
matters: a restored topic must route each key to the same partition the Java
client would pick, so we reimplement it here and verify against the published
Kafka test vectors (tests/test_murmur2.py).

Two surfaces:
- ``murmur2(bytes)`` — pure-Python scalar (driver-side / oracle use)
- ``murmur2_expr(col)`` / ``kafka_partition_expr(col, n)`` — an Arrow-batched
  pandas UDF for executor-side vectorized use. Hashing is the only part of
  the repartition path that leaves the JVM; the shuffle itself is Spark's.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType

KAFKA_SEED = 0x9747B28C
_M = 0x5BD1E995
_R = 24
_MASK = 0xFFFFFFFF


def murmur2(data: bytes, seed: int = KAFKA_SEED) -> int:
    """murmur2 over ``data``, returned as a *signed* 32-bit int (Java parity)."""
    length = len(data)
    h = (seed ^ length) & _MASK
    n4 = length & ~3
    for i in range(0, n4, 4):
        k = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | (data[i + 3] << 24)
        k = (k * _M) & _MASK
        k ^= k >> _R
        k = (k * _M) & _MASK
        h = (h * _M) & _MASK
        h ^= k
    rem = length & 3
    if rem == 3:
        h ^= data[n4 + 2] << 16
    if rem >= 2:
        h ^= data[n4 + 1] << 8
    if rem >= 1:
        h ^= data[n4]
        h = (h * _M) & _MASK
    h ^= h >> 13
    h = (h * _M) & _MASK
    h ^= h >> 15
    return h - (1 << 32) if h >= (1 << 31) else h


def to_positive(h: int) -> int:
    """Kafka's toPositive: mask the sign bit (NOT abs)."""
    return h & 0x7FFFFFFF


def kafka_partition(key: bytes | None, num_partitions: int) -> int | None:
    """Partition for a non-null key; None for null keys (round-robin path).

    Empty (zero-byte) keys ARE hashed — only null keys round-robin
    (reference repartition.rs:64 and its test_empty_key_is_hashed).
    """
    if key is None:
        return None
    return to_positive(murmur2(key)) % num_partitions


@F.pandas_udf(LongType())
def _murmur2_udf(keys: pd.Series) -> pd.Series:
    return keys.map(lambda b: None if b is None else murmur2(bytes(b)))


def murmur2_expr(col: Column | str) -> Column:
    """Signed-32 murmur2 of a binary column (null in → null out)."""
    return _murmur2_udf(F.col(col) if isinstance(col, str) else col)


def kafka_partition_expr(col: Column | str, num_partitions: int) -> Column:
    """Kafka default-partitioner target partition for a binary key column.

    Null keys yield null (callers overlay round-robin for those — see
    operators/repartition.py).
    """
    h = murmur2_expr(col)
    return F.when(
        h.isNotNull(),
        F.pmod(h.bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(num_partitions)).cast(IntegerType()),
    )
