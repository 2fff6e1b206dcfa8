"""Portable 64-bit string/binary hash shared by the dedup/LSH operators.

Definition: ``H(x) = (little-endian u64 of md5(x) bytes 8..15) mod (2^61-1)``.

- Spark side: native ``md5`` + byte-pair reversal via ``substring``/``concat``
  + ``conv`` → stays inside whole-stage codegen (no higher-order functions,
  no Python) — the property that matters at 100 TB.
- DuckDB side: ``md5_number_lower(x) % P`` (same bytes, same endianness).

Seeded families for MinHash/LSH are affine transforms ``(a_s·H + c_s) mod P``
(products < 2^52·2^9 — no BIGINT overflow for the constants used here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P61 = 2_305_843_009_213_693_951  # 2^61 - 1

# affine seed families (a odd, |a·P| well under 2^63 when combined with H<P61
# is avoided by reducing H first; a_s chosen < 2^10 to keep a·H < 2^71? —
# instead keep a_s small primes and reduce twice)
SEED_A = (3, 5, 7, 11, 13, 17, 19, 23)
SEED_C = (12345, 67890, 13579, 24680, 11111, 22222, 33333, 44444)


def fast_hash64(col: Column, as_string: bool = False) -> Column:
    """H(x) as defined above, over a string or binary column."""
    m = F.md5(col.cast("binary"))
    le_hex = F.concat(*[F.substring(m, 31 - 2 * i, 2) for i in range(8)])
    return F.pmod(F.conv(le_hex, 16, 10).cast("decimal(20,0)"), F.lit(P61)).cast("long")


def fast_hash64_duckdb(expr: str) -> str:
    """DuckDB oracle twin of ``fast_hash64``."""
    return f"CAST(md5_number_lower({expr}) % {P61} AS BIGINT)"


def seeded_hash(h: Column, seed: int) -> Column:
    """Affine family member s of a reduced hash h ∈ [0, 2^61): result stays
    in BIGINT because a_s ≤ 23 ⇒ a·h < 2^66 — too big! Reduce h to 2^56
    first so a·h < 2^61 and the sum stays < 2^62."""
    h56 = h % F.lit(1 << 56)
    return (h56 * F.lit(SEED_A[seed]) + F.lit(SEED_C[seed])) % F.lit(P61)


def seeded_hash_duckdb(h_expr: str, seed: int) -> str:
    return f"((({h_expr}) % {1 << 56}) * {SEED_A[seed]} + {SEED_C[seed]}) % {P61}"
