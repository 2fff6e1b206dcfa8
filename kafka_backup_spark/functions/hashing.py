"""Portable 56-bit string/binary hash shared by the dedup/LSH operators.

Definition: ``H(x) = big-endian u56 of md5(x) bytes 8..14``
(= hex chars 17..30 of the md5 digest, read as one number).

- Spark side: ``conv(substring(md5(x), 17, 14), 16, 10)`` cast LONG — three
  expression nodes, all inside whole-stage codegen (no higher-order
  functions, no Python) — the property that matters at 100 TB.  56 bits
  (not 64) is deliberate: the value fits a signed long WITHOUT the
  decimal(20,0)+pmod detour a full u64 would force; big-endian (not LE) is
  deliberate too: one substring instead of seven substring+concat pairs —
  together ~25% of the whole minhash query at sf0.1.
- DuckDB side: ``CAST('0x' || substring(md5(x), 17, 14) AS UBIGINT)``
  (same hex chars, same reading order).

Seeded families for MinHash/LSH are affine transforms ``(a_s·H + c_s) mod P61``
(a_s ≤ 23 ⇒ a·H < 2^61 — no BIGINT overflow, no pre-reduction needed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P61 = 2_305_843_009_213_693_951  # 2^61 - 1

# affine seed families (a_s small odd primes so a·H + c stays < 2^62 for
# H < 2^56 — products never leave BIGINT range)
SEED_A = (3, 5, 7, 11, 13, 17, 19, 23)
SEED_C = (12345, 67890, 13579, 24680, 11111, 22222, 33333, 44444)


def fast_hash64(col: Column) -> Column:
    """H(x) as defined above, over a string or binary column."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 17, 14), 16, 10).cast("long")


def fast_hash64_duckdb(expr: str) -> str:
    """DuckDB oracle twin of ``fast_hash64``."""
    return f"CAST(CAST('0x' || substring(md5({expr}), 17, 14) AS UBIGINT) AS BIGINT)"


def seeded_hash(h: Column, seed: int) -> Column:
    """Affine family member s of a hash h ∈ [0, 2^56): a_s ≤ 23 ⇒
    a·h + c < 2^61 — stays in BIGINT with headroom, no pre-reduction."""
    return (h * F.lit(SEED_A[seed]) + F.lit(SEED_C[seed])) % F.lit(P61)


def seeded_hash_duckdb(h_expr: str, seed: int) -> str:
    return f"(({h_expr}) * {SEED_A[seed]} + {SEED_C[seed]}) % {P61}"
