"""Portable 56-bit string/binary hash shared by the dedup/LSH operators.

Definition: ``H(x) = little-endian u56 of md5(x) bytes 8..14``
(equivalently: the low 56 bits of DuckDB's ``md5_number_lower``).

- Spark side: native ``md5`` + byte-pair reversal via ``substring``/``concat``
  + ``conv`` straight to BIGINT → stays inside whole-stage codegen (no
  higher-order functions, no Python) — the property that matters at 100 TB.
  56 bits (not 64) is deliberate: the value fits a signed long WITHOUT the
  decimal(20,0)+pmod detour a full u64 would force, which measured ~20%
  of the whole minhash query at sf0.1.
- DuckDB side: ``md5_number_lower(x) % 2^56`` (same bytes, same endianness).

Seeded families for MinHash/LSH are affine transforms ``(a_s·H + c_s) mod P61``
(a_s ≤ 23 ⇒ a·H < 2^61 — no BIGINT overflow, no pre-reduction needed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P61 = 2_305_843_009_213_693_951  # 2^61 - 1
M56 = 1 << 56

# affine seed families (a_s small odd primes so a·H + c stays < 2^62 for
# H < 2^56 — products never leave BIGINT range)
SEED_A = (3, 5, 7, 11, 13, 17, 19, 23)
SEED_C = (12345, 67890, 13579, 24680, 11111, 22222, 33333, 44444)


def fast_hash64(col: Column, as_string: bool = False) -> Column:
    """H(x) as defined above, over a string or binary column."""
    m = F.md5(col.cast("binary"))
    le_hex = F.concat(*[F.substring(m, 31 - 2 * i, 2) for i in range(1, 8)])
    return F.conv(le_hex, 16, 10).cast("long")


def fast_hash64_duckdb(expr: str) -> str:
    """DuckDB oracle twin of ``fast_hash64``."""
    return f"CAST(md5_number_lower({expr}) % {M56} AS BIGINT)"


def seeded_hash(h: Column, seed: int) -> Column:
    """Affine family member s of a hash h ∈ [0, 2^56): a_s ≤ 23 ⇒
    a·h + c < 2^61 — stays in BIGINT with headroom, no pre-reduction."""
    return (h * F.lit(SEED_A[seed]) + F.lit(SEED_C[seed])) % F.lit(P61)


def seeded_hash_duckdb(h_expr: str, seed: int) -> str:
    return f"(({h_expr}) * {SEED_A[seed]} + {SEED_C[seed]}) % {P61}"
