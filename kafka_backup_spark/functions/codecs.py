"""Little-endian i64/i32 binary codecs as native column expressions.

The reference encodes offset-tracking headers (`x-original-offset`,
`x-original-timestamp`, `x-source-partition`) as little-endian fixed-width
binary (restore/helpers.rs:79-108, backup/engine.rs:1009-1028), with a UTF-8
digit-string fallback on decode (restore/engine.rs:1521-1542).

No UDFs: encode/decode are byte-shuffles expressible with built-in
``substr``/``conv``/``hex`` arithmetic, so they stay inside whole-stage
codegen on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def le_i64_encode(col: Column | str) -> Column:
    """LONG → 8-byte little-endian binary.

    Big-endian bytes come free from a 16-hex-digit ``unhex``; reverse byte
    order by reassembling the 8 substrings.
    """
    c = _as_col(col)
    be_hex = F.lpad(F.hex(c), 16, "0")
    le_hex = F.concat(*[F.substring(be_hex, i * 2 + 1, 2) for i in range(7, -1, -1)])
    return F.unhex(le_hex)


def le_i32_encode(col: Column | str) -> Column:
    """INT → 4-byte little-endian binary."""
    c = _as_col(col).cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    be_hex = F.lpad(F.hex(c), 8, "0")
    le_hex = F.concat(*[F.substring(be_hex, i * 2 + 1, 2) for i in range(3, -1, -1)])
    return F.unhex(le_hex)


def _le_decode(c: Column, width: int) -> Column:
    be_hex = F.concat(*[F.substring(F.hex(c), i * 2 + 1, 2) for i in range(width - 1, -1, -1)])
    unsigned = F.conv(be_hex, 16, 10).cast("decimal(20,0)")
    # conv yields the unsigned value; fold back into signed two's-complement
    half = F.lit(str(2 ** (8 * width - 1))).cast("decimal(20,0)")
    full = F.lit(str(2 ** (8 * width))).cast("decimal(20,0)")
    signed = F.when(unsigned >= half, (unsigned - full).cast("long")).otherwise(
        unsigned.cast("long")
    )
    return F.when(F.length(c) == width, signed)


def le_i64_decode(col: Column | str) -> Column:
    """8-byte LE binary → LONG (null when length ≠ 8)."""
    return _le_decode(_as_col(col), 8)


def le_i32_decode(col: Column | str) -> Column:
    """4-byte LE binary → LONG (null when length ≠ 4)."""
    return _le_decode(_as_col(col), 4)


def header_i64_or_string(col: Column | str) -> Column:
    """Reference's dual decode: 8-byte LE i64 first, UTF-8 digit string fallback
    (restore/engine.rs:1521-1542). Null when neither parses."""
    c = _as_col(col)
    return F.coalesce(
        le_i64_decode(c),
        c.cast("string").try_cast("long"),
    )
