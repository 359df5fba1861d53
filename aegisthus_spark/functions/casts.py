"""Hex-encoded byte value -> typed columns, with the reference Pig caster's
semantics (aegisthus-pig/.../AegisthusLoadCaster.java:42-138):

- ``chararray``: hex -> bytes -> UTF-8 string
- ``int``/``long``: FIRST try parsing the decoded *string* as a decimal
  number (AegisthusLoadCaster.java:94-97,127-130), THEN fall back to
  width-based big-endian signed decode of 1/2/4/8 raw bytes
  (``getNumber``, :105-121); other widths -> null
- ``float``/``double``: IEEE-754 bit reinterpretation of 4/8 raw bytes

All decodes are pure Spark SQL expressions — the IEEE reinterpretation is
done with exact sign/exponent/mantissa arithmetic (every step representable,
so results are bit-identical to a native reinterpret).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _decoded_str(h: Column) -> Column:
    # binary -> string cast never throws on invalid UTF-8 (unlike ANSI
    # decode()), matching Pig's forgiving ``new String(bytes)``
    return F.unhex(h).cast("string")


def hex_to_chararray(col: str | Column) -> Column:
    """hex string -> UTF-8 string (null on empty input)."""
    h = _c(col)
    return F.when((h.isNull()) | (F.length(h) == 0), F.lit(None).cast("string")).otherwise(
        _decoded_str(h)
    )


def _sext(u: Column, bits: int) -> Column:
    return F.when(u >= (1 << (bits - 1)), u - F.lit(1 << bits).cast("long")).otherwise(u)


def _width_decode(h: Column) -> Column:
    n = F.length(h)
    u_small = F.conv(h, 16, 10).cast("long")
    # 8-byte values can exceed bigint as unsigned; go through decimal(20,0)
    u_big = F.conv(h, 16, 10).cast("decimal(20,0)")
    big = F.when(
        u_big >= F.lit(str(1 << 63)).cast("decimal(20,0)"),
        (u_big - F.lit(str(1 << 64)).cast("decimal(21,0)")).cast("long"),
    ).otherwise(u_big.cast("long"))
    return (
        F.when(n == 2, _sext(u_small, 8))
        .when(n == 4, _sext(u_small, 16))
        .when(n == 8, _sext(u_small, 32))
        .when(n == 16, big)
        .otherwise(F.lit(None).cast("long"))
    )


def hex_to_long(col: str | Column) -> Column:
    """Pig ``bytesToLong``: decimal-string parse first, then width decode."""
    h = _c(col)
    s = _decoded_str(h)
    as_text = F.when(s.rlike("^-?[0-9]+$"), s.try_cast("long"))
    return F.when((h.isNull()) | (F.length(h) == 0), F.lit(None).cast("long")).otherwise(
        F.coalesce(as_text, _width_decode(h))
    )


def hex_to_int(col: str | Column) -> Column:
    """Pig ``bytesToInteger``: like long, then Java ``(int)`` low-32 wrap."""
    v = hex_to_long(col)
    wrapped = ((v + F.lit(1 << 31)) % F.lit(1 << 32) + F.lit(1 << 32)) % F.lit(1 << 32) - F.lit(
        1 << 31
    )
    return wrapped.cast("int")


def hex_to_float(col: str | Column) -> Column:
    """IEEE-754 binary32 reinterpretation of 4 bytes (8 hex chars)."""
    h = _c(col)
    bits = F.conv(h, 16, 10).cast("long")
    sign = F.when(F.shiftright(bits, 31).bitwiseAND(F.lit(1)) == 1, F.lit(-1.0)).otherwise(
        F.lit(1.0)
    )
    e = F.shiftright(bits, 23).bitwiseAND(F.lit(0xFF))
    m = bits.bitwiseAND(F.lit(0x7FFFFF))
    val = (
        F.when(
            e == 0xFF,
            F.when(m == 0, sign * F.lit(float("inf"))).otherwise(F.lit(float("nan"))),
        )
        .when(e == 0, sign * m.cast("double") * F.pow(F.lit(2.0), F.lit(-149)))
        .otherwise(
            sign * (m + F.lit(1 << 23)).cast("double") * F.pow(F.lit(2.0), e.cast("double") - 150)
        )
    )
    return F.when((h.isNull()) | (F.length(h) != 8), F.lit(None).cast("double")).otherwise(val)


def hex_to_double(col: str | Column) -> Column:
    """IEEE-754 binary64 reinterpretation of 8 bytes (16 hex chars).

    The top 12 bits (sign+exponent) come from the first 3 hex chars, the
    52-bit mantissa from the remaining 13 — both fit a bigint exactly.
    """
    h = _c(col)
    top12 = F.conv(F.substring(h, 1, 3), 16, 10).cast("long")
    sign = F.when(F.shiftright(top12, 11).bitwiseAND(F.lit(1)) == 1, F.lit(-1.0)).otherwise(
        F.lit(1.0)
    )
    e = top12.bitwiseAND(F.lit(0x7FF))
    m = F.conv(F.substring(h, 4, 13), 16, 10).cast("long")
    val = (
        F.when(
            e == 0x7FF,
            F.when(m == 0, sign * F.lit(float("inf"))).otherwise(F.lit(float("nan"))),
        )
        .when(e == 0, sign * m.cast("double") * F.pow(F.lit(2.0), F.lit(-1074)))
        .otherwise(
            sign * (m + F.lit(1 << 52)).cast("double") * F.pow(F.lit(2.0), e.cast("double") - 1075)
        )
    )
    return F.when((h.isNull()) | (F.length(h) != 16), F.lit(None).cast("double")).otherwise(val)
