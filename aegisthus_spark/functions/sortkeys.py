"""JVM-side order-preserving sort keys for typed cell names (F1/J2/A3).

``compact()`` compares cell names and range-tombstone bounds as raw bytes
by default — correct only for byte-ordered comparators. For every other
comparator the reference used Cassandra's ``AbstractType.compare``
(CassSSTableReducer.java:142-153 via the configured comparator); this
module reproduces that order as a *pure Spark SQL expression* so typed
compactions stay inside whole-stage codegen (the Python-UDF fallback in
``types.Comparator.sort_key`` costs a BatchEvalPython exchange per stage).

Encoding (string, ASCII, lexicographically order-preserving):

- simple comparator: the per-type hex transform below.
- ``CompositeType(t1, t2, ...)``: a lead char (``'0'`` for the 0xFFFF
  static prefix, ``'1'`` otherwise — statics sort first, matching
  AbstractCompositeType's STATIC_MARKER rule), then per component
  ``<type-transformed hex>!<eoc char>`` where the end-of-component byte
  maps ``0x00 -> '+'``, ``0x01..0x7f -> 'Z'``, ``0x80..0xff -> '!'``.
  The ``'!'`` terminator sorts below every content char (hex digits and
  the ReversedType sentinel), so unequal component VALUES decide order
  before the eoc is reached — exactly AbstractCompositeType's rule that
  the eoc byte is consulted only between equal components. Among equal
  components ``'!' < '+' < 'Z'`` gives Cassandra's bound ordering: an
  eoc ``-1`` bound sorts before every same-prefix extension, ``0``
  between the prefix row and deeper names, ``+1`` after them.

Per-type hex transforms (component bytes -> hex string whose
lexicographic order equals the comparator's):

- UTF8/Ascii/Bytes/Boolean/SimpleDate/Time/InetAddress: plain ``hex()``
  (unsigned byte order; SimpleDate is an unsigned epoch-shifted u32,
  Time a non-negative long).
- Int32/Long/Timestamp/Date/ShortType/ByteType/CounterColumn: sign bit
  flipped (two's-complement big-endian becomes unsigned-ordered).
- Float/Double: IEEE-754 total order (negative -> all bits inverted,
  positive -> sign bit set), NaN last like ``Double.compare``.
- TimeUUID: embedded v1 timestamp (time_hi, time_mid, time_low) then the
  full uuid for a stable tie-break.
- UUID: version nibble first, v1s by embedded timestamp, otherwise
  unsigned bytes (UUIDType.compareCustom).
- ReversedType(inner): inner transform with every hex digit complemented
  (``translate``) plus a high sentinel so shorter-prefix order inverts.

Unsupported JVM-side (DecimalType, IntegerType varints — variable-length
numeric encodings have no prefix-order-preserving hex form): ``supported``
returns False and callers fall back to the Python ``types.sort_key`` UDF
or reject, with a clear error from ``comparator_sort_key``.

Collection cell paths compare as raw bytes by DEFAULT; pass
``path_types_by_column`` (which ``modern.name_sort_key_for_header`` does
automatically for every collection column) to order them by the real
path comparator — TimeUUID for lists, the element type for sets, the
key type for maps — dispatched on the column-name component at runtime.
All typed transforms carry an injectivity guard for malformed widths:
LWW dedups on the sort key, so two distinct names must never encode to
one key (see ``_malformed_guard``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: eoc byte -> order char (see module docstring)
_EOC_MINUS = "!"
_EOC_ZERO = "+"
_EOC_PLUS = "Z"

_HEX_COMPLEMENT = ("0123456789ABCDEF", "FEDCBA9876543210")


def _strip_pkg(name: str) -> str:
    """Drop the package prefix from the OUTER class only — a plain rsplit
    on '.' would split inside the parentheses of parameterized marshal
    strings ('...ReversedType(...Int32Type)' -> 'Int32Type)'); nested
    parameters are stripped recursively by their own handlers."""
    name = name.strip()
    i = name.find("(")
    if i == -1:
        return name.rsplit(".", 1)[-1]
    return name[:i].rsplit(".", 1)[-1] + name[i:]


def _u16_at(name: Column, pos: Column) -> Column:
    return F.coalesce(
        F.conv(F.hex(F.substring(name, pos, F.lit(2))), 16, 10).cast("int"),
        F.lit(0),
    )


def _malformed_guard(comp: Column, width: int, out: Column) -> Column:
    """Fixed-width transforms are only injective at their expected width;
    a wrong-length value must never COLLIDE with a well-formed key (LWW
    dedups on the SORT KEY, compact.py _LWW_EXPR, so a collision would
    silently merge distinct cell names). Malformed lengths get a '.'
    prefix (0x2E, below every hex digit) + raw hex: deterministic,
    injective, sorts before well-formed values of the same position."""
    return (
        F.when(F.length(comp) == 0, F.lit(""))
        .when(F.length(comp) == width, out)
        .otherwise(F.concat(F.lit("."), F.hex(comp)))
    )


_REST = (1 << 31) - 1  # substring length literal: "to the end"


def _flip_first_byte_hex(comp: Column) -> Column:
    """hex(comp) with the FIRST byte's sign bit flipped — the string-wise
    form of the two's-complement sign flip (identical order for any
    fixed-width signed value, same construction as the Python
    ``_sk_signed_fixed``). Injective at ANY input length (output length
    tracks input length), so no malformed-width guard is needed, and the
    expression is a fraction of the size of the old width-specific
    decimal-conv arithmetic — which showed up as whole seconds of
    analysis/codegen time per query on ma inputs."""
    first = F.conv(F.hex(F.substring(comp, 1, 1)), 16, 10).cast("int")
    flipped = (first + F.lit(128)) % F.lit(256)
    return F.concat(
        F.lpad(F.conv(flipped.cast("string"), 10, 16), 2, "0"),
        F.hex(F.substring(comp, F.lit(2), F.lit(_REST))),
    )


def _flip_sign_hex(comp: Column, width: int) -> Column:
    """Signed big-endian fixed-width -> sign-flipped hex (order-preserving)."""
    return F.when(F.length(comp) == 0, F.lit("")).otherwise(
        _flip_first_byte_hex(comp)
    )


def _ieee_hex(comp: Column, width: int) -> Column:
    """IEEE-754 float/double -> total-order hex, string-wise: negative
    (sign bit set: first hex digit >= '8') -> complement every digit,
    positive -> flip the sign bit. The two branches land in disjoint
    first-digit ranges ('0'-'7' vs '8'-'F'), so the map is injective at
    any length; same order as Float.compare/the Python ``_sk_float``."""
    h = F.hex(comp)
    negative = F.substring(h, 1, 1).isin(*"89ABCDEF")
    return F.when(F.length(comp) == 0, F.lit("")).otherwise(
        F.when(negative, F.translate(h, *_HEX_COMPLEMENT)).otherwise(
            _flip_first_byte_hex(comp)
        )
    )


def _timeuuid_key(h: Column) -> Column:
    """hex(uuid) -> embedded v1 timestamp order (time_hi, time_mid,
    time_low) — same reorder as cql._timeuuid_sort_key."""
    return F.concat(
        F.substring(h, 13, 4), F.substring(h, 9, 4), F.substring(h, 1, 8)
    )


#: marshal class -> fixed byte width for the sign-flip transform
_SIGNED_WIDTH = {
    "ByteType": 1,
    "ShortType": 2,
    "Int32Type": 4,
    "LongType": 8,
    "DateType": 8,  # pre-2.1 timestamp long
    "TimestampType": 8,
    "CounterColumnType": 8,
}

#: marshal classes whose raw bytes already sort in logical order
_BYTE_ORDERED = {
    "BytesType",
    "UTF8Type",
    "AsciiType",
    "BooleanType",
    "SimpleDateType",  # unsigned epoch-shifted u32
    "TimeType",  # non-negative long nanos
    "InetAddressType",
    "EmptyType",
}


def supported(marshal: str) -> bool:
    """True if ``type_sort_key_hex`` handles this marshal class."""
    t = _strip_pkg(marshal.strip())
    if t.startswith("ReversedType(") and t.endswith(")"):
        return supported(t[len("ReversedType(") : -1])
    return (
        t in _BYTE_ORDERED
        or t in _SIGNED_WIDTH
        or t in ("FloatType", "DoubleType", "UUIDType", "TimeUUIDType")
    )


def type_sort_key_hex(comp: Column, marshal: str) -> Column:
    """Component bytes -> hex string in the comparator's logical order."""
    t = _strip_pkg(marshal.strip())
    if t.startswith("ReversedType(") and t.endswith(")"):
        inner = type_sort_key_hex(comp, t[len("ReversedType(") : -1])
        # complement every hex digit; the high sentinel both inverts
        # prefix order AND places the EMPTY value last (its key is the
        # bare sentinel 'Z', above every hex-leading non-empty key) —
        # matching ReversedComparator's b'\xff' for empty (types.py)
        return F.concat(F.translate(inner, *_HEX_COMPLEMENT), F.lit(_EOC_PLUS))
    if t in _BYTE_ORDERED:
        return F.hex(comp)
    if t in _SIGNED_WIDTH:
        return _flip_sign_hex(comp, _SIGNED_WIDTH[t])
    if t == "FloatType":
        return _ieee_hex(comp, 4)
    if t == "DoubleType":
        return _ieee_hex(comp, 8)
    if t == "TimeUUIDType":
        # no malformed guard needed: the key appends the full hex, so
        # equal-length inputs differ in the tail, and the output length
        # strictly increases with input length (equal strings need equal
        # lengths) — injective at any width
        h = F.hex(comp)
        return F.concat(_timeuuid_key(h), h)
    if t == "UUIDType":
        h = F.hex(comp)
        ver = F.substring(h, 13, 1)
        return _malformed_guard(
            comp,
            16,
            F.concat(
                ver,
                F.when(ver == "1", _timeuuid_key(h)).otherwise(F.lit("")),
                h,
            ),
        )
    raise ValueError(
        f"no JVM-side sort key for comparator {marshal}: variable-length "
        "numeric encodings (DecimalType, IntegerType) have no prefix-order-"
        "preserving hex form; use compact(name_sort_key=<udf over "
        "types.get(spec).sort_key>) instead"
    )


def composite_sort_key(
    name: Column,
    component_types: Sequence[str],
    *,
    n_extra: int = 2,
    path_types_by_column: dict[bytes, str] | None = None,
) -> Column:
    """2.x composite cell name -> order-preserving string sort key.

    ``component_types``: marshal classes of the typed leading components
    (the clustering columns for ma-mapped names). Up to ``n_extra``
    trailing components (CQL column name, collection cell path) are
    compared as raw bytes by default. Bounds with fewer components
    (range-tombstone prefixes) and the 0xFFFF static prefix are handled
    per Cassandra's composite comparator; see the module docstring for
    the encoding.

    ``path_types_by_column``: optional column-name-bytes -> marshal class
    map for the LAST extra component (the collection cell path): list
    paths compare as TimeUUIDs, set paths as the element type, map paths
    as the key type. The column-name component (second-to-last extra)
    dispatches the transform at runtime, so each collection column's
    paths order by its real comparator while everything else stays raw.

    The expression is unrolled per component — component counts above ~10
    produce very large Catalyst trees; such schemas should use the Python
    UDF fallback.
    """
    types_ = [_strip_pkg(t) for t in component_types] + ["BytesType"] * n_extra
    if len(types_) > 12:
        raise ValueError(
            f"composite_sort_key unrolls {len(types_)} components — "
            "expression too large; use the types.sort_key UDF fallback"
        )
    path_idx = len(types_) - 1 if (path_types_by_column and n_extra >= 2) else None
    name_idx = path_idx - 1 if path_idx is not None else None
    total = F.length(name)
    is_static = (total >= 2) & (
        F.hex(F.substring(name, F.lit(1), F.lit(2))) == "FFFF"
    )
    acc = F.when(is_static, F.lit("0")).otherwise(F.lit("1"))
    pos = F.when(is_static, F.lit(3)).otherwise(F.lit(1)).cast("int")
    name_comp = None
    for i, t in enumerate(types_):
        ln = _u16_at(name, pos)
        comp = F.substring(name, pos + F.lit(2), ln)
        eocb = F.coalesce(
            F.conv(
                F.hex(F.substring(name, pos + F.lit(2) + ln, F.lit(1))), 16, 10
            ).cast("int"),
            F.lit(0),
        )
        eocc = (
            F.when(eocb == 0, F.lit(_EOC_ZERO))
            .when(eocb < 128, F.lit(_EOC_PLUS))
            .otherwise(F.lit(_EOC_MINUS))
        )
        if i == name_idx:
            name_comp = comp
        if i == path_idx and name_comp is not None:
            key = type_sort_key_hex(comp, t)
            for col_name, marshal in path_types_by_column.items():
                key = F.when(
                    name_comp == F.lit(col_name),
                    type_sort_key_hex(comp, marshal),
                ).otherwise(key)
        else:
            key = type_sort_key_hex(comp, t)
        seg = F.concat(key, F.lit(_EOC_MINUS), eocc)
        has = (pos + F.lit(1)) <= total  # the u16 length prefix is present
        acc = F.when(has, F.concat(acc, seg)).otherwise(acc)
        # pos advances UNCONDITIONALLY: past the end, _u16_at coalesces to
        # 0 and `has` keeps gating the append, so correctness is
        # unaffected — but a guarded pos (when(has, ...).otherwise(pos))
        # references the previous pos tree ~5x per level instead of ~2x,
        # and the resulting ~5^n expression blow-up showed up as whole
        # seconds of analysis/codegen time per ma query
        pos = (pos + F.lit(3) + ln).cast("int")
    return acc


def comparator_sort_key(name: Column, spec: str, *, n_extra: int = 2) -> Column:
    """Sort-key column for a full comparator spec (simple or CompositeType).

    Matches ``types.get(spec).sort_key`` ordering, JVM-side. ``n_extra``
    trailing components past the declared CompositeType list (CQL column
    name, collection cell path) compare as raw bytes — dropping them
    would collapse distinct cell names to one sort key and LWW away whole
    columns; the Python ``CompositeComparator._component_at`` fallback
    compares unlimited extras, so specs whose names can exceed
    declared+2 components should use the UDF path.
    """
    s = spec.strip()
    short = _strip_pkg(s.split("(", 1)[0])
    if short == "CompositeType":
        inner = s[s.index("(") + 1 : s.rindex(")")]
        comps = _split_top_level(inner)
        return composite_sort_key(name, comps, n_extra=n_extra)
    return type_sort_key_hex(name, s)


def _split_top_level(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out
