"""Arbitrary-width big-endian integers as pure Spark SQL expressions.

Cassandra's IntegerType (varint) and DecimalType carry variable-length
big-endian two's-complement values (reference renders/compares them via
BigInteger/BigDecimal — e.g. JsonOutputFormat.java:92-106 through
AbstractType.getString). Spark's ``conv`` is exact only to 64 bits, so
anything built on it silently breaks past 8-byte unscaled values. The
helpers here digitize ANY width exactly, JVM-side, with higher-order
function folds: the lambda body is ONE Catalyst node (HOFs don't unroll
per element), so the expression tree stays small — the thing the
round-6/7 analysis-time lessons care about — at the cost of an
interpreted per-row fold (microseconds at realistic key widths).

Digitization is schoolbook short division: split the magnitude hex into
16-bit limbs and repeatedly divide the limb array by 10^9, emitting 9
decimal digits per pass (most-significant limb first, remainder carried).
With 16-bit limbs the partial dividend ``r*65536 + limb`` stays below
1e9*65536 + 65535 < 2^53, so ``(cur - cur % 10^9) / 10^9`` — an exact
multiple divided by an exactly-representable divisor — is an exact
double, and the truncating cast to long is the true quotient.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LIMB = 65536  # 16-bit limbs: 4 hex chars each
_DIV = 1_000_000_000  # 9 decimal digits per division pass

#: hex digits whose lead marks a negative two's-complement value
_NEG_LEAD = tuple("89ABCDEF")

#: minimal-form normalization: a leading 0x00 byte is redundant iff the
#: next byte is < 0x80, a leading 0xFF iff the next is >= 0x80
#: (BigInteger's minimal two's complement; numerically equal encodings
#: must collapse to one digit string)
_MINIMAL_RE = "^(?:00(?=[0-7])|FF(?=[89A-F]))+"


def is_negative_hex(h: Column) -> Column:
    """True iff the (minimal) two's-complement hex ``h`` is negative."""
    return F.substring(h, 1, 1).isin(*_NEG_LEAD)


def normalize_hex(h: Column) -> Column:
    """Strip redundant sign-extension padding (minimal form, both signs)."""
    return F.regexp_replace(h, _MINIMAL_RE, "")


def negative_mag_hex(h: Column) -> Column:
    """Magnitude hex of a NEGATIVE two's-complement hex ``h``:
    complement every digit, then string-increment (+1). The increment
    never overflows — an all-'F' complement would mean value 0, which is
    not negative — so the head (everything before the trailing 'F' run)
    is non-empty and its last digit is < 'F'."""
    compl = F.translate(h, "0123456789ABCDEF", "FEDCBA9876543210")
    tail = F.regexp_extract(compl, "F*$", 0)
    head_len = F.length(compl) - F.length(tail)
    return F.concat(
        F.substring(compl, F.lit(1), head_len - F.lit(1)),
        F.translate(
            F.substring(compl, head_len, F.lit(1)),
            "0123456789ABCDE",
            "123456789ABCDEF",
        ),
        F.translate(tail, "F", "0"),
    )


def _let(value: Column, body) -> Column:
    """Bind ``value`` once as a lambda variable (SQL has no let): every
    reference inside ``body`` is then a leaf instead of a copy of the
    value's whole expression tree. Expression-tree size is the binding
    design constraint here — an unbound ``mag_digits`` input was
    referenced ~6x internally, and under composite sort-key levels the
    compounding pushed sst_decode_varint's analysis+codegen from ~4 s to
    ~75 s (measured round 9)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def mag_digits(mh: Column) -> Column:
    """Hex string of an UNSIGNED magnitude -> exact decimal digit string
    ('0' for empty/zero input), any width. See the module docstring for
    the short-division scheme."""
    return _let(mh, _mag_digits_bound)


def _mag_digits_bound(mh: Column) -> Column:
    hexlen = F.length(mh)
    # pad to a whole number of 4-hex limbs
    pad = (F.lit(4) - hexlen % F.lit(4)) % F.lit(4)
    padded = F.concat(F.substring(F.lit("000"), F.lit(1), pad), mh)
    nlimbs = ((hexlen + pad) / F.lit(4)).cast("int")
    limbs = F.transform(
        F.sequence(F.lit(1), nlimbs),
        lambda i: F.conv(
            F.substring(padded, (i - F.lit(1)) * F.lit(4) + F.lit(1), F.lit(4)),
            16,
            10,
        ).cast("long"),
    )
    # passes needed: 9*n >= digits <= hexlen*log10(16) + 1
    n_iters = (F.ceil(hexlen * F.lit(0.134)) + F.lit(1)).cast("int")

    def _div_pass(ls: Column) -> Column:
        return F.aggregate(
            ls,
            F.struct(
                F.array().cast("array<long>").alias("q"),
                F.lit(0).cast("long").alias("r"),
            ),
            lambda a, x: F.struct(
                F.array_append(
                    a["q"],
                    (
                        (
                            (a["r"] * F.lit(_LIMB) + x)
                            - (a["r"] * F.lit(_LIMB) + x) % F.lit(_DIV)
                        )
                        / F.lit(_DIV)
                    ).cast("long"),
                ).alias("q"),
                ((a["r"] * F.lit(_LIMB) + x) % F.lit(_DIV)).alias("r"),
            ),
        )

    raw = F.aggregate(
        F.sequence(F.lit(1), n_iters),
        F.struct(limbs.alias("l"), F.lit("").alias("s")),
        lambda acc, _i: (
            lambda d: F.struct(
                d["q"].alias("l"),
                F.concat(
                    F.lpad(d["r"].cast("string"), 9, "0"), acc["s"]
                ).alias("s"),
            )
        )(_div_pass(acc["l"])),
        lambda acc: acc["s"],
    )
    stripped = F.regexp_replace(raw, "^0+", "")
    return F.when(hexlen == 0, F.lit("0")).otherwise(
        F.when(F.length(stripped) == 0, F.lit("0")).otherwise(stripped)
    )


def split_decimal(b: Column) -> tuple[Column, Column, Column]:
    """Cassandra DecimalType bytes (4-byte signed scale + any-width
    varint unscaled) -> (scale long, sign-prefix string, magnitude digit
    string). The shared extraction under the decimal render
    (render._decimal_str) and the CQL decimal compose (cql.py) — one
    place owns the scale/sign/digitization conventions. Callers that
    need the short-input (< 4 bytes) edge handle it themselves: the
    returned scale here reads the full 4-byte prefix."""
    scale = (
        (F.conv(F.hex(F.substring(b, 1, 4)), 16, 10).cast("long")
         + F.lit(1 << 31)) % F.lit(1 << 32)
    ) - F.lit(1 << 31)
    uh = normalize_hex(F.hex(F.substring(b, 5, F.lit((1 << 31) - 1))))
    neg = is_negative_hex(uh)
    digits = mag_digits(F.when(neg, negative_mag_hex(uh)).otherwise(uh))
    sign = F.when(neg & (digits != "0"), F.lit("-")).otherwise(F.lit(""))
    return scale, sign, digits


def signed_digits(h: Column) -> Column:
    """Minimal big-endian two's-complement hex -> exact signed decimal
    digit string ('-123', '0', '45'), any width. Non-minimal input is
    normalized first (equal values must render equally)."""

    def _body(nh: Column) -> Column:
        neg = is_negative_hex(nh)
        return _let(
            mag_digits(F.when(neg, negative_mag_hex(nh)).otherwise(nh)),
            lambda digits: F.concat(
                F.when(neg & (digits != "0"), F.lit("-")).otherwise(F.lit("")),
                digits,
            ),
        )

    return _let(normalize_hex(h), _body)
