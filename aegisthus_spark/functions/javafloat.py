"""Java ``Double.toString`` / ``Float.toString`` twins in pure Python.

The reference renders float-typed comparators through Cassandra's
``AbstractType.getString`` -> ``String.valueOf(float/double)``
(JsonOutputFormat.java:92-106), i.e. OpenJDK's ``FloatingDecimal`` — whose
output is NOT Python ``repr``: Java 17 picks e.g. ``9.999999999999999E22``
for 1e23 (JDK-4511638 semantics: digit generation stops on a STRICT
half-ulp window, with a shared — not binade-aware beyond the pow-2 hack —
M bound) and ``4.9E-324`` for the smallest subnormal, and formats with
``1.0E7``-style thresholds (plain form only for 0.001 <= |d| < 10^7).

This module is a faithful port of OpenJDK 17's
``FloatingDecimal.getBinaryToASCIIConverter`` + ``dtoa`` +
``toJavaFormatString`` (public GPLv2+CE source; structure re-expressed in
Python big-int arithmetic — one exact loop replaces the int/long/
FDBigInteger strategy tiers, which differ only in overflow handling that
the exact path makes moot). Ground truth for parity is the JVM itself:
``tests/test_render.py`` fuzzes these against Spark's
``cast(double/float as string)`` (Java ``toString`` under the hood) over
random bit patterns and every historical edge class.

Spark-side twin: ``cast(x as string)`` — so the JVM render expression for
FloatType/DoubleType (functions/render.py) is a plain cast, and these
functions keep ``types.Comparator.render`` in byte lockstep.
"""

from __future__ import annotations

import math
import struct

_EXP_SHIFT = 52
_FRACT_HOB = 1 << 52
_SIGNIF_MASK = _FRACT_HOB - 1
_EXP_BIAS = 1023
_MAX_SMALL_BIN_EXP = 62
_MIN_SMALL_BIN_EXP = -(63 // 3)  # -21
_SMALL_5_POW_LEN = 14  # FDBigInteger.SMALL_5_POW: 5^0 .. 5^13

_SINGLE_EXP_SHIFT = 23
_SINGLE_FRACT_HOB = 1 << 23
_SINGLE_SIGNIF_MASK = _SINGLE_FRACT_HOB - 1
_SINGLE_EXP_BIAS = 127

#: insignificantDigitsNumber[i] == number of /10 divisions of (1<<i)
#: (FloatingDecimal's precomputed table)
_INSIG = [len(str(1 << i)) - 1 for i in range(64)]


def _insignificant_digits_for_pow2(p2: int) -> int:
    if 1 < p2 < len(_INSIG):
        return _INSIG[p2]
    return 0


def _estimate_dec_exp(fract_bits: int, bin_exp: int) -> int:
    """floor-estimate of log10(d), never low, at most 1 high — the exact
    double-arithmetic sequence of FloatingDecimal.estimateDecExp (Python
    floats are IEEE doubles with correctly rounded ops, so the bits
    match)."""
    d2 = struct.unpack(
        ">d", struct.pack(">Q", 0x3FF0000000000000 | (fract_bits & _SIGNIF_MASK))
    )[0]
    d = (d2 - 1.5) * 0.289529654 + 0.176091259 + bin_exp * 0.301029995663981
    return math.floor(d)


def _develop_long_digits(dec_exponent: int, lvalue: int, insignificant: int):
    """Exact-integer digit development with round-half-up truncation of
    the insignificant tail and trailing-zero stripping — the
    developLongDigits fast path. Returns (dec_exponent, digits)."""
    if insignificant != 0:
        pow10 = 10 ** insignificant
        residue = lvalue % pow10
        lvalue //= pow10
        dec_exponent += insignificant
        if residue >= (pow10 >> 1):
            lvalue += 1
    s = str(lvalue)
    stripped = s.rstrip("0")
    if not stripped:  # lvalue was 0 (cannot happen for nonzero input)
        stripped, s = "0", "0"
    dec_exponent += len(s)
    return dec_exponent, list(stripped)


def _dtoa(bin_exp: int, fract_bits: int, n_significant_bits: int):
    """OpenJDK FloatingDecimal.dtoa: (decExponent, digits list). fract_bits
    is the 53-bit-aligned mantissa with bit 52 set; bin_exp unbiased."""
    tail_zeros = (fract_bits & -fract_bits).bit_length() - 1
    n_fract_bits = _EXP_SHIFT + 1 - tail_zeros
    n_tiny_bits = max(0, n_fract_bits - bin_exp - 1)

    if _MIN_SMALL_BIN_EXP <= bin_exp <= _MAX_SMALL_BIN_EXP:
        # N_5_BITS[i]: bit length of 5^i, with N_5_BITS[0] == 0 in the JDK
        n5bits = (5 ** n_tiny_bits).bit_length() if n_tiny_bits else 0
        if n_tiny_bits < _SMALL_5_POW_LEN and (n_fract_bits + n5bits) < 64:
            if n_tiny_bits == 0:
                if bin_exp > n_significant_bits:
                    insig = _insignificant_digits_for_pow2(
                        bin_exp - n_significant_bits - 1
                    )
                else:
                    insig = 0
                if bin_exp >= _EXP_SHIFT:
                    lv = fract_bits << (bin_exp - _EXP_SHIFT)
                else:
                    lv = fract_bits >> (_EXP_SHIFT - bin_exp)
                return _develop_long_digits(0, lv, insig)
            # nTinyBits > 0 fast path is deliberately absent in OpenJDK
            # ("causes excess digits in the single-float case") — fall
            # through to the slow path like the JDK does.

    dec_exp = _estimate_dec_exp(fract_bits, bin_exp)
    b5 = max(0, -dec_exp)
    b2 = b5 + n_tiny_bits + bin_exp
    s5 = max(0, dec_exp)
    s2 = s5 + n_tiny_bits
    m5 = b5
    m2 = b2 - n_significant_bits

    fract_bits >>= tail_zeros
    b2 -= n_fract_bits - 1
    common2 = min(b2, s2)
    b2 -= common2
    s2 -= common2
    m2 -= common2
    if n_fract_bits == 1:
        m2 -= 1  # pow-2 mantissa: the next-smaller gap is half as wide
    if m2 < 0:
        b2 -= m2
        s2 -= m2
        m2 = 0

    # The JDK picks an int, long, or FDBigInteger strategy by BIT-SIZE
    # ESTIMATES — and the int/long tiers do WRAPPING 32/64-bit signed
    # arithmetic whose b+m overflow is UNGUARDED (only m's own overflow
    # has the low=high=true hack). That overflow is observable: e.g.
    # Float.toString(0x1.ba0c68p+85f) prints 6.6800474E25 (truncated)
    # because b+m wraps negative and 'high' reads false — so the tier
    # choice and its wrap semantics are part of the spec and replicated
    # here bit-for-bit.
    def n5b(p: int) -> int:
        # the JDK's N_5_BITS table spans LONG_5_POW (5^0..5^26); beyond it
        # the estimate is the 3-bits-per-power OVERestimate — part of the
        # tier-choice spec, not an optimization detail
        if p == 0:
            return 0
        if p < 27:
            return (5 ** p).bit_length()
        return p * 3

    b_bits = n_fract_bits + b2 + n5b(b5)
    ten_s_bits = s2 + 1 + n5b(s5 + 1)

    B = fract_bits * (5 ** b5) << b2
    S = (5 ** s5) << s2
    M = (5 ** m5) << m2
    ten_s = 10 * S

    digits: list[str] = []
    dec_exp, digits, B_final, ten_s_final, high, low = _digit_loop(
        B, S, M, ten_s, dec_exp,
        width=(32 if (b_bits < 32 and ten_s_bits < 32)
               else 64 if (b_bits < 64 and ten_s_bits < 64) else 0),
    )

    low_digit_difference = (B_final << 1) - ten_s_final if (high and low) else 0
    dec_exponent = dec_exp + 1
    if high:
        if low:
            if low_digit_difference == 0:
                if (ord(digits[-1]) - 48) & 1:
                    dec_exponent = _roundup(digits, dec_exponent)
            elif low_digit_difference > 0:
                dec_exponent = _roundup(digits, dec_exponent)
        else:
            dec_exponent = _roundup(digits, dec_exponent)
    return dec_exponent, digits


def _wrap(x: int, width: int) -> int:
    half = 1 << (width - 1)
    return ((x + half) & ((1 << width) - 1)) - half


def _digit_loop(B, S, M, ten_s, dec_exp, *, width):
    """The shared digit-generation loop in the JDK's three flavors.

    width=0: FDBigInteger path — exact arithmetic, first-iteration M
    arrives pre-scaled (valueOfPow52(M5+1, M2+1) == 10*M), 'high' is
    INCLUSIVE (tenSval.addAndCmp(Bval, Mval) <= 0).
    width=32/64: int/long path — m *= 10 before the first compare,
    'high' is STRICT (b+m > tens) on WRAPPING signed arithmetic (the
    observable overflow quirk), and an overflowed m (m <= 0) forces
    low = high = true inside the loop."""
    digits: list[str] = []
    if width:
        M = _wrap(M * 10, width)
        q, B = B // S, 10 * (B % S)
        assert q < 10, q
        low = B < M
        high = _wrap(B + M, width) > ten_s
    else:
        M = M * 10
        q, B = B // S, (B % S) * 10
        assert q < 10, q
        low = B < M
        high = B + M >= ten_s
    if q == 0 and not high:
        dec_exp -= 1
    else:
        digits.append(chr(48 + q))
    if dec_exp < -3 or dec_exp >= 8:  # compatible format: E-form needs >= 2 digits
        high = low = False
    while not low and not high:
        q, B = B // S, (B % S) * 10
        assert q < 10, q
        if width:
            M = _wrap(M * 10, width)
            if M > 0:
                low = B < M
                high = _wrap(B + M, width) > ten_s
            else:
                low = True
                high = True
        else:
            M *= 10
            low = B < M
            high = B + M >= ten_s
        digits.append(chr(48 + q))
    return dec_exp, digits, B, ten_s, high, low


def _roundup(digits: list[str], dec_exponent: int) -> int:
    i = len(digits) - 1
    if digits[i] == "9":
        while digits[i] == "9" and i > 0:
            digits[i] = "0"
            i -= 1
        if digits[i] == "9":
            digits[0] = "1"  # carryout: high-order 1, rest already 0s
            return dec_exponent + 1
    digits[i] = chr(ord(digits[i]) + 1)
    return dec_exponent


def _format(is_negative: bool, dec_exponent: int, digits: list[str]) -> str:
    out = ["-"] if is_negative else []
    n = len(digits)
    if 0 < dec_exponent < 8:
        char_length = min(n, dec_exponent)
        out += digits[:char_length]
        if char_length < dec_exponent:
            out += ["0"] * (dec_exponent - char_length)
            out += [".", "0"]
        else:
            out.append(".")
            if char_length < n:
                out += digits[char_length:]
            else:
                out.append("0")
    elif -3 < dec_exponent <= 0:
        out += ["0", "."]
        if dec_exponent != 0:
            out += ["0"] * (-dec_exponent)
        out += digits
    else:
        out.append(digits[0])
        out.append(".")
        if n > 1:
            out += digits[1:]
        else:
            out.append("0")
        out.append("E")
        out.append(str(dec_exponent - 1))
    return "".join(out)


def java_double_to_string(d: float) -> str:
    """OpenJDK 17 ``Double.toString(d)``."""
    bits = struct.unpack(">Q", struct.pack(">d", d))[0]
    is_negative = bool(bits >> 63)
    fract_bits = bits & _SIGNIF_MASK
    bin_exp = (bits >> _EXP_SHIFT) & 0x7FF
    if bin_exp == 0x7FF:
        if fract_bits == 0:
            return "-Infinity" if is_negative else "Infinity"
        return "NaN"
    if bin_exp == 0 and fract_bits == 0:
        return "-0.0" if is_negative else "0.0"
    if bin_exp == 0:  # subnormal: normalize
        n_significant_bits = fract_bits.bit_length()
        shift = 53 - n_significant_bits
        fract_bits <<= shift
        bin_exp = 1 - shift
    else:
        fract_bits |= _FRACT_HOB
        n_significant_bits = _EXP_SHIFT + 1
    bin_exp -= _EXP_BIAS
    dec_exponent, digits = _dtoa(bin_exp, fract_bits, n_significant_bits)
    return _format(is_negative, dec_exponent, digits)


def java_float_to_string(f: float) -> str:
    """OpenJDK 17 ``Float.toString(f)`` — ``f`` is the float32 value (as a
    Python double holding an exactly-representable float32)."""
    bits = struct.unpack(">I", struct.pack(">f", f))[0]
    is_negative = bool(bits >> 31)
    fract_bits = bits & _SINGLE_SIGNIF_MASK
    bin_exp = (bits >> _SINGLE_EXP_SHIFT) & 0xFF
    if bin_exp == 0xFF:
        if fract_bits == 0:
            return "-Infinity" if is_negative else "Infinity"
        return "NaN"
    if bin_exp == 0 and fract_bits == 0:
        return "-0.0" if is_negative else "0.0"
    if bin_exp == 0:
        n_significant_bits = fract_bits.bit_length()
        shift = 24 - n_significant_bits
        fract_bits <<= shift
        bin_exp = 1 - shift
    else:
        fract_bits |= _SINGLE_FRACT_HOB
        n_significant_bits = _SINGLE_EXP_SHIFT + 1
    bin_exp -= _SINGLE_EXP_BIAS
    # share the double-sized dtoa: mantissa aligned to bit 52
    dec_exponent, digits = _dtoa(
        bin_exp,
        fract_bits << (_EXP_SHIFT - _SINGLE_EXP_SHIFT),
        n_significant_bits,
    )
    return _format(is_negative, dec_exponent, digits)
