"""Property/fuzz parity for the LZ4 and Snappy block decoders.

Same rationale as test_cparse_fuzz: the C decoders (sstable/_scan.c)
decompress every chunk of every compressed table at scale, and the
pure-Python decoders are the fallback — a divergence between them, or a
silent out-of-bounds read, is data corruption. Valid blocks are BUILT
from (literal, match) op sequences — which also computes the expected
plaintext independently of any decoder — then both decoders must
reproduce it exactly; corrupted blocks must error in BOTH.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aegisthus_spark.sstable import cparse
from aegisthus_spark.sstable.compression import (
    lz4_block_decompress,
    snappy_decompress,
)

_SETTINGS = settings(
    max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


# ---------------------------------------------------------------------------
# op-sequence strategies: (expected_plaintext, encoded_block)
# ---------------------------------------------------------------------------


@st.composite
def lz4_ops(draw):
    """Build a valid LZ4 block: sequences of literals + matches; the final
    sequence is literals-only (per the block format)."""
    out = bytearray()
    enc = bytearray()
    n_seq = draw(st.integers(min_value=0, max_value=6))
    for _ in range(n_seq):
        lit = draw(st.binary(min_size=0, max_size=40))
        # a match needs a non-empty decoded prefix
        if len(out) + len(lit) == 0:
            lit = draw(st.binary(min_size=1, max_size=40))
        prefix_len = len(out) + len(lit)
        offset = draw(st.integers(min_value=1, max_value=prefix_len))
        mlen = draw(st.integers(min_value=4, max_value=60))

        lit_n = len(lit)
        tok_lit = min(lit_n, 15)
        tok_m = min(mlen - 4, 15)
        enc.append((tok_lit << 4) | tok_m)
        if tok_lit == 15:
            rem = lit_n - 15
            while rem >= 255:
                enc.append(255)
                rem -= 255
            enc.append(rem)
        enc += lit
        enc += offset.to_bytes(2, "little")
        if tok_m == 15:
            rem = mlen - 4 - 15
            while rem >= 255:
                enc.append(255)
                rem -= 255
            enc.append(rem)

        out += lit
        mstart = len(out) - offset
        for k in range(mlen):  # overlap-correct byte semantics
            out.append(out[mstart + k])
    # trailing literals-only sequence
    tail = draw(st.binary(min_size=0, max_size=40))
    tok_lit = min(len(tail), 15)
    enc.append(tok_lit << 4)
    if tok_lit == 15:
        rem = len(tail) - 15
        while rem >= 255:
            enc.append(255)
            rem -= 255
        enc.append(rem)
    enc += tail
    out += tail
    return bytes(out), bytes(enc)


def _snappy_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


@st.composite
def snappy_ops(draw):
    """Build a valid Snappy raw block from literal/copy elements."""
    out = bytearray()
    body = bytearray()
    n_el = draw(st.integers(min_value=1, max_value=8))
    for _ in range(n_el):
        if not out or draw(st.booleans()):
            lit = draw(st.binary(min_size=1, max_size=80))
            ln = len(lit)
            if ln <= 60:
                body.append((ln - 1) << 2)
            else:
                body.append(61 << 2)  # 1-byte extra length
                body.append(ln - 1)
            body += lit
            out += lit
        else:
            off = draw(st.integers(min_value=1, max_value=len(out)))
            kind = draw(st.sampled_from([1, 2, 4]))
            if kind == 1:
                ln = draw(st.integers(min_value=4, max_value=11))
                off1 = min(off, 2047)
                body.append(((off1 >> 8) << 5) | ((ln - 4) << 2) | 1)
                body.append(off1 & 0xFF)
                off = off1
            elif kind == 2:
                ln = draw(st.integers(min_value=1, max_value=64))
                off2 = min(off, 65535)
                body.append(((ln - 1) << 2) | 2)
                body += off2.to_bytes(2, "little")
                off = off2
            else:
                ln = draw(st.integers(min_value=1, max_value=64))
                body.append(((ln - 1) << 2) | 3)
                body += off.to_bytes(4, "little")
            mstart = len(out) - off
            for k in range(ln):
                out.append(out[mstart + k])
    return bytes(out), _snappy_varint(len(out)) + bytes(body)


# ---------------------------------------------------------------------------
# parity properties
# ---------------------------------------------------------------------------

_HAS_C = cparse.available()


@given(lz4_ops())
@_SETTINGS
def test_lz4_valid_parity(case):
    want, block = case
    got_py = lz4_block_decompress(block, len(want))
    assert got_py == want
    if _HAS_C:
        assert cparse.lz4_decompress(block, len(want)) == want


@given(snappy_ops())
@_SETTINGS
def test_snappy_valid_parity(case):
    want, block = case
    got_py = snappy_decompress(block)
    assert got_py == want
    if _HAS_C:
        assert cparse.snappy_decompress(block, len(want)) == want


@given(case=lz4_ops(), pos=st.integers(min_value=0, max_value=1 << 30),
       bit=st.integers(min_value=0, max_value=7))
@_SETTINGS
def test_lz4_corrupt_agreement(case, pos, bit):
    """Bit-flipped blocks: both decoders produce the SAME bytes or BOTH
    reject (ValueError). A silent one-sided success is corruption."""
    want, block = case
    if not block:
        return
    b = bytearray(block)
    b[pos % len(b)] ^= 1 << bit
    b = bytes(b)
    try:
        got_py = lz4_block_decompress(b, len(want))
        py_ok = True
    except ValueError:
        py_ok = False
    if not _HAS_C:
        return
    try:
        got_c = cparse.lz4_decompress(b, len(want))
        c_ok = True
    except ValueError:
        c_ok = False
    assert py_ok == c_ok, f"corrupt-disagreement at {pos % len(b)} bit {bit}"
    if py_ok:
        assert got_py == got_c


@given(case=snappy_ops(), cut=st.integers(min_value=1, max_value=1 << 30))
@_SETTINGS
def test_snappy_truncation_agreement(case, cut):
    want, block = case
    trunc = block[: len(block) - 1 - (cut % len(block))]
    try:
        got_py = snappy_decompress(trunc)
        py_ok = True
    except ValueError:
        py_ok = False
    if not _HAS_C:
        return
    try:
        got_c = cparse.snappy_decompress(trunc, len(want))
        c_ok = True
    except ValueError:
        c_ok = False
    # NB the C wrapper knows the expected length up front, so a truncated
    # block that still decodes to a SHORTER valid stream errors on length
    # in both (python checks di != ulen; wrapper checks wrote != expected)
    assert py_ok == c_ok
    if py_ok:
        assert got_py == got_c


def test_lz4_bad_offset_rejected():
    """Regression: a match offset beyond the decoded prefix used to hit
    Python negative indexing and silently read from the END of the
    buffer."""
    # literals "ab", then a match with offset 9 (> prefix 2)
    block = bytes([0x2F, ord("a"), ord("b"), 9, 0]) + bytes([0])
    with pytest.raises(ValueError):
        lz4_block_decompress(block, 25)
    if _HAS_C:
        with pytest.raises(ValueError):
            cparse.lz4_decompress(block, 25)
