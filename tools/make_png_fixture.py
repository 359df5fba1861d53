"""Generate the PNG decode fixture + golden (round-11).

Writes tests/fixtures/png/media.parquet — 60 stdlib-encodable PNG
payloads covering color types 0 (gray) / 2 (RGB) / 6 (RGBA), all five
scanline filters (each row's filter type cycles y % 5, so Sub/Up/
Average/Paeth unfiltering is genuinely exercised, not just filter 0),
and uneven dimensions (8x8, 16x16, 20x12, 9x7 — grid cells with
non-power-of-two pixel counts) — and tests/golden/png_features.parquet,
the expected FEATURE_DIM gray-grid features.

Freeze discipline (same as the bti/rt-storm fixtures): the golden is
computed HERE from the raw pixel arrays with the shared grid-mean
formula — never by running the PNG decoder — so a decoder bug (wrong
unfilter arithmetic, wrong stride, wrong channel weights) shows up as a
CORRECTNESS mismatch instead of self-certifying. The PNG bytes are
assembled field-by-field from the public spec (RFC 2083): signature,
IHDR, one zlib-deflated IDAT of filtered scanlines, IEND.

Re-run only when the fixture content deliberately changes."""

from __future__ import annotations

import os
import struct
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aegisthus_spark.operators.multimodal import FEATURE_DIM  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(ROOT, "tests", "fixtures", "png", "media.parquet")
GOLDEN = os.path.join(ROOT, "tests", "golden", "png_features.parquet")


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)


def _filter_line(line: bytes, prev: bytes, ftype: int, bpp: int) -> bytes:
    """FORWARD-apply PNG filter ``ftype`` (the encoder side of the
    decoder's _png_unfilter)."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def encode_png(pixels: np.ndarray, color_type: int) -> bytes:
    """pixels: uint8 array (h, w) for gray or (h, w, ch) for RGB/RGBA."""
    h, w = pixels.shape[:2]
    bpp = 1 if pixels.ndim == 2 else pixels.shape[2]
    raw = bytearray()
    prev = bytes(w * bpp)
    for y in range(h):
        line = bytes(pixels[y].reshape(-1))
        ftype = y % 5
        raw += bytes([ftype]) + _filter_line(line, prev, ftype, bpp)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def expected_features(pixels: np.ndarray) -> list[float]:
    """Grid means straight from the RAW pixels — the feature definition,
    loop-for-loop the same arithmetic as the BMP path, independent of any
    PNG bytes."""
    h, w = pixels.shape[:2]
    side = 4
    sums = [0.0] * (side * side)
    counts = [0] * (side * side)
    for y in range(h):
        gy = min(side - 1, y * side // h)
        for x in range(w):
            if pixels.ndim == 2:
                lum = float(pixels[y, x])
            else:
                r, g, b = (int(pixels[y, x, 0]), int(pixels[y, x, 1]),
                           int(pixels[y, x, 2]))
                lum = 0.299 * r + 0.587 * g + 0.114 * b
            cell = gy * side + min(side - 1, x * side // w)
            sums[cell] += lum
            counts[cell] += 1
    return [s / c / 255.0 if c else 0.0 for s, c in zip(sums, counts)]


def main() -> None:
    rng = np.random.default_rng(1109)
    dims = [(8, 8), (16, 16), (20, 12), (9, 7)]
    rows = []
    for i in range(60):
        w, h = dims[i % len(dims)]
        ctype = (0, 2, 6)[i % 3]
        ch = {0: None, 2: 3, 6: 4}[ctype]
        shape = (h, w) if ch is None else (h, w, ch)
        pixels = rng.integers(0, 256, size=shape, dtype=np.uint8)
        rows.append((i, encode_png(pixels, ctype), expected_features(pixels)))

    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], pa.int64()),
                "media_type": pa.array(["image"] * len(rows), pa.string()),
                "payload": pa.array([r[1] for r in rows], pa.binary()),
            }
        ),
        FIXTURE,
    )
    feats = [r[2] for r in rows]
    assert all(len(f) == FEATURE_DIM for f in feats)
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], pa.int64()),
                "media_type": pa.array(["image"] * len(rows), pa.string()),
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        ),
        GOLDEN,
    )
    print(f"wrote {FIXTURE} ({len(rows)} payloads) and {GOLDEN}")


if __name__ == "__main__":
    main()
