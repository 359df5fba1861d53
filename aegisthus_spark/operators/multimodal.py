"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery here is real and tested — schema, partition-aware
batch processing via mapInPandas, Arrow batch shapes, metadata extraction.
`decode_backend='real'` decodes the self-describing uncompressed
containers with pure stdlib parsers (24-bit BMP images, 16-bit PCM WAV
audio, raw-DIB AVI video) and probes optional libraries at runtime for
everything else (PIL for images, soundfile for audio, av/cv2 for video);
`decode_backend='fake'` is the deterministic digest stand-in.

Scale notes: payloads stay opaque binary through the plan (never collected,
never stringified); per-batch decode amortizes Python overhead across Arrow
batches; feature extraction returns fixed-width vectors so downstream
similarity ops reuse the embedding operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),  # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURE_DIM = 16


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents corpus (test
    stand-in for a real binary ingest): payload = utf8 text bytes, metadata
    from the payload digest."""
    h = F.md5("text")
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 1920 + 1).alias("width"),
            (F.conv(F.substring(h, 5, 4), 16, 10).cast("int") % 1080 + 1).alias("height"),
            (F.conv(F.substring(h, 9, 4), 16, 10).cast("int") * 10).alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_fake(payload: bytes) -> list[float]:
    """Deterministic stand-in feature vector from the payload digest."""
    d = hashlib.md5(payload).digest()
    return [d[i] / 255.0 for i in range(FEATURE_DIM)]


def _decode_bmp_gray_grid(payload: bytes) -> list[float]:
    """Uncompressed 24-bit BMP -> FEATURE_DIM mean-luminance grid features
    (4x4), pure stdlib (the BMP container is a public fixed layout:
    14-byte file header, BITMAPINFOHEADER, bottom-up BGR rows padded to 4
    bytes). Deterministic; values in [0, 1]."""
    import struct as _s

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = _s.unpack_from("<I", payload, 10)
    hdr_size, width, height = _s.unpack_from("<Iii", payload, 14)
    planes, bpp = _s.unpack_from("<HH", payload, 26)
    (compression,) = _s.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0 or hdr_size < 40:
        raise ValueError("only uncompressed 24-bit BMP is stdlib-decodable")
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3
    side = 4  # 4x4 grid -> FEATURE_DIM cells
    sums = [0.0] * (side * side)
    counts = [0] * (side * side)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        base = data_off + src_y * row_stride
        gy = min(side - 1, y * side // height)
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            lum = 0.299 * r + 0.587 * g + 0.114 * b
            cell = gy * side + min(side - 1, x * side // width)
            sums[cell] += lum
            counts[cell] += 1
    return [s / c / 255.0 if c else 0.0 for s, c in zip(sums, counts)]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Reverse the per-scanline PNG filters (spec §6: None/Sub/Up/
    Average/Paeth). ``raw`` is the inflated IDAT stream: height x
    (1 filter byte + stride pixel bytes); ``bpp`` is bytes per pixel."""
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos:pos + stride])
        pos += stride
        base = y * stride
        prev = out[base - stride:base] if y else bytes(stride)
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[base:base + stride] = line
    return out


def _decode_png_gray_grid(payload: bytes) -> list[float]:
    """8-bit non-interlaced PNG (grayscale, RGB, or RGBA) -> the SAME
    FEATURE_DIM 4x4 mean-luminance grid as the BMP path, pure stdlib:
    chunk walk for IHDR/IDAT, ``zlib.decompress`` of the concatenated
    IDAT stream, per-scanline unfilter (all five spec filters), then the
    shared grid means. RGB(A) weights match BMP (ITU-R 601); grayscale
    uses the sample directly; alpha is ignored (features describe the
    color channels). Palette, 16-bit, and Adam7-interlaced PNGs raise —
    the library probe (PIL) covers those, exactly like non-BMP images."""
    import struct as _s
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    try:
        return _parse_png_gray_grid(payload, _s, zlib)
    except (zlib.error, _s.error, IndexError) as e:
        # corrupt deflate stream / lying chunk lengths: the dispatcher's
        # contract is ValueError-only (codec decides decodability) — a
        # leaked zlib/struct error would kill the whole mapInArrow job
        # instead of falling through to the library probe
        raise ValueError(f"corrupt PNG payload: {e}") from e


def _parse_png_gray_grid(payload: bytes, _s, zlib) -> list[float]:
    pos = 8
    width = height = None
    idat = bytearray()
    color_type = bit_depth = interlace = None
    while pos + 8 <= len(payload):
        (length,) = _s.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype in (b"IHDR", b"IDAT"):
            # verify the chunk CRC for the chunks we consume: bit-rot in
            # IDAT that still inflates to the expected length would
            # otherwise decode silently into wrong features instead of
            # raising and falling through to the library probe
            if pos + 12 + length > len(payload):
                raise ValueError("truncated PNG chunk")
            (crc,) = _s.unpack_from(">I", payload, pos + 8 + length)
            if zlib.crc32(ctype + data) != crc:
                raise ValueError(f"PNG {ctype.decode()} chunk CRC mismatch")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                _s.unpack_from(">IIBBBBB", data, 0)
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if bit_depth != 8 or color_type not in (0, 2, 6) or interlace != 0:
        raise ValueError(
            "only 8-bit non-interlaced grayscale/RGB/RGBA PNG is "
            "stdlib-decodable"
        )
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    pixels = _png_unfilter(raw, height, stride, bpp)
    side = 4
    sums = [0.0] * (side * side)
    counts = [0] * (side * side)
    for y in range(height):
        base = y * stride
        gy = min(side - 1, y * side // height)
        for x in range(width):
            o = base + x * bpp
            if color_type == 0:
                lum = float(pixels[o])
            else:
                r, g, b = pixels[o], pixels[o + 1], pixels[o + 2]
                lum = 0.299 * r + 0.587 * g + 0.114 * b
            cell = gy * side + min(side - 1, x * side // width)
            sums[cell] += lum
            counts[cell] += 1
    return [s / c / 255.0 if c else 0.0 for s, c in zip(sums, counts)]


def _decode_wav_envelope(payload: bytes) -> list[float]:
    """PCM WAV -> FEATURE_DIM-segment RMS envelope, pure stdlib (RIFF
    chunks, 'fmt ' + 'data', 16-bit little-endian samples).
    Deterministic; values in [0, 1]."""
    import struct as _s

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    o, bits, data = 12, None, None
    while o + 8 <= len(payload):
        cid = payload[o : o + 4]
        (clen,) = _s.unpack_from("<I", payload, o + 4)
        body = payload[o + 8 : o + 8 + clen]
        if cid == b"fmt ":
            fmt_code, _ch, _rate = _s.unpack_from("<HHI", body, 0)
            (bits,) = _s.unpack_from("<H", body, 14)
            if fmt_code != 1 or bits != 16:
                raise ValueError("only 16-bit PCM WAV is stdlib-decodable")
        elif cid == b"data":
            data = body
        o += 8 + clen + (clen & 1)  # RIFF chunks are 2-byte aligned
    if bits is None or data is None:
        raise ValueError("WAV missing fmt/data chunks")
    n = len(data) // 2
    if n == 0:
        return [0.0] * FEATURE_DIM
    samples = _s.unpack(f"<{n}h", data[: 2 * n])
    return [v / 32768.0 for v in _audio_envelope(samples, n)]


def _audio_envelope(samples, n_samples: int) -> list[float]:
    """FEATURE_DIM-segment RMS envelope with the SAME segment boundaries
    regardless of decode library (i*n//DIM slicing, never empty) — the
    stdlib WAV path and any library path must agree on identical input."""
    out = []
    for i in range(FEATURE_DIM):
        lo = i * n_samples // FEATURE_DIM
        hi = max(lo + 1, (i + 1) * n_samples // FEATURE_DIM)
        seg = samples[lo:hi]
        out.append((sum(s * s for s in seg) / len(seg)) ** 0.5)
    return out


def _decode_avi_luma_envelope(payload: bytes) -> list[float]:
    """Uncompressed AVI ('00db'/'00dc' raw-DIB frames) -> FEATURE_DIM
    temporal envelope of per-frame mean luminance, pure stdlib (the AVI
    container is public RIFF: LIST('hdrl' avih ...) carries dwWidth/
    dwHeight at offsets 32/36 of the avih body, LIST('movi') carries the
    frame chunks; frames are bottom-up BGR24 rows padded to 4 bytes,
    same pixel layout as BMP). Deterministic; values in [0, 1]."""
    import struct as _s

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    width = height = None
    bit_count = compression = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, bit_count, compression
        o = lo
        while o + 8 <= hi:
            cid = payload[o : o + 4]
            (clen,) = _s.unpack_from("<I", payload, o + 4)
            body_lo, body_hi = o + 8, min(o + 8 + clen, hi)
            if cid == b"LIST":
                walk(body_lo + 4, body_hi)  # skip the list-type fourcc
            elif cid == b"avih":
                width, height = _s.unpack_from("<ii", payload, body_lo + 32)
            elif cid == b"strf" and bit_count is None and clen >= 20:
                # first stream's BITMAPINFOHEADER: the codec lives here,
                # not in the container magic — a compressed-AVI payload
                # must reject so the caller can try a codec library
                bit_count, compression = _s.unpack_from(
                    "<HI", payload, body_lo + 14
                )
            elif cid[:2] != b"00" and cid[2:4] in (b"db", b"dc") and clen:
                # a second video stream ('01db'...) would interleave into
                # one envelope and validate against stream 0's strf only —
                # reject so the caller's codec-library probe handles it
                raise ValueError(
                    "multi-video-stream AVIs are not stdlib-decodable"
                )
            elif cid[:2] == b"00" and cid[2:4] in (b"db", b"dc") and clen:
                frames.append(payload[body_lo:body_hi])
            o += 8 + clen + (clen & 1)  # RIFF chunks are 2-byte aligned

    walk(12, len(payload))
    if not width or not height or not frames:
        raise ValueError("AVI missing avih header or frame chunks")
    if bit_count is not None and (bit_count != 24 or compression != 0):
        raise ValueError(
            "only uncompressed BGR24 DIB frames are stdlib-decodable"
        )
    row_stride = (width * 3 + 3) & ~3
    if any(len(f) < row_stride * abs(height) for f in frames):
        raise ValueError("only uncompressed BGR24 DIB frames are "
                         "stdlib-decodable")
    means = []
    for f in frames:
        total = 0.0
        for y in range(abs(height)):
            base = y * row_stride
            for x in range(width):
                b, g, r = f[base + 3 * x : base + 3 * x + 3]
                total += 0.299 * r + 0.587 * g + 0.114 * b
        means.append(total / (width * abs(height)) / 255.0)
    return _video_envelope(means)


def _video_envelope(frame_means: list[float]) -> list[float]:
    """FEATURE_DIM temporal buckets of per-frame mean luminance with the
    SAME bucket boundaries regardless of decode library (i*n//DIM
    slicing, never empty) — the stdlib AVI path and any library path
    must agree on identical frame streams."""
    n = len(frame_means)
    if n == 0:
        return [0.0] * FEATURE_DIM
    out = []
    for i in range(FEATURE_DIM):
        lo = i * n // FEATURE_DIM
        hi = max(lo + 1, (i + 1) * n // FEATURE_DIM)
        seg = frame_means[lo:hi]
        out.append(sum(seg) / len(seg))
    return out


def _decode_video_library(payload: bytes) -> list[float]:
    """Non-AVI video through a runtime-probed codec library: PyAV first
    (in-memory), OpenCV second (needs a temp file). Each frame reduces
    to its mean gray level in [0, 1], then the shared _video_envelope."""
    try:
        import io

        import av  # type: ignore

        with av.open(io.BytesIO(payload)) as container:
            means = [
                float(frame.to_ndarray(format="gray").mean()) / 255.0
                for frame in container.decode(video=0)
            ]
        return _video_envelope(means)
    except ImportError:
        pass
    try:
        import os
        import tempfile

        import cv2  # type: ignore

        fd, tmp = tempfile.mkstemp(suffix=".video")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(payload)
            cap = cv2.VideoCapture(tmp)
            means = []
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
                means.append(float(gray.mean()) / 255.0)
            cap.release()
        finally:
            os.unlink(tmp)
        if not means:
            # VideoCapture signals unreadable input by returning no
            # frames; an all-zero fabricated envelope must not flow
            # into downstream dedup/stats (the av path raises here)
            raise ValueError("cv2 decoded no frames — corrupt or "
                             "unsupported video payload")
        return _video_envelope(means)
    except ImportError:
        pass
    raise ValueError(
        "payload is not stdlib-decodable video (uncompressed raw-DIB AVI "
        "only) and no video library is installed (probe order: av, cv2)"
    )


def _decode_real(payload: bytes, media_type: str) -> list[float]:
    """Real codec path. DETERMINISM RULE: the self-describing stdlib-
    parseable containers (24-bit BMP, 8-bit non-interlaced PNG via zlib +
    unfilter, 16-bit PCM WAV) ALWAYS take the stdlib parsers — never an
    installed library — so the same payload yields the same features on
    every host (PIL's resize resampling and rounded 'L' conversion differ
    from exact box means). Installed libraries extend coverage to OTHER
    formats only (JPEG / exotic PNG shapes via PIL, FLAC/OGG via
    soundfile), where there is a single defined path per host class. The
    Spark-side plumbing (mapInArrow batching, schema, partition
    preservation) is identical to the fake backend's."""
    if media_type == "image":
        if payload[:2] == b"BM":
            return _decode_bmp_gray_grid(payload)
        if payload[:8] == _PNG_MAGIC:
            try:
                return _decode_png_gray_grid(payload)
            except ValueError:
                # PNG container but a non-stdlib shape (palette, 16-bit,
                # Adam7): the codec decides decodability, not the magic —
                # fall through to the library probe like MJPEG-in-AVI
                pass
        try:
            import io

            from PIL import Image  # type: ignore
        except ImportError:
            raise ValueError(
                "payload is not stdlib-decodable (uncompressed 24-bit BMP "
                "or 8-bit non-interlaced gray/RGB/RGBA PNG) and no image "
                "library is installed"
            )
        img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
        return [p / 255.0 for p in img.getdata()]
    if media_type == "audio":
        if payload[:4] == b"RIFF":
            return _decode_wav_envelope(payload)
        try:
            import io

            import soundfile as sf  # type: ignore
        except ImportError:
            raise ValueError(
                "not a WAV payload and no audio library installed — "
                "stdlib decode covers 16-bit PCM WAV only"
            )
        samples, _rate = sf.read(io.BytesIO(payload), dtype="float64")
        if samples.ndim > 1:
            samples = samples.mean(axis=1)
        return [min(1.0, v) for v in _audio_envelope(list(samples), len(samples))]
    if media_type == "video":
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            try:
                return _decode_avi_luma_envelope(payload)
            except ValueError:
                # AVI container but not raw-DIB frames (e.g. MJPEG-in-
                # AVI): the codec decides decodability, not the
                # container magic — fall through to the library probe
                pass
        return _decode_video_library(payload)
    raise ValueError(f"unknown media_type={media_type!r}")


def extract_features(media: DataFrame, *, decode_backend: str = "fake") -> DataFrame:
    """media -> (media_id, media_type, feature: array<float>).

    Runs the codec in Arrow-batched Python (the one place Python is
    unavoidable), preserving input partitioning — no shuffle. ``mapInArrow``
    rather than ``mapInPandas``: the payload is an opaque binary column, and
    pandas object-dtype conversion of binaries dominates per-batch cost;
    RecordBatches pass the id/type columns through untouched and the
    feature lists build as one flat float64 buffer + offsets.
    """
    # doubles end-to-end: the fake codec's d/255 values survive exactly,
    # keeping results bit-reproducible across engines (a float32 feature
    # column would round-trip through ~6e-8 error and flip 6-dp rounding)
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ])

    def run(batches) -> Iterator["pa.RecordBatch"]:
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            payloads = batch.column("payload").to_pylist()
            n = len(payloads)
            if decode_backend == "fake":
                # vectorized: md5 digests concatenated -> one flat buffer
                digests = b"".join(hashlib.md5(p).digest() for p in payloads)
                flat = np.frombuffer(digests, np.uint8).astype(np.float64) / 255.0
            else:
                types_ = batch.column("media_type").to_pylist()
                rows = [_decode_real(p, t) for p, t in zip(payloads, types_)]
                flat = np.asarray([x for r in rows for x in r], np.float64)
            offsets = np.arange(n + 1, dtype=np.int32) * FEATURE_DIM
            feature = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
            yield pa.RecordBatch.from_arrays(
                [batch.column("media_id"), batch.column("media_type"), feature],
                names=["media_id", "media_type", "feature"],
            )

    return media.select("media_id", "media_type", "payload").mapInArrow(
        run, out_schema
    )


def frame_sample_plan(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) —
    pure relational expansion (explode of a sequence), decode deferred to
    extract_features on the sliced payloads."""
    vids = media.filter(F.col("media_type") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata rollup — proves metadata stays queryable while the
    payload remains opaque."""
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max("meta.width").alias("max_width"),
            F.max("meta.duration_ms").alias("max_duration_ms"),
        )
        .orderBy("media_type")
    )


def thumbnail_plan(media: DataFrame, *, box: int = 256) -> DataFrame:
    """Aspect-preserving resize plan for image payloads.

    Pure relational arithmetic over the typed metadata — target dimensions
    computed with integer math (identical in any engine), the actual pixel
    resample deferred to the Arrow-batched codec stage exactly like
    ``extract_features`` (the image backend is env-gated). ``needs_resize``
    marks images already inside the box, which a pipeline skips entirely —
    metadata-only pruning before any payload byte is touched.
    """
    imgs = media.filter(F.col("media_type") == "image")
    w, h = F.col("meta.width"), F.col("meta.height")
    long_side = F.greatest(w, h)
    tw = F.when(long_side <= box, w).otherwise((w * box).cast("long") / long_side)
    th = F.when(long_side <= box, h).otherwise((h * box).cast("long") / long_side)
    return imgs.select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.floor(tw).cast("int").alias("target_width"),
        F.floor(th).cast("int").alias("target_height"),
        (long_side > box).alias("needs_resize"),
    ).orderBy("media_id")


def phash_near_dupes(
    feats: DataFrame,
    *,
    band_bits: int = 4,  # retained for API compatibility; superseded by
    # the exact radius multi-probe below (results are identical)
    max_hamming: int = 2,
) -> DataFrame:
    """(a, b, hamming): near-duplicate media pairs by perceptual-hash-style
    signatures over the decoded feature vectors — the image-dedup stage of
    a multimodal pipeline (pHash/aHash family: bit i = feature i above the
    item's own mean, so the signature is invariant to global
    brightness/gain shifts).

    Scale shape — EXACT radius multi-probe (round 10; replaces banding):
    with dim-bit signatures and a small radius, every sig within Hamming
    distance <= max_hamming of s is s XOR one of C(dim, <=r) constant
    masks, so the left side explodes its |masks| probe keys and candidates
    come from ONE equi-join on the FULL signature — 2^dim buckets instead
    of 2^band_bits per band. Every join hit IS a result (no Hamming
    re-verify shuffle, no distinct: an unordered pair matches exactly once
    under a < b), so join output == answer size. The old 4-bit banding had
    16 buckets/band: ~n^2/8 candidate pairs regardless of n — measured
    316M candidates at 50k docs vs ~5M join rows on this path (the ~2.6M
    true pairs are the data's own near-dup density: 16-bit signatures
    saturate, so OUTPUT grows ~n^2 * 137/2^16 by nature — blocking cost no
    longer dominates it). Banding (the classic pigeonhole split into
    max_hamming+1 bands) remains the fallback when the mask count would
    explode (dim >= 64 with radius >= 3). The mean fold and comparisons
    are strict left folds over doubles, so a SQL oracle reproduces every
    signature bit; the candidate STRATEGY is invisible to results — both
    paths return exactly the Hamming <= max_hamming pairs.
    """
    import itertools

    dim = FEATURE_DIM
    mean = f"aggregate(feature, cast(0 as double), (a, x) -> a + x) / {float(dim)!r}"
    bits = " + ".join(
        f"(case when element_at(feature, {i + 1}) > _m then {1 << i} else 0 end)"
        for i in range(dim)
    )
    sigs = feats.withColumn("_m", F.expr(mean)).select(
        "media_id", F.expr(bits).alias("sig")
    )
    masks = [0]
    for r in range(1, max_hamming + 1):
        for combo in itertools.combinations(range(dim), r):
            masks.append(sum(1 << i for i in combo))
    if len(masks) <= 4096:
        masks_sql = "array(" + ",".join(map(str, masks)) + ")"
        probes = sigs.select(
            F.col("media_id").alias("a"),
            F.col("sig").alias("sa"),
            F.explode(F.expr(f"transform({masks_sql}, m -> sig ^ m)")).alias("key"),
        )
        right = sigs.select(
            F.col("media_id").alias("b"), F.col("sig").alias("sb")
        )
        return (
            probes.join(right, probes["key"] == right["sb"])
            .filter(F.col("a") < F.col("b"))
            .select(
                "a", "b", F.expr("bit_count(sa ^ sb)").alias("hamming")
            )
            .orderBy("a", "b")
        )
    # fallback: pigeonhole banding — max_hamming+1 near-equal bands (a
    # pair within radius leaves at least one band untouched), the widest
    # keys the guarantee allows
    n_bands = max_hamming + 1
    bounds = [round(i * dim / n_bands) for i in range(n_bands + 1)]
    bands = sigs.select(
        "media_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"shiftright(sig, {bounds[b]}) & "
                            f"{(1 << (bounds[b + 1] - bounds[b])) - 1}"
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = bands.select(
        F.col("media_id").alias("a"), F.col("sig").alias("sa"), "band", "key"
    )
    right = bands.select(
        F.col("media_id").alias("b"), F.col("sig").alias("sb"), "band", "key"
    )
    # Hamming verify BEFORE the distinct: only surviving pairs pay the
    # dedup shuffle
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("hamming", F.expr("bit_count(sa ^ sb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
        .orderBy("a", "b")
    )
