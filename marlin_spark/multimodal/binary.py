"""Multimodal column plumbing: image/audio/video as opaque binary.

Design (task spec): payloads travel as `binary` columns with typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched functions over mapInPandas. The image/audio codecs are
NOT in this container, so the decode step is STUBBED — `decode_image`
raises NotImplementedError unless `fake=True`, in which case a
deterministic fake decode (derived from the bytes) exercises the full
Spark plumbing: schema, partitioning, batch shapes, metadata extraction.

At 100 TB the operative concerns are all here and real:
- binary column + metadata struct schema (no per-row Python objects),
- mapInPandas so each Arrow batch is one vectorized call,
- repartition by size bucket before decode so skewed payload sizes
  don't produce straggler tasks,
- column pruning: metadata-only queries never read payload bytes.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("checksum", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, checksum string, "
    "feat array<float>"
)


def _decode_ppm(buf: bytes) -> np.ndarray:
    """Pure-python netpbm decode: P6 (binary RGB) / P5 (binary gray).
    Returns HxWx3 / HxW uint8. No external codec libraries."""
    magic = buf[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload: {magic!r}")
    # header = magic + 3 decimal fields (w, h, maxval) separated by
    # whitespace; '#' starts a comment to end-of-line
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        fields.append(int(buf[i:j]))
        i = j
    i += 1  # exactly ONE whitespace byte separates header from raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    raster = np.frombuffer(buf, dtype=np.uint8, count=w * h * ch, offset=i)
    return raster.reshape(h, w, 3).copy() if ch == 3 else raster.reshape(h, w).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """P6 (HxWx3) / P5 (HxW) encode — the test fixture generator."""
    img = np.asarray(img, dtype=np.uint8)
    magic = b"P6" if img.ndim == 3 else b"P5"
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def _decode_bmp(buf: bytes) -> np.ndarray:
    """Pure-python BMP decode: BITMAPINFOHEADER, 24 bpp, BI_RGB only
    (the uncompressed Windows-bitmap common case). Returns HxWx3 uint8
    RGB (BMP stores BGR bottom-up with 4-byte row padding)."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (header {hdr_size}, {bpp} bpp, "
            f"compression {compression}); only 24-bit BI_RGB is implemented"
        )
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return (rgb[::-1] if flip else rgb).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# colortype -> channel count (8-bit only; palette/interlace rejected)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(buf: bytes) -> np.ndarray:
    """Pure-python PNG decode: stdlib zlib inflate + numpy unfilter
    (None/Sub/Up/Average/Paeth), 8-bit gray / gray+alpha / RGB / RGBA,
    non-interlaced. Returns HxW (gray) or HxWxC uint8. Palette images
    and 16-bit depths raise — this is the training-pipeline decode path
    for the dominant web formats, not a general imaging library."""
    import struct

    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth {depth}, colortype {ctype}, "
            "interlace {interlace}); 8-bit gray/GA/RGB/RGBA non-interlaced only"
        )
    ch = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * ch
    if raw.size != stride * h:
        raise ValueError("PNG raster size mismatch")
    rows = raw.reshape(h, stride)
    out = np.zeros((h, w * ch), dtype=np.uint8)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(w * ch, np.int64)
        if f == 0:
            cur = line
        elif f == 1:  # Sub: prefix-sum per channel (mod distributes over +)
            cur = line.reshape(w, ch).cumsum(axis=0).reshape(-1)
        elif f == 2:  # Up
            cur = line + prev
        elif f == 3:  # Average: left-dependency -> sequential scan, but
            # over plain python ints (lists) — numpy scalar indexing in
            # the loop was ~30x slower for identical arithmetic
            line_l = line.tolist()
            prev_l = prev.tolist()
            cur_l = [0] * (w * ch)
            for i in range(ch):
                cur_l[i] = (line_l[i] + (prev_l[i] >> 1)) & 0xFF
            for i in range(ch, w * ch):
                cur_l[i] = (
                    line_l[i] + ((cur_l[i - ch] + prev_l[i]) >> 1)
                ) & 0xFF
            cur = np.array(cur_l, dtype=np.int64)
        elif f == 4:  # Paeth (same list treatment; _paeth inlined)
            line_l = line.tolist()
            prev_l = prev.tolist()
            cur_l = [0] * (w * ch)
            for i in range(ch):
                # a = c = 0: the Paeth predictor reduces to b = prev[i]
                cur_l[i] = (line_l[i] + prev_l[i]) & 0xFF
            for i in range(ch, w * ch):
                a = cur_l[i - ch]
                b = prev_l[i]
                c = prev_l[i - ch]
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur_l[i] = (line_l[i] + pr) & 0xFF
            cur = np.array(cur_l, dtype=np.int64)
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = (cur & 0xFF).astype(np.uint8)
    img = out.reshape(h, w, ch)
    return img[:, :, 0].copy() if ch == 1 else img.copy()


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """PNG encode (test-fixture twin of _decode_png): 8-bit gray / GA /
    RGB / RGBA, one filter type applied to every row so tests can
    exercise each unfilter path (0 none, 1 sub, 2 up, 3 average,
    4 paeth)."""
    import struct

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = img.reshape(h, w * ch).astype(np.int64)
    lines = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, np.int64)
        if filter_type == 0:
            fl = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            fl = cur - left
        elif filter_type == 2:
            fl = cur - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            fl = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            fl = np.zeros(w * ch, np.int64)
            for i in range(w * ch):
                a = cur[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                fl[i] = cur[i] - _paeth(int(a), int(prev[i]), int(c))
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + ((fl & 0xFF).astype(np.uint8)).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy index maps — the vectorized
    shape every per-image transform here follows)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).astype(np.int64)
    xi = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[yi][:, xi].copy()


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a uint8 numpy array.

    REAL pure-python codecs: P6/P5 netpbm (_decode_ppm), 24-bit BI_RGB
    BMP (_decode_bmp), 8-bit non-interlaced PNG (_decode_png: stdlib
    zlib inflate + numpy unfilter, all five filter types), and baseline
    sequential JPEG (multimodal/jpeg.py: huffman entropy decode + numpy
    einsum IDCT, gray/4:4:4/4:2:2/4:2:0, restart markers) — no external
    libraries, proven end-to-end in tests/test_multimodal_codec.py.
    fake=True falls back to a deterministic pseudo-image (8x8x3 derived
    from the payload digest) so Spark plumbing stays testable with
    arbitrary payload bytes."""
    head = (payload or b"")[:2]
    if head in (b"P6", b"P5"):
        return _decode_ppm(payload)
    if head == b"BM":
        return _decode_bmp(payload)
    if (payload or b"")[:8] == _PNG_SIG:
        return _decode_png(payload)
    if head == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if not fake:
        raise NotImplementedError(
            "payload is not PPM/PGM/BMP/PNG/JPEG (pass fake=True for "
            "the deterministic test decode)"
        )
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return arr.reshape(8, 8, 3).copy()


def wrap_text_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table: utf-8 bytes stand in for payloads
    (the container has no real image fixtures)."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def with_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata struct — pure Catalyst, payload column prunable."""
    n = F.octet_length("payload")
    return media.withColumn(
        "meta",
        F.struct(
            n.cast("int").alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("checksum"),
            F.when(F.col("kind") == "image", (64 + n % 512).cast("int")).alias("width"),
            F.when(F.col("kind") == "image", (64 + (n * 7) % 512).cast("int")).alias("height"),
            F.when(F.col("kind") != "image", (n * 13 % 60000).cast("int")).alias("duration_ms"),
        ),
    )


def extract_features(media: DataFrame, size_buckets: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes.

    Repartitions by size bucket first (decode cost ~ payload size, so
    hashing by size bucket evens out task durations — the multimodal
    skew analog of term salting)."""
    bucketed = media.withColumn(
        "_sb", (F.octet_length("payload") % size_buckets).cast("int")
    ).repartition("_sb")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes, sums = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                img = decode_image(b, fake=True)  # real for PPM/PGM/BMP
                if img.ndim == 2:  # grayscale (P5) -> 3-channel
                    img = np.repeat(img[:, :, None], 3, axis=2)
                # "feature": per-channel means + crc-derived hash feature
                f = img.reshape(-1, 3).mean(axis=0) / 255.0
                h = (zlib.crc32(b) % 1000) / 1000.0
                feats.append(np.append(f, h).astype(np.float32))
                nbytes.append(len(b))
                sums.append(hashlib.sha256(b).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "checksum": sums,
                    "feat": feats,
                }
            )

    return bucketed.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling PLAN for video payloads: one row per planned frame
    (the decode itself is the stubbed step). Shows the explode pattern
    that turns one video row into N frame tasks without per-row Python."""
    v = media.filter(F.col("kind") == "video").withColumn(
        "duration_ms", F.col("meta.duration_ms")
    )
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
