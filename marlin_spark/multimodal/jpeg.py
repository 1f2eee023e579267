"""Baseline JPEG codec in pure python + numpy (no external imaging libs).

Retires the last compressed-codec stub in decode_image (reference analog:
marlin stores opaque document payloads; a training-data pipeline over a
multimodal corpus must decode them executor-side — SURVEY.md multimodal
section). Scope is baseline sequential DCT, 8-bit, JFIF:

  decode_jpeg : SOI/APPn/COM/DQT/DHT/SOF0/DRI/SOS/RSTn/EOI, 1- or
                3-component scans, any sampling factors up to 2x2
                (4:4:4, 4:2:2, 4:2:0), restart markers, odd dimensions.
  encode_jpeg : fixture twin — standard Annex K tables scaled by a
                libjpeg-convention quality knob, 4:4:4 or 4:2:0.

The entropy (huffman) layer is per-symbol python — acceptable because it
runs inside the Arrow-batched mapInPandas image stage where each payload
is independent (embarrassingly parallel across executors; cost is
per-image CPU, not a shuffle). Everything after entropy decode —
dequantize, dezigzag, IDCT, upsample, color convert — is vectorized
numpy over all blocks of a component at once (einsum 2-D DCT).

Spec-correctness is pinned three ways in tests/test_multimodal_codec.py:
round-trip PSNR against the encoder twin, an independently hand-computed
entropy-segment byte for the flat-gray block (huffman construction + bit
order checked against ITU T.81 Annex K without trusting the decoder),
and structural marker parses.
"""
from __future__ import annotations

import struct
from functools import lru_cache
from typing import Iterator

import numpy as np

# ---------------------------------------------------------------- tables
# ITU T.81 Annex K.1/K.2 — the "typical" quantization tables (quality 50).
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 huffman specs: (BITS[1..16], HUFFVAL).
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Zigzag order: _ZIGZAG[i] = raster index of the i-th zigzag coefficient.
def _zigzag_order() -> np.ndarray:
    # T.81 figure 5: within diagonal d=row+col, odd diagonals walk row
    # ascending ((0,1),(1,0)), even diagonals row descending.
    order = sorted(
        ((x, y) for x in range(8) for y in range(8)),
        key=lambda p: (p[0] + p[1],
                       p[0] if (p[0] + p[1]) % 2 else p[1]),
    )
    return np.array([x * 8 + y for x, y in order], dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# 8-point DCT-II basis matrix C: dct2(B) = C @ B @ C.T ; idct2 = C.T @ X @ C.
_k = np.arange(8)
_DCT_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_DCT_M[0, :] *= 1 / np.sqrt(2)


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical per T.81 C.2."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) — encoder direction."""
    return {v: (c, ln) for (ln, c), v in _build_huffman(bits, vals).items()}


# ---------------------------------------------------------------- decode
class _BitReader:
    """MSB-first reader over a destuffed entropy segment."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG scan")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to a signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


@lru_cache(maxsize=64)
def _huffman_lut(bits_b: bytes, vals_b: bytes) -> tuple:
    """Flat 2^16 lookup: the next 16 bits of the stream -> packed
    (symbol << 8 | code_length), 0 for invalid prefixes.

    Baseline huffman codes are <= 16 bits, so indexing one 16-bit peek
    replaces the bit-by-bit dict walk of _BitReader.decode — same
    symbols, ~10x fewer python ops per symbol. Keyed on the raw DHT
    (bits, vals) payload and lru-cached: virtually every JPEG ships the
    T.81 Annex K tables, so the build cost is paid once per session,
    not per image (static table-derived data, nothing input-dependent)."""
    table = _build_huffman(list(bits_b), list(vals_b))
    lut = np.zeros(1 << 16, dtype=np.int32)
    for (ln, code), sym in table.items():
        start = code << (16 - ln)
        lut[start:start + (1 << (16 - ln))] = (sym << 8) | ln
    return tuple(lut.tolist())


def _entropy_segments(scan: bytes) -> Iterator[bytes]:
    """Destuffed entropy intervals split on RSTn markers.

    Vectorized: only 0xFF positions (rare in entropy data) are visited
    in python; plain bytes are carried by numpy slices. Semantics match
    the old byte-loop exactly — FF 00 keeps the FF and drops the 00,
    FF D0..D7 ends a segment, any other FF-marker (or trailing FF) ends
    the scan."""
    arr = np.frombuffer(scan, dtype=np.uint8)
    n = len(arr)
    seg_start = 0
    stuffed: list[int] = []  # absolute positions of stuffing 0x00 bytes

    def _emit(a: int, b: int) -> bytes:
        if not stuffed:
            return arr[a:b].tobytes()
        mask = np.ones(b - a, dtype=bool)
        mask[np.asarray(stuffed) - a] = False
        out = arr[a:b][mask].tobytes()
        stuffed.clear()
        return out

    skip_until = 0  # resume point after a consumed FF-pair
    for p in np.flatnonzero(arr == 0xFF).tolist():
        if p < skip_until:
            continue
        nxt = int(arr[p + 1]) if p + 1 < n else 0xD9
        if nxt == 0x00:
            stuffed.append(p + 1)
            skip_until = p + 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            yield _emit(seg_start, p)
            seg_start = p + 2
            skip_until = p + 2
        else:  # EOI or next marker — scan is over
            yield _emit(seg_start, p)
            return
    yield _emit(seg_start, n)


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF payload to uint8 (H,W) or (H,W,3)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}  # (class, id) -> 2^16 LUT
    frame = None  # (h, w, comps) ; comps: [(cid, hs, vs, tq)]
    restart_interval = 0
    i = 2
    scan_info = None
    while i < len(buf):
        if buf[i] != 0xFF:
            i += 1
            continue
        marker = buf[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", buf[i:i + 2])
        seg = buf[i + 2:i + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tab = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    tab = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                qt[tq] = tab  # zigzag order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                huff[(tc, th)] = _huffman_lut(bytes(bits), bytes(vals))
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type 0xFF{marker:02X} "
                "(only baseline sequential SOF0/SOF1)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                sel.append((cs, tdta >> 4, tdta & 15))
            scan_info = (sel, buf[i + seg_len:])
            break
        # APPn / COM / others: skip
        i += seg_len
    if frame is None or scan_info is None:
        raise ValueError("JPEG missing SOF0 or SOS")

    h, w, comps = frame
    sel, scan = scan_info
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c[0]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in sel]
    tabs = {cs: (td, ta) for cs, td, ta in sel}

    n_mcu = mcux * mcuy
    # coefficient rows accumulate as plain python lists (a [0]*64 store
    # is several times cheaper than a numpy scalar __setitem__) and are
    # converted to one int32 matrix per component at the end
    coef_rows: dict[int, list] = {
        c[0]: [None] * (n_mcu * c[1] * c[2]) for c in comps
    }
    # LUT entropy decode: per (huffman symbol + value bits) pair, ONE
    # 6-byte window fetch + ONE table index, instead of up to 16
    # read-a-bit/dict-probe rounds (the per-symbol python loop flagged
    # in round 5). Symbol stream, predictors and coefficients are
    # byte-identical to the _BitReader path (pinned by the codec tests;
    # the old reader zero-fills past the segment end — the padding and
    # the short-chunk branch below reproduce that exactly). EXTEND
    # (T.81 F.2.2.1) is inlined: v - (1 << t) + 1 when the sign bit is
    # clear, the same mapping _extend computes.
    segments = _entropy_segments(scan)
    data = next(segments) + b"\x00" * 8
    pos = 0
    pred = {c[0]: 0 for c in comps}
    seg_mcus = restart_interval or n_mcu
    from_bytes = int.from_bytes
    for m in range(n_mcu):
        if m and m % seg_mcus == 0:
            data = next(segments) + b"\x00" * 8
            pos = 0
            pred = {c[0]: 0 for c in comps}
        for cid, hs, vs, _tq in order:
            dc_lut = huff[(0, tabs[cid][0])]
            ac_lut = huff[(1, tabs[cid][1])]
            rows_c = coef_rows[cid]
            pred_c = pred[cid]
            base = m * hs * vs
            for _blk in range(hs * vs):
                row = [0] * 64
                rows_c[base + _blk] = row
                idx = pos >> 3
                chunk = data[idx:idx + 6]
                if len(chunk) < 6:  # deep in the zero-fill tail
                    chunk = chunk + b"\x00" * (6 - len(chunk))
                window = (from_bytes(chunk, "big") >> (16 - (pos & 7))) & 0xFFFFFFFF
                e = dc_lut[window >> 16]
                if e == 0:
                    raise ValueError("invalid huffman code in JPEG scan")
                ln = e & 0xFF
                t = e >> 8
                pos += ln + t
                if t:
                    v = (window >> (32 - ln - t)) & ((1 << t) - 1)
                    pred_c += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
                row[0] = pred_c
                k = 1
                while k < 64:
                    idx = pos >> 3
                    chunk = data[idx:idx + 6]
                    if len(chunk) < 6:
                        chunk = chunk + b"\x00" * (6 - len(chunk))
                    window = (
                        from_bytes(chunk, "big") >> (16 - (pos & 7))
                    ) & 0xFFFFFFFF
                    e = ac_lut[window >> 16]
                    if e == 0:
                        raise ValueError("invalid huffman code in JPEG scan")
                    ln = e & 0xFF
                    rs = e >> 8
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        pos += ln
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC coefficient overrun")
                    pos += ln + s
                    v = (window >> (32 - ln - s)) & ((1 << s) - 1)
                    row[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                    k += 1
            pred[cid] = pred_c

    # Vectorized reconstruction per component.
    planes = {}
    for cid, hs, vs, tq in comps:
        blocks = np.array(coef_rows[cid], dtype=np.float64)
        blocks *= qt[tq][None, :].astype(np.float64)
        blocks = blocks[:, _UNZIGZAG].reshape(-1, 8, 8)
        # batched BLAS matmul == the einsum 2-D IDCT, ~5x faster; fp
        # accumulation order differs by <1e-9 which cannot move a
        # rounded 8-bit pixel (pinned by test_jpeg_idct_matmul_matches_einsum)
        pix = (_DCT_M.T @ blocks) @ _DCT_M
        pix = np.clip(np.round(pix) + 128, 0, 255).astype(np.uint8)
        # blocks are laid out MCU-major, then vs rows x hs cols inside
        cw, chh = mcux * hs * 8, mcuy * vs * 8
        plane = pix.reshape(mcuy, mcux, vs, hs, 8, 8)
        plane = plane.transpose(0, 2, 4, 1, 3, 5).reshape(chh, cw)
        if hs != hmax or vs != vmax:  # upsample to full grid
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        planes[cid] = plane[:h, :w]
    if len(comps) == 1:
        return planes[comps[0][0]]
    y = planes[comps[0][0]].astype(np.float64)
    cb = planes[comps[1][0]].astype(np.float64) - 128.0
    cr = planes[comps[2][0]].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode
class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) per T.81 F.1.2.1."""
    t = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(H,W) float -> (n_blocks, 64) int32 DCT coefficients, raster block
    order; caller handles MCU interleave."""
    hb, wb = plane.shape[0] // 8, plane.shape[1] // 8
    b = plane.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    out = np.einsum("ij,njk,kl->nil", _DCT_M, b - 128.0, _DCT_M.T)
    return out.reshape(-1, 64)


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """Baseline JFIF encoder (fixture twin of decode_jpeg).

    Gray (H,W) or RGB (H,W,3) uint8; 4:4:4 by default, 4:2:0 with
    ``subsample=True`` (exercises the decoder's multi-block MCU path);
    ``restart_interval`` emits DRI + RSTn markers every that many MCUs
    (exercises the decoder's restart resync + DC-predictor reset)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum = _scale_qtable(_Q_LUM, quality)
    qchr = _scale_qtable(_Q_CHR, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even, then 2x2 mean
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def _pad2(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = _pad2(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = _pad2(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # Pad each plane to its MCU-aligned size and DCT+quantize all blocks.
    comp_blocks = []
    for p, (hs, vs), q in zip(planes, samp, (qlum, qchr, qchr)[:len(planes)]):
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        padded = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                        mode="edge")
        # _fdct_blocks emits raster-order coefficients; the quant tables
        # are raster too — divide, then store zigzag-ordered for emission.
        coefs = _fdct_blocks(padded)
        qz = np.round(coefs / q[None, :])[:, _ZIGZAG].astype(np.int32)
        comp_blocks.append((qz, hs, vs, pw // 8))
    dc_codes = [_huffman_codes(_DC_LUM_BITS, _DC_LUM_VALS),
                _huffman_codes(_DC_CHR_BITS, _DC_CHR_VALS)]
    ac_codes = [_huffman_codes(_AC_LUM_BITS, _AC_LUM_VALS),
                _huffman_codes(_AC_CHR_BITS, _AC_CHR_VALS)]

    wtr = _BitWriter()
    pred = [0] * len(planes)
    mcu_no = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])  # markers unstuffed
                rst = (rst + 1) % 8
                pred = [0] * len(planes)
            mcu_no += 1
            for ci, (qz, hs, vs, bw) in enumerate(comp_blocks):
                tsel = 0 if ci == 0 else 1
                dct_, act_ = dc_codes[tsel], ac_codes[tsel]
                for byy in range(vs):
                    for bxx in range(hs):
                        blk = qz[(my * vs + byy) * bw + mx * hs + bxx]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        t, bits = _magnitude(diff)
                        c, ln = dct_[t]
                        wtr.write(c, ln)
                        if t:
                            wtr.write(bits, t)
                        run = 0
                        last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
                        for k in range(1, last_nz + 1):
                            v = int(blk[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = act_[0xF0]  # ZRL
                                wtr.write(c, ln)
                                run -= 16
                            s, bits = _magnitude(v)
                            c, ln = act_[(run << 4) | s]
                            wtr.write(c, ln)
                            wtr.write(bits, s)
                            run = 0
                        if last_nz < 63:
                            c, ln = act_[0x00]  # EOB
                            wtr.write(c, ln)
    wtr.flush()

    # ---- container
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qlum[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qchr[_ZIGZAG].astype(np.uint8)))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qsel[ci]])
    out += seg(0xC0, sof)
    for tc, th, bits, vals in (
        (0, 0, _DC_LUM_BITS, _DC_LUM_VALS),
        (1, 0, _AC_LUM_BITS, _AC_LUM_VALS),
        (0, 1, _DC_CHR_BITS, _DC_CHR_VALS),
        (1, 1, _AC_CHR_BITS, _AC_CHR_VALS),
    )[: 2 if gray else 4]:
        out += seg(0xC4, bytes([(tc << 4) | th] + bits + vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        tsel = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
