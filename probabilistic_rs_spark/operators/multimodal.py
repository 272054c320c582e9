"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata. The Spark-side
contract — schema, Arrow batching, partition sizing — is real and tested:

* ``sniff_media_type`` — JVM-side magic-byte container detection
  (PNG/JPEG/GIF/RIFF-WAV/BMP/PPM/unknown) — real, oracle-checkable.
* ``media_metadata`` — vectorized metadata extraction (byte length,
  sha2 digest, sniffed type) — real.
* ``decode_and_featurize`` — ``mapInPandas`` batch pipeline with the
  production signature. ``decoder='image'`` is a REAL end-to-end decode
  path for FIVE raster formats, none needing a codec library: 24-bit
  uncompressed BMP (header parse, bottom-up rows, 4-byte row padding,
  BGR→RGB), binary PPM ``P6``, compressed PNG (stdlib-zlib inflate,
  chunk CRC, all five scanline unfilters, RGB/RGBA — ``decode_png``),
  GIF (variable-width LZW, local/global color tables, interlace —
  ``decode_gif``), and baseline JPEG (Huffman + dequant + IDCT,
  grayscale and 4:4:4–4:2:0 subsampling — ``decode_jpeg``).
  ``decoder='media'`` adds PCM RIFF/WAVE audio (``decode_wav`` →
  ``audio_features``). Only COMPRESSED audio and video genuinely need
  ffmpeg and raise ``NotImplementedError`` at the exact integration
  point where that hook lands. ``decoder='fake'`` keeps the
  deterministic byte-histogram stand-in for oracle plumbing tests; a
  callable is used as the batch decoder directly.

Scale notes: media rows are fat — repartition by size so one Arrow batch
(``maxRecordsPerBatch``) stays under executor memory; metadata-only ops
never deserialize payloads (column pruning keeps binaries on disk).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = [
    ("png", b"\x89PNG"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("riff", b"RIFF"),
    ("pdf", b"%PDF"),
    ("bmp", b"BM"),
    ("ppm", b"P6"),
]


def sniff_media_type(col: Column | str) -> Column:
    """Container type from magic bytes — pure JVM expression."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit("unknown")
    hexes = {name: magic.hex() for name, magic in _MAGIC}
    for name, magic in reversed(_MAGIC):
        prefix = F.lower(F.hex(F.substring(c, 1, len(magic))))
        expr = F.when(prefix == F.lit(hexes[name]), F.lit(name)).otherwise(expr)
    # HTML sniff via hex (decode() would throw on non-UTF-8 binaries)
    head = F.lower(F.hex(F.substring(c, 1, 5)))
    is_html = head.isin(b"<html".hex(), b"<HTML".hex())
    return F.when(is_html, F.lit("html")).otherwise(expr)


def media_metadata(df: DataFrame, binary_col: str) -> DataFrame:
    """Adds ``media_type``, ``n_bytes``, ``content_sha256`` — metadata
    pass that never leaves the JVM."""
    c = F.col(binary_col)
    return (
        df.withColumn("media_type", sniff_media_type(c))
        .withColumn("n_bytes", F.octet_length(c).cast("long"))
        .withColumn("content_sha256", F.sha2(c, 256))
    )


FEATURE_DIM = 16

FEATURIZE_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _fake_decode_featurize(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in for decode→resize→embed: 16 byte-histogram
    buckets, L1-normalized. Pure function of content bytes."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, b in enumerate(payloads):
        if b is None or len(b) == 0:
            continue
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float32)
        out[i] = hist / max(hist.sum(), 1.0)
    return out


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed (BI_RGB) BMP into an (h, w, 3) uint8
    RGB array — pure header-parse + buffer reshape, no codec library.

    Handles the format's three wrinkles: the pixel-data offset header
    field, 4-byte row padding, and bottom-up row order (negative height
    = top-down). Raises ``ValueError`` for any other BMP flavor."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = int.from_bytes(data[10:14], "little")
    width = int.from_bytes(data[18:22], "little", signed=True)
    height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    h = abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    need = pixel_off + stride * h
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} bytes, need {need}")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pixel_off)
    img = rows.reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
    if height > 0:  # bottom-up storage → flip to top-down
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR → RGB


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode a binary PPM (``P6``) into an (h, w, 3) uint8 RGB array.
    Header = ASCII tokens (width, height, maxval) with ``#`` comments;
    payload = raw RGB triplets. Raises ``ValueError`` otherwise."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(data):
            raise ValueError("truncated PPM header")
        c = data[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(data) and data[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval, then raw pixels
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    if len(data) - pos < need:
        raise ValueError("truncated PPM payload")
    return (
        np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6) — a=left, b=up, c=up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG (bit depth 8; color types 0 grayscale, 2 RGB,
    3 palette, 4 gray+alpha, 6 RGBA; no interlace) into an (h, w, 3)
    uint8 RGB array — a REAL compressed codec with no library beyond
    stdlib ``zlib`` (round 6; its siblings ``decode_gif`` and
    ``decode_jpeg`` need no library at all).

    Implements the actual format: chunk walk with CRC-32 validation,
    IHDR geometry, PLTE palette (color type 3 — round 7: indices map
    through the RGB palette exactly as ``decode_gif`` maps LZW output,
    with the same out-of-range-index loud fail; common in real web
    crawls), concatenated IDAT inflate, and per-scanline unfilter
    for ALL five filter types (None/Sub/Up/Average/Paeth, RFC 2083
    §6). The unfilter loop is per-byte Python for Sub/Average/Paeth
    (intra-row data dependence); fine for the fixture sizes this engine
    decodes in-line — a production deployment swaps a C codec into the
    same ``decoder=`` hook. Raises ``ValueError`` for other depths,
    sub-byte palette indices, interlacing, or corrupt chunks."""
    import zlib

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    color_type = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        clen = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen or pos + 12 + clen > len(data):
            raise ValueError("truncated PNG chunk")
        crc = int.from_bytes(data[pos + 8 + clen : pos + 12 + clen], "big")
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            bit_depth, color_type, _comp, _filt, interlace = body[8:13]
            if bit_depth != 8 or color_type not in (0, 2, 3, 4, 6):
                raise ValueError(
                    f"unsupported PNG: bit_depth={bit_depth} color_type={color_type} "
                    "(8-bit grayscale/RGB/palette/gray+alpha/RGBA)"
                )
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"PLTE":
            if clen == 0 or clen % 3 != 0 or clen > 256 * 3:
                raise ValueError(f"malformed PLTE chunk ({clen} bytes)")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG (color type 3) missing its PLTE chunk")
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG inflate size mismatch: {len(raw)} != {height * (stride + 1)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(height):
        off = r * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int64
        )
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — vectorizable (prev-row only)
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential in-row
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    cur[i] = (line[i] + left) & 0xFF
                elif ftype == 3:
                    cur[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
                else:
                    ul = prev[i - bpp] if i >= bpp else 0
                    cur[i] = (line[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(height, width, bpp)
    if color_type == 3:  # palette indices → RGB lookup (tRNS dropped)
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError(
                f"PNG palette index {int(idx.max())} out of range "
                f"(palette has {len(palette)} entries)"
            )
        return palette[idx].copy()
    if color_type in (0, 4):  # grayscale (+alpha dropped) → replicate
        return np.repeat(img[:, :, :1], 3, axis=2).copy()
    return img[:, :, :3].copy()


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF's variable-width LZW (GIF89a spec appendix F): codes packed
    LSB-first, clear/EOI codes, code width grows when the dictionary
    fills (cap 12 bits). Returns exactly ``n_pixels`` palette indices."""
    if not (2 <= min_code_size <= 8):
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [None, None]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    acc = bitcnt = pos = 0
    prev = None
    while True:
        while bitcnt < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bitcnt -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the cScSc case
        else:
            raise ValueError(f"bad GIF LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError(f"GIF pixel data short: {len(out)} < {n_pixels}")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A (A·A^T = I): the JPEG FDCT is
    ``A s A^T`` and the IDCT is ``A^T S A`` (ITU-T T.81 §A.3.3 with the
    1/4·C(u)C(v) scale folded in)."""
    x = np.arange(8, dtype=np.float64)
    a = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0)
    a[0] /= np.sqrt(2.0)
    return a


_DCT_A = _dct_basis()


def _huff_table(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman assignment (T.81 §C.2): (bit length, code)
    → symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing and RSTn
    awareness (T.81 §B.1.1.5, §F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected JPEG marker 0xff{nxt:02x} in scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self, expected: int) -> None:
        """Consume an RSTn marker between entropy intervals."""
        self.n = 0  # discard pad bits
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expected
        ):
            raise ValueError(f"missing JPEG restart marker RST{expected}")
        self.pos += 2


def _jpeg_extend(v: int, s: int) -> int:
    """DIFF/coefficient sign extension (T.81 table F.1)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a BASELINE sequential JPEG (SOF0, 8-bit, grayscale or
    YCbCr at any integer-ratio sampling — 4:4:4, 4:2:2, and the
    real-world-default 4:2:0 included) into an (h, w, 3) uint8 RGB
    array: a real DCT codec with no library at all. Implements the
    actual format: marker walk, DQT (8- and 16-bit precision), DHT with
    canonical code construction, DRI/RSTn restart intervals, the
    Huffman-coded DC-difference + run-length AC entropy layer with
    0xFF00 unstuffing, interleaved MCU geometry with per-component
    H×V block rasters, dequantization in zigzag order, float IDCT
    (orthonormal basis — exact for the DC-only blocks the deterministic
    fixtures produce), nearest-neighbor chroma upsampling, and BT.601
    YCbCr→RGB. Progressive (SOF2) and other non-baseline frames raise
    ``ValueError`` — honest boundaries, same contract as
    ``decode_png``'s palette/interlace limits. Entropy decoding is
    per-bit Python (fixture-sized inputs; a production deployment swaps
    a C codec into the same ``decoder=`` hook)."""
    if len(data) < 4 or data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(comp_id, tq)])
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # legal fill byte (T.81 §B.1.1.2)
            pos += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / bare RST
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG contains no scan")
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, off).astype(np.int64)
                    off += 64
                elif pq == 1:
                    vals = (
                        np.frombuffer(body, np.uint8, 128, off)
                        .reshape(64, 2)
                        .astype(np.int64)
                    )
                    vals = (vals[:, 0] << 8) | vals[:, 1]
                    off += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                qt[tq] = vals  # zigzag order
        elif marker == 0xC4:  # DHT
            off = 0
            while off + 17 <= len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                counts = body[off + 1 : off + 17]
                n = sum(counts)
                syms = body[off + 17 : off + 17 + n]
                if len(syms) != n:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _huff_table(counts, syms)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise ValueError(f"unsupported JPEG precision {body[0]}")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if h < 1 or w < 1 or h * w > (1 << 26):
                # bound the plane allocation BEFORE it happens: a corrupt
                # dims field must fail like every other corruption, not
                # attempt a multi-GB zeros() (64 MP is far past the
                # in-line featurizer's fixture contract)
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hc, vc = hv >> 4, hv & 0x0F
                if not (1 <= hc <= 4 and 1 <= vc <= 4):
                    raise ValueError(f"bad JPEG sampling factors 0x{hv:02x}")
                comps.append((cid, tq, hc, vc))
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            if any(hmax % c[2] or vmax % c[3] for c in comps):
                raise ValueError(
                    "non-integer JPEG chroma upsampling ratios not supported"
                )
            frame = (h, w, comps, hmax, vmax)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0}")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            h, w, comps, hmax, vmax = frame
            ns = body[0]
            scan = {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan[cid] = (tt >> 4, tt & 0x0F)
            if set(scan) != {cid for cid, _, _, _ in comps}:
                raise ValueError("JPEG scan does not cover the frame components")
            reader = _JpegBitReader(data, pos + 2 + seg_len)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            planes = [
                np.zeros((mcus_y * 8 * vc, mcus_x * 8 * hc), dtype=np.float64)
                for _, _, hc, vc in comps
            ]
            pred = [0] * len(comps)
            rst = 0
            for mcu in range(mcus_x * mcus_y):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    reader.restart(rst)
                    rst = (rst + 1) & 7
                    pred = [0] * len(comps)
                my, mx = divmod(mcu, mcus_x)
                for ci, (cid, tq, hc, vc) in enumerate(comps):
                    td, ta = scan[cid]
                    dc_tab, ac_tab = huff.get((0, td)), huff.get((1, ta))
                    if dc_tab is None or ac_tab is None or tq not in qt:
                        raise ValueError("JPEG scan references missing tables")
                    for blk in range(hc * vc):  # raster order within MCU
                        coefs = np.zeros(64, dtype=np.int64)
                        s = reader.decode_symbol(dc_tab)
                        diff = _jpeg_extend(reader.bits(s), s) if s else 0
                        pred[ci] += diff
                        coefs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            coefs[k] = _jpeg_extend(reader.bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coefs * qt[tq]
                        spatial = _DCT_A.T @ block.reshape(8, 8) @ _DCT_A
                        by, bx = divmod(blk, hc)
                        y0 = (my * vc + by) * 8
                        x0 = (mx * hc + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            out = []
            for p, (_, _, hc, vc) in zip(planes, comps):
                up = np.repeat(np.repeat(p, vmax // vc, axis=0), hmax // hc, axis=1)
                out.append(np.clip(np.round(up[:h, :w] + 128.0), 0, 255))
            if len(out) == 1:
                return np.repeat(
                    out[0].astype(np.uint8)[:, :, None], 3, axis=2
                ).copy()
            y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
            rgb = np.stack(
                [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
                axis=2,
            )
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        pos += 2 + seg_len
    raise ValueError("truncated JPEG: no scan data")


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/GIF89a into an (h, w, 3) uint8
    RGB array — a second real compressed codec next to ``decode_png``,
    no library at all (GIF's LZW needs only bit twiddling). Handles the
    actual format: logical-screen + global color table, extension blocks
    (skipped — animation control/comments don't affect frame-1 pixels),
    local color tables, interlaced row order, and the variable-width LZW
    entropy coder with clear/EOI handling. Frames smaller than the
    logical screen decode at their own geometry (this is a featurizer,
    not a compositor). Raises ``ValueError`` on corrupt streams."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    gct_packed = data[10]
    pos = 13
    gct = None
    if gct_packed & 0x80:
        n = 2 << (gct_packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: label then sub-blocks
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        w = int.from_bytes(data[pos + 4 : pos + 6], "little")
        h = int.from_bytes(data[pos + 6 : pos + 8], "little")
        packed = data[pos + 8]
        pos += 9
        palette = gct
        if packed & 0x80:  # local color table wins
            n = 2 << (packed & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("truncated GIF local color table")
            palette = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image has no color table")
        if w <= 0 or h <= 0:
            raise ValueError(f"bad GIF dimensions {w}x{h}")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            blen = data[pos]
            if pos + 1 + blen > len(data):
                raise ValueError("truncated GIF data sub-block")
            lzw.extend(data[pos + 1 : pos + 1 + blen])
            pos += 1 + blen
        idx = _gif_lzw_decode(bytes(lzw), min_code_size, w * h)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF pixel index outside color table")
        rows = idx.reshape(h, w)
        if packed & 0x40:  # interlaced: rows arrive in 4 passes
            deint = np.empty_like(rows)
            r = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for y in range(start, h, step):
                    deint[y] = rows[r]
                    r += 1
            rows = deint
        return palette[rows].copy()
    raise ValueError("truncated GIF: no image block")


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE file with uncompressed PCM samples (format tag
    1, 8/16/32-bit) into ``(sample_rate, samples)`` where ``samples`` is
    an (n_frames, channels) float64 array scaled to [-1, 1] — audio
    needs no codec library until compression enters (MP3/AAC/etc. stay
    at the ffmpeg hook). Walks the actual chunk structure (``fmt `` /
    ``data`` plus arbitrary skipped chunks, word-aligned sizes);
    raises ``ValueError`` on corrupt or compressed streams."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        clen = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("short WAV fmt chunk")
            tag = int.from_bytes(body[0:2], "little")
            if tag != 1:
                raise ValueError(
                    f"compressed WAV (format tag {tag}) needs ffmpeg — "
                    "only PCM decodes here"
                )
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if channels < 1 or rate < 1 or bits not in (8, 16, 32):
                raise ValueError(
                    f"bad WAV geometry: {channels} ch, {rate} Hz, {bits}-bit"
                )
            fmt = (channels, rate, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    channels, rate, bits = fmt
    width = bits // 8
    n = len(pcm) // (width * channels)
    if n == 0:
        raise ValueError("WAV data chunk holds no complete frame")
    raw = np.frombuffer(pcm, dtype={8: np.uint8, 16: "<i2", 32: "<i4"}[bits],
                        count=n * channels)
    if bits == 8:  # 8-bit WAV is unsigned
        x = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        x = raw.astype(np.float64) / float(1 << (bits - 1))
    return rate, x.reshape(n, channels)


def decode_avi_mjpeg(
    data: bytes, sample_every: int = 1, max_frames: int = 64
) -> tuple[float, int, list[np.ndarray]]:
    """Decode an MJPEG-in-AVI video into ``(fps, total_frames, sampled
    frames)`` — every ``sample_every``-th frame (capped at
    ``max_frames``) through the in-repo baseline JPEG decoder, so VIDEO
    needs no library either until modern codecs enter (H.264/VP9/AV1
    stay at the ffmpeg hook). Walks the real RIFF structure: the
    ``hdrl`` LIST's ``avih`` header for frame timing/count, the ``movi``
    LIST's ``..dc``/``..db`` chunks for frame payloads (word-aligned),
    ``idx1``/other chunks skipped. Frame sampling IS the production
    shape: a featurizer never decodes every frame of every video."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    step = max(1, int(sample_every))
    us_per_frame = None
    total_declared = None
    frames: list[np.ndarray] = []
    seen = 0

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        nonlocal us_per_frame, total_declared, seen
        if depth > 16:  # real AVIs nest 2-3 deep; reject crafted bombs
            raise ValueError("AVI LIST nesting too deep")
        pos = lo
        while pos + 8 <= hi:
            cid = data[pos : pos + 4]
            clen = int.from_bytes(data[pos + 4 : pos + 8], "little")
            body_lo, body_hi = pos + 8, pos + 8 + clen
            if body_hi > hi:
                raise ValueError(f"truncated AVI chunk {cid!r}")
            if cid == b"LIST":
                walk(body_lo + 4, body_hi, depth + 1)  # skip the list fourcc
            elif cid == b"avih":
                if clen < 20:
                    raise ValueError("short AVI main header")
                # AVIMAINHEADER: dwMicroSecPerFrame @0, dwTotalFrames @16
                us_per_frame = int.from_bytes(data[body_lo : body_lo + 4], "little")
                total_declared = int.from_bytes(
                    data[body_lo + 16 : body_lo + 20], "little"
                )
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                if seen % step == 0 and len(frames) < max_frames:
                    payload = data[body_lo:body_hi]
                    if payload[:3] != b"\xff\xd8\xff":
                        raise ValueError(
                            "non-MJPEG AVI video stream requires ffmpeg — "
                            "inject a batch decoder callable"
                        )
                    frames.append(decode_jpeg(payload))
                seen += 1
            pos = body_hi + (clen & 1)  # chunks are word-aligned

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI contains no video frames")
    fps = 1e6 / us_per_frame if us_per_frame else 0.0
    total = total_declared if total_declared else seen
    return fps, int(total), frames


def video_features(fps: float, total_frames: int, frames: list[np.ndarray]) -> np.ndarray:
    """FEATURE_DIM stats of a sampled frame stack: geometry (w, h,
    total frames, fps, duration, frames sampled) + channel means over
    the samples + mean |luma delta| between consecutive sampled frames
    (a motion proxy) — exact functions of the frames so an oracle can
    state them for deterministic fixtures."""
    h, w = frames[0].shape[0], frames[0].shape[1]
    stack = np.stack([f.reshape(-1, 3).mean(axis=0) for f in frames]) / 255.0
    luma = np.array(
        [float(f.astype(np.float64).mean()) for f in frames]
    )
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    out[0] = w
    out[1] = h
    out[2] = total_frames
    out[3] = fps
    out[4] = total_frames / fps if fps else 0.0
    out[5] = len(frames)
    out[6:9] = stack.mean(axis=0)
    out[9] = float(np.abs(np.diff(luma)).mean()) / 255.0 if len(frames) > 1 else 0.0
    return out


def audio_features(rate: int, samples: np.ndarray) -> np.ndarray:
    """FEATURE_DIM stats of decoded PCM: geometry (rate, frames,
    channels, seconds) + channel-pooled amplitude stats (mean, rms,
    peak, min, max, zero-crossing rate) — the audio twin of
    ``image_features``, exact functions of the samples so an oracle can
    state them for deterministic fixtures."""
    n, ch = samples.shape
    mono = samples.mean(axis=1)
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    out[0] = rate
    out[1] = n
    out[2] = ch
    out[3] = n / rate
    out[4] = samples.mean()
    out[5] = float(np.sqrt((samples**2).mean()))
    out[6] = float(np.abs(samples).max())
    out[7] = samples.min()
    out[8] = samples.max()
    out[9] = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean()) if n > 1 else 0.0
    return out


def _media_decode_featurize(payloads: pd.Series) -> np.ndarray:
    """REAL decode→featurize across ALL THREE modalities: the five
    raster formats via ``_image_decode_featurize``'s codecs, PCM
    RIFF/WAVE audio (``decode_wav`` → ``audio_features``), and
    MJPEG-in-AVI video (``decode_avi_mjpeg`` with frame sampling →
    ``video_features``). Only modern compressed codecs (MP3/AAC,
    H.264/VP9/…) still raise at the ffmpeg hook."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, b in enumerate(payloads):
        if b is None or len(b) == 0:
            continue
        bb = bytes(b)
        if bb[:4] == b"RIFF":
            if bb[8:12] == b"WAVE":
                out[i] = audio_features(*decode_wav(bb))
            elif bb[8:12] == b"AVI ":
                out[i] = video_features(*decode_avi_mjpeg(bb, sample_every=4))
            else:
                raise NotImplementedError(
                    "unknown RIFF container requires ffmpeg — inject a "
                    "batch decoder callable"
                )
        else:
            out[i] = _image_features_of(bb)
    return out


def image_features(img: np.ndarray) -> np.ndarray:
    """FEATURE_DIM stats of a decoded (h, w, 3) image: geometry + exact
    per-channel mean/std/min/max (channel values scaled to [0, 1]).

    Exactness bound (ADVICE r4 #3): slots are float32, so the pixel-count
    slot 15 (w·h) is exactly representable only below 2^24 pixels (~16 MP);
    consumers needing an exact count above that must derive it as
    ``slot0 · slot1`` — width and height individually stay exact far
    beyond any real image dimension."""
    h, w = img.shape[0], img.shape[1]
    px = img.reshape(-1, 3).astype(np.float64) / 255.0
    out = np.empty(FEATURE_DIM, dtype=np.float32)
    out[0] = w
    out[1] = h
    out[2:5] = px.mean(axis=0)
    out[5:8] = px.std(axis=0)
    out[8:11] = px.min(axis=0)
    out[11:14] = px.max(axis=0)
    out[14] = w / h
    out[15] = w * h
    return out


def _image_features_of(bb: bytes) -> np.ndarray:
    """One payload through the raster dispatch (shared by the image-only
    and cross-modal featurizers)."""
    if bb[:2] == b"BM":
        return image_features(decode_bmp(bb))
    if bb[:2] == b"P6":
        return image_features(decode_ppm(bb))
    if bb[:4] == b"\x89PNG":
        return image_features(decode_png(bb))
    if bb[:4] == b"GIF8":
        return image_features(decode_gif(bb))
    if bb[:3] == b"\xff\xd8\xff":
        return image_features(decode_jpeg(bb))
    if any(bb.startswith(m) for _, m in _MAGIC):
        raise NotImplementedError(
            "audio/video decoding requires ffmpeg — inject a batch "
            "decoder callable: decode_and_featurize(..., decoder=fn) "
            "(PCM WAV decodes via decoder='media')"
        )
    raise ValueError("payload is not a decodable raster image")


def _image_decode_featurize(payloads: pd.Series) -> np.ndarray:
    """REAL decode→featurize for five raster formats: uncompressed BMP
    24-bit / PPM P6, zlib-inflated PNG (8-bit RGB/RGBA), LZW GIF, and
    baseline-DCT JPEG (grayscale / subsampled 4:4:4–4:2:0). Audio/video
    containers raise ``NotImplementedError`` here; PCM WAV decodes in
    the cross-modal ``decoder='media'`` path."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, b in enumerate(payloads):
        if b is None or len(b) == 0:
            continue
        out[i] = _image_features_of(bytes(b))
    return out


def decode_and_featurize(
    df: DataFrame,
    binary_col: str,
    id_cols: list[str],
    decoder: str | Callable[[pd.Series], np.ndarray] = "fake",
) -> DataFrame:
    """Batch decode + feature extraction over a binary media column.

    Returns ``(*id_cols, media_type, n_bytes, features: array<float>)``.
    ``decoder='image'`` → REAL decode of BMP/PPM/PNG/GIF/baseline-JPEG
    with exact per-channel statistics; ``decoder='media'`` → the same
    rasters PLUS PCM RIFF/WAVE audio (``audio_features`` slots);
    ``decoder='fake'`` → deterministic byte-histogram features
    (plumbing oracle); ``decoder='real'`` → raises
    ``NotImplementedError`` (compressed audio/video need ffmpeg — this
    marks the integration point); a callable → used as the batch
    decoder (signature: pd.Series[bytes] → np.ndarray (n, FEATURE_DIM)).

    Throughput routing (measured, BASELINE.md round-7 media pricing):
    the pure-Python codecs sustain 13k–280k items/s/core at oracle-
    fixture sizes but ~10–90 images/s/core at real 128px web-image
    sizes — for production volumes, inject a C decoder (ffmpeg/libvips)
    as the ``decoder=`` callable; every other piece of this operator
    (schema, Arrow batching, partitioning) is the production path.
    """
    if decoder == "real":
        raise NotImplementedError(
            "compressed audio/video decoding requires ffmpeg — use "
            "decoder='media' for the five raster formats + PCM WAV, or "
            "inject a batch decoder callable: "
            "decode_and_featurize(..., decoder=fn)"
        )
    if decoder == "image":
        decode_fn = _image_decode_featurize
    elif decoder == "media":
        decode_fn = _media_decode_featurize
    else:
        decode_fn = _fake_decode_featurize if decoder == "fake" else decoder

    pruned = df.select(*id_cols, binary_col)
    id_fields = [pruned.schema[c] for c in id_cols]
    out_schema = StructType(id_fields + list(FEATURIZE_SCHEMA.fields))
    magic_local = list(_MAGIC)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            feats = decode_fn(payloads)
            types, sizes = [], []
            for b in payloads:
                if b is None:
                    types.append(None)
                    sizes.append(None)
                    continue
                bb = bytes(b)
                t = "unknown"
                if bb[:15].lower().startswith(b"<html"):
                    t = "html"
                else:
                    for name, magic in magic_local:
                        if bb.startswith(magic):
                            t = name
                            break
                types.append(t)
                sizes.append(len(bb))
            out = pdf[id_cols].copy()
            out["media_type"] = types
            out["n_bytes"] = pd.array(sizes, dtype="Int64")
            out["features"] = [None if s is None else row for s, row in zip(sizes, feats.tolist())]
            yield out

    return pruned.mapInPandas(run, out_schema)
