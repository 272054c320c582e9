"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata. The Spark-side
contract — schema, Arrow batching, partition sizing — is real and tested:

* ``sniff_media_type`` — JVM-side magic-byte container detection
  (PNG/JPEG/GIF/RIFF-WAV/BMP/PPM/unknown) — real, oracle-checkable.
* ``media_metadata`` — vectorized metadata extraction (byte length,
  sha2 digest, sniffed type) — real.
* ``decode_and_featurize`` — ``mapInPandas`` batch pipeline with the
  production signature. ``decoder='image'`` is a REAL end-to-end decode
  path for the two uncompressed raster formats that need no codec
  library: 24-bit uncompressed BMP (header parse, bottom-up rows, 4-byte
  row padding, BGR→RGB) and binary PPM ``P6``. Compressed formats
  (JPEG/PNG/audio/video) raise ``NotImplementedError`` at the exact
  integration point where a cv2/PIL/ffmpeg hook lands — this container
  has no such codecs. ``decoder='fake'`` keeps the deterministic
  byte-histogram stand-in for oracle plumbing tests; a callable is used
  as the batch decoder directly.

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


def _image_decode_featurize(payloads: pd.Series) -> np.ndarray:
    """REAL decode→featurize for uncompressed rasters (BMP 24-bit, PPM
    P6). Compressed containers raise ``NotImplementedError`` at the exact
    point a cv2/PIL/ffmpeg hook lands — honest, since this environment
    ships no codec libraries."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, b in enumerate(payloads):
        if b is None or len(b) == 0:
            continue
        bb = bytes(b)
        if bb[:2] == b"BM":
            out[i] = image_features(decode_bmp(bb))
        elif bb[:2] == b"P6":
            out[i] = image_features(decode_ppm(bb))
        elif any(bb.startswith(m) for _, m in _MAGIC):
            raise NotImplementedError(
                "compressed media decoding requires cv2/PIL/ffmpeg — inject "
                "a batch decoder callable: decode_and_featurize(..., decoder=fn)"
            )
        else:
            raise ValueError("payload is not a decodable raster image")
    return out


def decode_and_featurize(
    df: DataFrame,
    binary_col: str,
    id_cols: list[str],
    decoder: str | Callable[[pd.Series], np.ndarray] = "fake",
) -> DataFrame:
    """Batch decode + feature extraction over a binary media column.

    Returns ``(*id_cols, media_type, n_bytes, features: array<float>)``.
    ``decoder='image'`` → REAL decode of uncompressed rasters (24-bit
    BMP / P6 PPM) with exact per-channel statistics; ``decoder='fake'``
    → deterministic byte-histogram features (plumbing oracle);
    ``decoder='real'`` → raises ``NotImplementedError`` (compressed
    codecs need cv2/PIL/ffmpeg — this marks the integration point); a
    callable → used as the batch decoder (signature: pd.Series[bytes] →
    np.ndarray (n, FEATURE_DIM)).
    """
    if decoder == "real":
        raise NotImplementedError(
            "compressed media decoding requires cv2/PIL/ffmpeg — use "
            "decoder='image' for uncompressed BMP/PPM rasters, or inject a "
            "batch decoder callable: decode_and_featurize(..., decoder=fn)"
        )
    if decoder == "image":
        decode_fn = _image_decode_featurize
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
