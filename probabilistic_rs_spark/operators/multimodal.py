"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata. The Spark-side
contract — schema, Arrow batching, partition sizing — is real and tested;
the codec step is STUBBED (decode libs aren't in this container):

* ``sniff_media_type`` — JVM-side magic-byte container detection
  (PNG/JPEG/GIF/RIFF-WAV/MP4/unknown) — real, oracle-checkable.
* ``media_metadata`` — vectorized metadata extraction (byte length,
  sha2 digest, sniffed type) — real.
* ``decode_and_featurize`` — ``mapInPandas`` batch pipeline with the
  production signature; the decoder is a deterministic fake (feature
  vector derived from content bytes) unless a real ``decoder`` callable
  is injected. Raises ``NotImplementedError`` with ``decoder='real'``
  to mark exactly where a cv2/PIL/ffmpeg hook lands.

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


def decode_and_featurize(
    df: DataFrame,
    binary_col: str,
    id_cols: list[str],
    decoder: str | Callable[[pd.Series], np.ndarray] = "fake",
) -> DataFrame:
    """Batch decode + feature extraction over a binary media column.

    Returns ``(*id_cols, media_type, n_bytes, features: array<float>)``.
    ``decoder='fake'`` → deterministic byte-histogram features (this
    container has no image/audio codecs); ``decoder='real'`` → raises
    ``NotImplementedError`` at the exact integration point; a callable →
    used as the batch decoder (signature: pd.Series[bytes] → np.ndarray
    (n, FEATURE_DIM)).
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media decoding requires cv2/PIL/ffmpeg — inject a batch "
            "decoder callable: decode_and_featurize(..., decoder=fn)"
        )
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
