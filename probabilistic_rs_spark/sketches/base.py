"""Shared serialization helpers for sketch states.

Binary layout mirrors the reference's idiom of a bincode-encoded config
followed by raw state chunks (``src/bloom/config.rs:46-55``,
``src/bloom/filter.rs:245-273``): a 8-byte magic+type+version header, a
little-endian struct of config/derived parameters, then raw numpy buffers.
"""

from __future__ import annotations

import struct

from probabilistic_rs_spark.errors import SketchStateError

MAGIC = b"PRS1"

TYPE_BLOOM = 1
TYPE_HLL = 2
TYPE_CMS = 3
TYPE_TDIGEST = 4
TYPE_KLL = 5
TYPE_CUCKOO = 6
TYPE_NBLOOM = 7  # native-hash Bloom: JVM xxhash64 position family
TYPE_QUOTIENT = 8
TYPE_NCUCKOO = 9  # native cuckoo: xxhash64-derived alternate buckets (JVM-probeable)
TYPE_THETA = 10  # theta/KMV: k-minimum-values distinct sketch with set algebra
TYPE_MG = 11  # Misra-Gries: deterministic mergeable top-k with exact keys
TYPE_CS = 12  # count sketch: signed unbiased point estimates + AMS F2 moment

_HEADER = struct.Struct("<4sHH")  # magic, type, version


def pack_header(sketch_type: int, version: int = 1) -> bytes:
    return _HEADER.pack(MAGIC, sketch_type, version)


def unpack_meta(meta_struct: struct.Struct, data: bytes, off: int):
    """Unpack a meta struct, mapping truncation to SketchStateError
    (reference: BloomError::SerializationError on corrupt input)."""
    try:
        return meta_struct.unpack_from(data, off)
    except struct.error as e:
        raise SketchStateError(f"corrupt sketch state: {e}") from e


def peek_type(data: bytes) -> int:
    """The wire-format type tag of a serialized state, validated but not
    consumed — for dispatchers that pick a deserializer by family (e.g.
    the cuckoo parity/native split) WITHOUT matching exception text
    (ADVICE r4 #1: a rewording of the mismatch message must not be able
    to break deserialization)."""
    if len(data) < _HEADER.size:
        raise SketchStateError(f"state too short: {len(data)} bytes")
    magic, typ, _ = _HEADER.unpack_from(data, 0)
    if magic != MAGIC:
        raise SketchStateError(f"bad magic {magic!r}")
    return typ


def unpack_header(data: bytes, expect_type: int) -> tuple[int, int]:
    """Returns (version, payload_offset); raises on mismatch."""
    if len(data) < _HEADER.size:
        raise SketchStateError(f"state too short: {len(data)} bytes")
    magic, typ, version = _HEADER.unpack_from(data, 0)
    if magic != MAGIC:
        raise SketchStateError(f"bad magic {magic!r}")
    if typ != expect_type:
        raise SketchStateError(f"sketch type mismatch: got {typ}, want {expect_type}")
    return version, _HEADER.size
