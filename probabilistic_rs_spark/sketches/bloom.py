"""Bloom filter core — bit-parity-anchored to the reference.

Semantics reproduced from ``/root/reference``:

* sizing: ``m = ceil(-n·ln p/ln²2)``, ``k = round((m/n)·ln2)``
  (``src/hash.rs:103-106, 132-134``, applied at ``src/bloom/filter.rs:154-156``)
* indices: Kirsch–Mitzenmacher double hashing over murmur3-32(seed 0) and
  FNV-1a-64-truncated-to-u32 (``src/hash.rs:33-77``)
* bit layout: LSB-first within each byte — byte ``i>>3``, bit ``i&7`` —
  matching the reference's chunk packing (``src/bloom/filter.rs:245-273``)
* chunked state: ``chunk_size_bytes`` windows (default 4096,
  ``src/bloom/config.rs:25-26``) with dirty-chunk tracking for incremental
  checkpoints (``src/bloom/filter.rs:221-243``)
* config defaults + validation: capacity 1_000_000, fpr 0.01; capacity>0,
  0<fpr<1 (``src/bloom/config.rs:9-44``)

The Spark-side adaptation (SURVEY.md §1.2): the filter is a mergeable
binary state; ``merge`` is bitwise OR of equal-config filters (the textbook
Bloom union — the one operation the reference never ships because it has no
distributed merge step).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.functions.hashing import (
    bloom_index_batch,
    bloom_index_padded,
    optimal_bit_vector_size,
    optimal_num_hashes,
)
from probabilistic_rs_spark.sketches.base import TYPE_BLOOM, pack_header, unpack_header, unpack_meta

_META = struct.Struct("<qdqqqq")  # capacity, fpr, m, k, chunk_size, n_updates


@dataclass(frozen=True)
class BloomConfig:
    """Mirrors reference ``BloomFilterConfig`` defaults
    (``src/bloom/config.rs:10-14``) + chunk size
    (``src/bloom/config.rs:25-26``)."""

    capacity: int = 1_000_000
    false_positive_rate: float = 0.01
    chunk_size_bytes: int = 4096

    def validate(self) -> None:
        # Reference validation: src/bloom/config.rs:31-44
        if self.capacity <= 0:
            raise SketchConfigError("Capacity must be greater than 0")
        if not (0.0 < self.false_positive_rate < 1.0):
            raise SketchConfigError("False positive rate must be between 0 and 1")
        if self.chunk_size_bytes <= 0:
            raise SketchConfigError("Chunk size must be greater than 0")
        # positions travel as uint32 (build kernels + the sparse-partial
        # wire format both Bloom families share), so m must fit 32 bits;
        # beyond that the build would silently wrap positions while the
        # native family's JVM probe evaluates untruncated 64-bit position
        # expressions → FALSE NEGATIVES. The cap bites at capacity
        # ≈ 448M @ 1% FPR — at that scale partition the keyspace into
        # multiple filters (each probe side picks its filter by key hash).
        m = optimal_bit_vector_size(self.capacity, self.false_positive_rate)
        if m >= (1 << 32):
            raise SketchConfigError(
                f"bit vector size m={m} exceeds the 2^32-bit cap of the "
                f"uint32 position/sparse-index wire format (capacity="
                f"{self.capacity}, fpr={self.false_positive_rate}); "
                "split the keyspace across multiple filters"
            )


class BloomSketch:
    """Word-packed Bloom filter state with vectorized bulk ops.

    The batch kernels are the Spark analog of the reference's
    batch-hash-then-single-lock bulk ops (``src/bloom/filter.rs:395-477``):
    all indices for the whole Arrow batch are computed in one numpy
    expression, then applied with one scatter / gather.
    """

    __slots__ = ("config", "m", "k", "bits", "n_updates", "dirty_chunks")

    # wire-format type tag; the native-hash subclass overrides it so a
    # filter built with the JVM xxhash64 family can never be silently
    # probed with the reference murmur/fnv family (or vice versa)
    _TYPE = TYPE_BLOOM

    def __init__(self, config: BloomConfig | None = None):
        config = config or BloomConfig()
        config.validate()
        self.config = config
        self.m = optimal_bit_vector_size(config.capacity, config.false_positive_rate)
        self.k = max(1, optimal_num_hashes(config.capacity, self.m))
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)
        self.n_updates = 0
        self.dirty_chunks: set[int] = set()

    # -- update ------------------------------------------------------------

    def update_batch(self, items) -> None:
        """Absorb a batch of byte strings (``insert_bulk`` analog,
        ``src/bloom/filter.rs:395-438``)."""
        if len(items) == 0:
            return
        self._apply_indices(bloom_index_batch(items, self.k, self.m), len(items))

    def update_padded(self, buf: np.ndarray, lens: np.ndarray) -> None:
        """Zero-copy Arrow path: absorb a pre-padded byte matrix
        (see ``functions.hashing.pad_batch_arrow``)."""
        if len(lens) == 0:
            return
        self._apply_indices(bloom_index_padded(buf, lens, self.k, self.m), len(lens))

    def _apply_indices(self, idx: np.ndarray, n: int) -> None:
        idx = idx.ravel()
        byte_idx = idx >> 3
        np.bitwise_or.at(self.bits, byte_idx, (1 << (idx & 7)).astype(np.uint8))
        self.n_updates += n
        cs = self.config.chunk_size_bytes
        self.dirty_chunks.update(np.unique(byte_idx // cs).tolist())

    # -- probe -------------------------------------------------------------

    def contains_batch(self, items) -> np.ndarray:
        """Vectorized membership (``contains_bulk`` analog,
        ``src/bloom/filter.rs:440-477``); result aligned to input order."""
        n = len(items)
        if n == 0:
            return np.zeros(0, dtype=bool)
        idx = bloom_index_batch(items, self.k, self.m)  # (n, k)
        bitvals = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return bitvals.all(axis=1)

    def contains_padded(self, buf: np.ndarray, lens: np.ndarray) -> np.ndarray:
        if len(lens) == 0:
            return np.zeros(0, dtype=bool)
        idx = bloom_index_padded(buf, lens, self.k, self.m)
        bitvals = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return bitvals.all(axis=1)

    def contains(self, item: bytes) -> bool:
        return bool(self.contains_batch([item])[0])

    # -- merge / clear -----------------------------------------------------

    def merge(self, other: "BloomSketch") -> "BloomSketch":
        """Bitwise-OR union; requires identical derived (m, k) — configs are
        frozen at construction exactly as in the reference (persisted config
        wins, ``src/bloom/filter.rs:103``)."""
        if (self.m, self.k) != (other.m, other.k):
            raise SketchStateError(
                f"incompatible Bloom states: (m,k)=({self.m},{self.k}) vs "
                f"({other.m},{other.k})"
            )
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_updates += other.n_updates
        self.dirty_chunks.update(other.dirty_chunks)
        return self

    def clear(self) -> None:
        """Zero all bits, reset counter (``src/bloom/filter.rs:386-391``)."""
        self.bits[:] = 0
        self.n_updates = 0
        self.dirty_chunks.clear()

    # -- stats ---------------------------------------------------------------

    @property
    def insert_count(self) -> int:
        return self.n_updates

    def approx_memory_bits(self) -> int:
        return len(self.bits) * 8

    def bits_per_item(self) -> float:
        return self.approx_memory_bits() / self.config.capacity

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits, bitorder="little").sum()) / self.m

    # -- chunked state (checkpoint format) ----------------------------------

    def extract_all_chunks(self) -> list[tuple[int, bytes]]:
        """All (chunk_id, bytes) — ``src/bloom/filter.rs:197-219``. Bytes are
        LSB-first-packed, same layout as the reference's chunk rows."""
        cs = self.config.chunk_size_bytes
        return [
            (cid, self.bits[cid * cs : (cid + 1) * cs].tobytes())
            for cid in range((len(self.bits) + cs - 1) // cs)
        ]

    def extract_dirty_chunks(self) -> list[tuple[int, bytes]]:
        """Only chunks touched since the last snapshot
        (``src/bloom/filter.rs:221-243``)."""
        cs = self.config.chunk_size_bytes
        return [
            (cid, self.bits[cid * cs : (cid + 1) * cs].tobytes())
            for cid in sorted(self.dirty_chunks)
        ]

    def clear_dirty(self) -> None:
        self.dirty_chunks.clear()

    def load_chunks(self, chunks: list[tuple[int, bytes]]) -> None:
        """Inverse of extract — ``src/bloom/filter.rs:275-301``. Chunks are
        applied sorted by id (reference sorts on load,
        ``src/bloom/storage.rs:97``)."""
        cs = self.config.chunk_size_bytes
        for cid, blob in sorted(chunks):
            arr = np.frombuffer(blob, dtype=np.uint8)
            end = min(cid * cs + len(arr), len(self.bits))
            self.bits[cid * cs : end] = arr[: end - cid * cs]

    # -- serialization -------------------------------------------------------

    def to_bytes(self) -> bytes:
        """Adaptive encoding: version 1 = dense bitmap; version 2 = sparse
        uint32 set-bit indices, chosen automatically when it is smaller.
        Partition-local partials of a big filter are lightly filled
        (n_rows/partition ≪ capacity), so at scale the shuffle carries
        ~4·k·rows bytes per partial instead of m/8 — the sparse analog of
        the reference's dirty-chunk incremental snapshot
        (``src/bloom/filter.rs:221-243``)."""
        meta = _META.pack(
            self.config.capacity,
            self.config.false_positive_rate,
            self.m,
            self.k,
            self.config.chunk_size_bytes,
            self.n_updates,
        )
        # dense short-circuit: set bits ≤ k·n_updates, so when even the
        # zero-duplicate bound says the sparse payload can't be smaller,
        # skip the O(m) flatnonzero/popcount decision scan entirely (the
        # final reducer's global filter always lands here — this scan was
        # ~170 ms of pure serial time per merged state at capacity 16M)
        if 4 * self.k * self.n_updates >= len(self.bits):
            return pack_header(self._TYPE, version=1) + meta + self.bits.tobytes()
        # expand only the nonzero BYTES to bit indices: a lightly-filled
        # filter touches ~n·k of m bytes, so temporaries stay O(set bits)
        # instead of O(m) — full-width unpackbits would fault 8×m of fresh
        # pages per serialization, which dominates on microVM memory
        nz = np.flatnonzero(self.bits)
        n_set = int(_POPCNT[self.bits[nz]].sum()) if len(nz) else 0
        if n_set * 4 < len(self.bits):
            sub = np.unpackbits(self.bits[nz], bitorder="little").reshape(-1, 8)
            rows, cols = np.nonzero(sub)
            idx = (nz[rows] * 8 + cols).astype(np.uint32)
            return pack_header(self._TYPE, version=2) + meta + idx.tobytes()
        return pack_header(self._TYPE, version=1) + meta + self.bits.tobytes()

    def merge_bytes(self, data: bytes) -> "BloomSketch":
        """OR a serialized state directly into this filter without
        materializing a second dense bit array — the merge hot path: a
        reducer folding P partials allocates one dense array total instead
        of P (each dense alloc is m/8 fresh-faulted pages)."""
        version, off = unpack_header(data, self._TYPE)
        capacity, fpr, m, k, cs, n_updates = unpack_meta(_META, data, off)
        if (self.m, self.k) != (m, k):
            raise SketchStateError(
                f"incompatible Bloom states: (m,k)=({self.m},{self.k}) vs ({m},{k})"
            )
        payload_off = off + _META.size
        cs = self.config.chunk_size_bytes
        if version == 2:
            idx = np.frombuffer(data, dtype=np.uint32, offset=payload_off)
            if len(idx) and int(idx.max()) >= self.m:
                raise SketchStateError("sparse bit index out of range")
            _or_bit_indices(self.bits, idx)
            # merged-in bits must be visible to the next incremental
            # snapshot, same as merge() — a live filter folded via
            # merge_bytes then checkpointed with extract_dirty_chunks
            # would otherwise silently omit them. O(n) dedupe: sparse
            # payloads are sorted, so chunk ids change monotonically
            if len(idx):
                self.dirty_chunks.update(_sorted_unique_chunk_ids(idx, cs).tolist())
        else:
            bits = np.frombuffer(data, dtype=np.uint8, offset=payload_off)
            if len(bits) != len(self.bits):
                raise SketchStateError("bit vector length mismatch")
            np.bitwise_or(self.bits, bits, out=self.bits)
            # chunk-granular dirty scan: O(m) read but only O(m/cs)
            # temporaries (a flatnonzero over a near-full filter would
            # materialize an up-to-8x-set-bytes int64 array per fold on
            # the reducer hot path)
            n = len(bits)
            full = (n // cs) * cs
            cids = np.flatnonzero(bits[:full].reshape(-1, cs).any(axis=1))
            self.dirty_chunks.update(cids.tolist())
            if n > full and bits[full:].any():
                self.dirty_chunks.add(n // cs)
        self.n_updates += n_updates
        return self

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomSketch":
        version, off = unpack_header(data, cls._TYPE)
        capacity, fpr, m, k, cs, n_updates = unpack_meta(_META, data, off)
        sk = cls(BloomConfig(capacity, fpr, cs))
        if (sk.m, sk.k) != (m, k):
            raise SketchStateError("derived (m,k) mismatch on deserialize")
        payload_off = off + _META.size
        if version == 2:
            idx = np.frombuffer(data, dtype=np.uint32, offset=payload_off)
            if len(idx) and int(idx.max()) >= sk.m:
                raise SketchStateError("sparse bit index out of range")
            _or_bit_indices(sk.bits, idx)
        else:
            bits = np.frombuffer(data, dtype=np.uint8, offset=payload_off)
            if len(bits) != len(sk.bits):
                raise SketchStateError("bit vector length mismatch")
            sk.bits = bits.copy()
        sk.n_updates = n_updates
        return sk


# byte-popcount lookup table for the adaptive encoding decision
_POPCNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def _or_bit_indices(bits: np.ndarray, idx: np.ndarray) -> None:
    """OR bit indices into an LSB-first byte array via the unbuffered
    scatter. (A segmented reduceat variant was measured 3× SLOWER at
    sparse fill — with < 1 bit per byte nearly every element is its own
    segment, so the reduce machinery is pure overhead.)"""
    if len(idx) == 0:
        return
    np.bitwise_or.at(bits, idx >> np.uint32(3), (1 << (idx & 7)).astype(np.uint8))


def _sorted_unique_chunk_ids(idx: np.ndarray, chunk_size_bytes: int) -> np.ndarray:
    """Chunk ids touched by a SORTED bit-index array, deduped in O(n) with
    uint32 shift/compare ops (no sort, no int64 upcast). Falls back to
    np.unique for unsorted input."""
    cs = int(chunk_size_bytes)
    if cs & (cs - 1) == 0:
        shift = np.uint32(3 + cs.bit_length() - 1)
        cids = idx >> shift
    else:
        cids = (idx >> np.uint32(3)) // np.uint32(cs)
    if len(cids) > 1 and (cids[1:] < cids[:-1]).any():
        return np.unique(cids)
    if len(cids) == 0:
        return cids
    keep = np.concatenate(([0], np.flatnonzero(cids[1:] != cids[:-1]) + 1))
    return cids[keep]


class BloomPartialBuilder:
    """Dense-free accumulator for per-partition Bloom PARTIALS.

    A partition-local partial of a big filter is lightly filled (it sees
    ~rows_per_partition·k of m bits), so materializing the dense m/8-byte
    array per partition task is pure waste: at capacity 16M that is a
    19 MB fresh-faulted allocation, a 38 ms ``bitwise_or.at`` scatter, and
    a 78 ms dense→sparse re-extraction in ``to_bytes`` — per partition.
    This builder instead collects the raw bit indices each Arrow batch
    produces and emits the SAME versioned wire format (sparse v2 via one
    ``np.unique`` sort, or dense v1 when genuinely dense) — the partial
    build path never touches O(m) memory unless the data actually fills
    the filter.

    Duck-type-compatible with :class:`BloomSketch` for the build-side
    surface (``update_padded`` / ``update_batch`` / ``to_bytes`` /
    ``n_updates``); ``from_bytes`` returns a real :class:`BloomSketch`, so
    merge-side code that resolves the class from a spec keeps working.
    """

    __slots__ = ("config", "m", "k", "idx_chunks", "n_idx", "dense", "n_updates")

    _TYPE = TYPE_BLOOM
    _SKETCH: type = None  # resolved below (BloomSketch); subclass overrides

    def __init__(self, config: BloomConfig | None = None):
        config = config or BloomConfig()
        config.validate()
        self.config = config
        self.m = optimal_bit_vector_size(config.capacity, config.false_positive_rate)
        self.k = max(1, optimal_num_hashes(config.capacity, self.m))
        self.idx_chunks: list[np.ndarray] = []
        self.n_idx = 0
        self.dense: BloomSketch | None = None
        self.n_updates = 0

    def _absorb(self, idx: np.ndarray, n_items: int) -> None:
        self.n_updates += n_items
        if self.dense is not None:
            _or_bit_indices(self.dense.bits, idx)
            return
        self.idx_chunks.append(idx.astype(np.uint32, copy=False))
        self.n_idx += len(idx)
        # memory bound: once the raw index list would outweigh the dense
        # array, collapse to dense and scatter from then on — builder
        # memory is min(sparse, dense) at ANY partition size
        if self.n_idx * 4 >= (self.m + 7) // 8:
            self.dense = self._SKETCH(self.config)
            _or_bit_indices(self.dense.bits, np.concatenate(self.idx_chunks))
            self.idx_chunks = []
            self.n_idx = 0

    def update_padded(self, buf: np.ndarray, lens: np.ndarray) -> None:
        if len(lens) == 0:
            return
        self._absorb(bloom_index_padded(buf, lens, self.k, self.m).ravel(), len(lens))

    def update_batch(self, items) -> None:
        if len(items) == 0:
            return
        self._absorb(bloom_index_batch(items, self.k, self.m).ravel(), len(items))

    def to_bytes(self) -> bytes:
        meta = _META.pack(
            self.config.capacity,
            self.config.false_positive_rate,
            self.m,
            self.k,
            self.config.chunk_size_bytes,
            self.n_updates,
        )
        if self.dense is not None:
            self.dense.n_updates = self.n_updates
            return self.dense.to_bytes()
        if self.idx_chunks:
            idx = np.unique(np.concatenate(self.idx_chunks))
        else:
            idx = np.empty(0, dtype=np.uint32)
        # set BITS bound set BYTES, so idx-count*4 < m/8 implies the sparse
        # payload is smaller than dense (same decision rule as BloomSketch)
        if len(idx) * 4 < (self.m + 7) // 8:
            return pack_header(self._TYPE, version=2) + meta + idx.tobytes()
        sk = self._SKETCH(self.config)
        _or_bit_indices(sk.bits, idx)
        return pack_header(self._TYPE, version=1) + meta + sk.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomSketch":
        return cls._SKETCH.from_bytes(data)


BloomPartialBuilder._SKETCH = BloomSketch
