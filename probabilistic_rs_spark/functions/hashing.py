"""Hashing kernels — the bit-parity anchor with the reference.

The reference's entire Bloom index derivation is
(``src/hash.rs:33-77``):

* ``hash_murmur32``  — Murmur3 x86 32-bit, **seed 0**
* ``hash_fnv32``     — FNV-1a **64-bit**, truncated to u32 (``finish() as u32``)
* ``default_hash_function`` — Kirsch–Mitzenmacher double hashing
  ``h_i = (h1 + i · h2) mod m`` with wrapping u32 arithmetic

and the sizing formulas (``src/hash.rs:103-106, 132-134``):

* ``m = ceil(-n · ln p / ln² 2)``
* ``k = round((m / n) · ln 2)``

Everything here is implemented twice: a scalar pure-Python version
(readable spec, used to pin test vectors) and a numpy-vectorized version
that processes a whole Arrow batch of byte strings at once — the Spark
analog of the reference's batch-hash-then-single-lock ``insert_bulk``
(``src/bloom/filter.rs:395-438``).
"""

from __future__ import annotations

import math

import numpy as np

U32 = np.uint32
U64 = np.uint64

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# Scalar reference implementations (spec + test-vector source)
# ---------------------------------------------------------------------------

def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Murmur3 x86 32-bit, scalar. Parity: reference ``src/hash.rs:33-36``
    (murmur3 crate, seed 0)."""
    h = seed & _M32
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit, scalar."""
    h = _FNV_OFFSET
    for b in data:
        h ^= b
        h = (h * _FNV_PRIME) & _M64
    return h


def fnv1a32_truncated(data: bytes) -> int:
    """Reference ``hash_fnv32``: 64-bit FNV-1a, low 32 bits
    (``src/hash.rs:38-42`` — ``finish() as u32``)."""
    return fnv1a64(data) & _M32


def double_hash_indices(data: bytes, num_hashes: int, capacity: int) -> list[int]:
    """Scalar Kirsch–Mitzenmacher: ``(h1 + i*h2) % capacity`` with
    wrapping u32 arithmetic. Parity: ``src/hash.rs:67-77``."""
    h1 = murmur3_32(data)
    h2 = fnv1a32_truncated(data)
    return [((h1 + (i * h2) & _M32) & _M32) % capacity for i in range(num_hashes)]


# ---------------------------------------------------------------------------
# Sizing formulas (driver-side; reference src/hash.rs:103-134)
# ---------------------------------------------------------------------------

def optimal_bit_vector_size(n: int, fpr: float) -> int:
    """``m = ceil(-n·ln(fpr)/ln²2)`` — reference ``src/hash.rs:103-106``."""
    ln2 = math.log(2.0)
    return int(math.ceil((-float(n) * math.log(fpr)) / (ln2 * ln2)))


def optimal_num_hashes(n: int, m: int) -> int:
    """``k = round((m/n)·ln2)`` — reference ``src/hash.rs:132-134``.

    Rust's ``f64::round`` rounds half away from zero; Python's ``round``
    is banker's rounding, so use floor(x+0.5) for parity.
    """
    x = (float(m) / float(n)) * math.log(2.0)
    return int(math.floor(x + 0.5))


def calculate_level_fpr(target_fpr: float, num_levels: int, active_ratio: float) -> float:
    """Per-level FPR for a multi-level filter — reference
    ``src/hash.rs:150-159``. NOTE: dead code in the reference (the expiring
    filter sizes each level with the raw target fpr,
    ``src/ebloom/filter.rs:42-45``); kept for documentation parity.
    """
    effective_levels = 1.0 + (num_levels - 1) * active_ratio
    return 1.0 - (1.0 - target_fpr) ** (1.0 / effective_levels)


def calculate_optimal_params(
    capacity: int, target_fpr: float, num_levels: int, active_ratio: float
) -> tuple[float, int, int]:
    """(level_fpr, m, k) for a multi-level filter — reference
    ``src/hash.rs:175-192`` (also dead code there; kept for parity)."""
    level_fpr = calculate_level_fpr(target_fpr, num_levels, active_ratio)
    m = optimal_bit_vector_size(capacity, level_fpr)
    k = optimal_num_hashes(capacity, m)
    return level_fpr, m, k


# ---------------------------------------------------------------------------
# Vectorized batch kernels
# ---------------------------------------------------------------------------

def _pad_batch(items: np.ndarray | list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack a batch of byte strings into (N, maxlen) uint8 + lengths.

    maxlen is rounded up to a multiple of 4 (+4 pad) so block/tail gathers
    never go out of bounds.
    """
    n = len(items)
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    maxlen = ((maxlen + 4) // 4) * 4  # always >= len+1, multiple of 4
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(items):
        if b:
            buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return buf, lens


# long-lived padded-buffer scratch, keyed by caller slot. Python workers
# are reused across tasks (spark.python.worker.reuse), so one warm buffer
# per slot serves every task on the worker instead of fresh-faulting a
# multi-MB np.zeros per Arrow batch. Callers pass a slot name unique to
# their column so two live pads in one batch can never alias.
_PAD_SCRATCH: dict[str, np.ndarray] = {}


def _scratch_matrix(key: str | None, n: int, maxlen: int) -> np.ndarray:
    if key is None:
        return np.zeros((n, maxlen), dtype=np.uint8)
    need = n * maxlen
    buf = _PAD_SCRATCH.get(key)
    if buf is None or buf.size < need:
        buf = np.zeros(int(need * 1.25) + 4096, dtype=np.uint8)
        _PAD_SCRATCH[key] = buf
        return buf[:need].reshape(n, maxlen)
    view = buf[:need].reshape(n, maxlen)
    view.fill(0)  # memset over warm pages — cheap vs fresh page faults
    return view


def pad_batch_arrow(arr, scratch_key: str | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Pack an Arrow binary/string array into (N, maxlen) uint8 + lengths
    WITHOUT per-row Python: reads the Arrow offsets+data buffers directly
    and scatters with one vectorized gather. Null entries become length 0.

    ``scratch_key``: reuse a worker-lifetime scratch buffer for the padded
    matrix (see ``_PAD_SCRATCH``). The returned matrix is only valid until
    the next ``pad_batch_arrow`` call with the same key.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary() if pa.types.is_large_string(arr.type) else pa.binary())
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    lens = np.diff(offsets)
    if arr.null_count:
        valid_mask = np.asarray(arr.is_valid())
        lens = np.where(valid_mask, lens, 0)
    n = len(arr)
    maxlen = int(lens.max()) if n and lens.max() > 0 else 0
    maxlen = ((maxlen + 4) // 4) * 4
    out = _scratch_matrix(scratch_key, n, maxlen)
    if maxlen and n:
        # column-at-a-time copy: O(maxlen) small vector ops, never a
        # total-sized int64 index array (large fresh allocations fault
        # slowly on microVM memory; n-sized intermediates stay cached)
        offs = offsets[:-1]
        longest = int(lens.max())
        j = 0
        while j < longest:
            m = lens > j
            if m.all():
                out[:, j] = data[offs + j]
            else:
                sel = np.flatnonzero(m)
                out[sel, j] = data[offs[sel] + j]
            j += 1
    return out, lens


def murmur3_32_batch(buf: np.ndarray, lens: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized Murmur3 x86 32-bit over an (N, maxlen) uint8 matrix.

    Sequential over block index (maxlen/4 iterations), vectorized over rows
    — i.e. O(max_item_len) numpy ops per batch regardless of batch size.
    """
    n, maxlen = buf.shape
    c1 = U32(_C1)
    c2 = U32(_C2)
    h = np.full(n, seed, dtype=U32)
    # little-endian 4-byte blocks: on little-endian hosts a u32 view of the
    # byte matrix IS the block load (zero-copy); else assemble explicitly
    if np.little_endian and buf.flags.c_contiguous:
        blocks = buf.view(U32).reshape(n, maxlen // 4)
    else:
        b4 = buf.reshape(n, maxlen // 4, 4).astype(U32)
        blocks = (
            b4[:, :, 0]
            | (b4[:, :, 1] << U32(8))
            | (b4[:, :, 2] << U32(16))
            | (b4[:, :, 3] << U32(24))
        )
    nblocks = (lens // 4).astype(np.int64)
    max_blocks = int(nblocks.max()) if n else 0
    # in-place block loop: zero fresh allocations per block (the naive
    # expression form churns ~5 quarter-MB temporaries per block per
    # batch — real memory-fault cost on microVM hosts)
    k = np.empty(n, dtype=U32)
    hj = np.empty(n, dtype=U32)
    tmp = np.empty(n, dtype=U32)
    mask = np.empty(n, dtype=bool)
    for j in range(max_blocks):
        np.multiply(blocks[:, j], c1, out=k)
        np.left_shift(k, 15, out=tmp)
        np.right_shift(k, 17, out=k)
        np.bitwise_or(tmp, k, out=k)
        np.multiply(k, c2, out=k)
        np.bitwise_xor(h, k, out=hj)
        np.left_shift(hj, 13, out=tmp)
        np.right_shift(hj, 19, out=hj)
        np.bitwise_or(tmp, hj, out=hj)
        np.multiply(hj, U32(5), out=hj)
        np.add(hj, U32(0xE6546B64), out=hj)
        np.greater(nblocks, j, out=mask)
        np.copyto(h, hj, where=mask)
    # tail (1-3 trailing bytes)
    tail_len = (lens % 4).astype(np.int64)
    base = (nblocks * 4).astype(np.int64)
    rows = np.arange(n)
    b0 = buf[rows, base].astype(U32)
    b1 = buf[rows, np.minimum(base + 1, maxlen - 1)].astype(U32)
    b2 = buf[rows, np.minimum(base + 2, maxlen - 1)].astype(U32)
    k = np.zeros(n, dtype=U32)
    k = np.where(tail_len >= 3, k ^ (b2 << U32(16)), k)
    k = np.where(tail_len >= 2, k ^ (b1 << U32(8)), k)
    k = np.where(tail_len >= 1, k ^ b0, k)
    k = (k * c1).astype(U32)
    k = ((k << U32(15)) | (k >> U32(17))).astype(U32)
    k = (k * c2).astype(U32)
    h = np.where(tail_len >= 1, h ^ k, h)
    # finalize
    h = h ^ lens.astype(U32)
    h ^= h >> U32(16)
    h = (h * U32(0x85EBCA6B)).astype(U32)
    h ^= h >> U32(13)
    h = (h * U32(0xC2B2AE35)).astype(U32)
    h ^= h >> U32(16)
    return h


_FNV_PRIME_INV = pow(_FNV_PRIME, -1, 1 << 64)  # odd prime: invertible mod 2^64


def fnv1a64_batch(buf: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64-bit. Sequential over byte position, vectorized
    over rows — fine for short keys (urls); long-text callers should hash a
    digest instead.

    Branch-free trick: pad bytes are zero, and the FNV step over a zero
    byte is ``h = (h ^ 0) * prime = h * prime`` — a pure multiply, which is
    invertible mod 2^64 (prime is odd). So the loop runs unconditionally
    (two in-place ops per byte position, no masks, no fresh allocations)
    and each row is corrected once at the end by ``inv_prime^pad_count``.
    """
    n, maxlen = buf.shape
    h = np.full(n, _FNV_OFFSET, dtype=U64)
    prime = U64(_FNV_PRIME)
    max_len = int(lens.max()) if n else 0
    tmp = np.empty(n, dtype=U64)
    with np.errstate(over="ignore"):
        for pos in range(max_len):
            np.bitwise_xor(h, buf[:, pos], out=tmp, casting="unsafe")
            np.multiply(tmp, prime, out=h)
        # undo the pad-byte multiplies: h *= inv_prime^(max_len - len)
        pad = (max_len - np.minimum(lens, max_len)).astype(np.int64)
        if pad.any():
            inv_pows = np.empty(max_len + 1, dtype=U64)
            acc = 1
            for i in range(max_len + 1):
                inv_pows[i] = acc & 0xFFFFFFFFFFFFFFFF
                acc = (acc * _FNV_PRIME_INV) & 0xFFFFFFFFFFFFFFFF
            np.multiply(h, inv_pows[pad], out=h)
    return h


def bloom_index_padded(
    buf: np.ndarray, lens: np.ndarray, num_hashes: int, capacity: int
) -> np.ndarray:
    """(N, k) uint32 matrix of Bloom bit indices from a padded batch.

    Bit-identical to the reference's per-item
    ``default_hash_function(item, k, m)`` (``src/hash.rs:67-77``); u32
    output by construction (the reference's indices are u32,
    ``src/hash.rs:31``) — no int64 widening, halving index-matrix memory
    traffic on the build hot path.
    """
    h1 = murmur3_32_batch(buf, lens)
    h2 = (fnv1a64_batch(buf, lens) & U64(_M32)).astype(U32)
    i = np.arange(num_hashes, dtype=U32)
    with np.errstate(over="ignore"):
        return (h1[:, None] + i[None, :] * h2[:, None]).astype(U32) % U32(capacity)


def bloom_index_batch(
    items: np.ndarray | list[bytes], num_hashes: int, capacity: int
) -> np.ndarray:
    """As :func:`bloom_index_padded` but packing a list of byte strings."""
    buf, lens = _pad_batch(items)
    return bloom_index_padded(buf, lens, num_hashes, capacity)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — used as the cheap 64-bit mixer for
    paper-derived sketches (HLL/CMS/minhash) when hashes are produced
    Python-side. Public-domain algorithm (Steele et al.)."""
    z = (x.astype(U64) + U64(0x9E3779B97F4A7C15)).astype(U64)
    z = ((z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)).astype(U64)
    z = ((z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)).astype(U64)
    return z ^ (z >> U64(31))


_XXH_P1 = U64(0x9E3779B185EBCA87)
_XXH_P2 = U64(0xC2B2AE3D27D4EB4F)
_XXH_P3 = U64(0x165667B19E3779F9)
_XXH_P4 = U64(0x85EBCA77C2B2AE63)
_XXH_P5 = U64(0x27D4EB2F165667C5)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    rr = U64(r)
    return (x << rr) | (x >> (U64(64) - rr))


def xxh64_long(vals: np.ndarray, seed: int = 42) -> np.ndarray:
    """Vectorized XXH64 of 8-byte integer inputs, BIT-EQUAL to Spark's
    ``xxhash64(cast(x as bigint))`` (seed 42 — the XxHash64 expression's
    default). This is the bridge that lets a Python build kernel derive
    the same value a JVM probe expression computes from an integer column
    (the native cuckoo family's alternate-bucket hash) — pinned against
    live Spark output in ``tests/test_hashing.py``. Public XXH64
    single-lane path (Collet): seed+P5+len, one round-mixed 8-byte lane,
    avalanche finalizer."""
    with np.errstate(over="ignore"):
        x = np.asarray(vals).astype(np.int64, copy=False).view(U64)
        h = U64(int(seed)) + _XXH_P5 + U64(8)
        k1 = _rotl64(x * _XXH_P2, 31) * _XXH_P1
        h = _rotl64(h ^ k1, 27) * _XXH_P1 + _XXH_P4
        h ^= h >> U64(33)
        h = h * _XXH_P2
        h ^= h >> U64(29)
        h = h * _XXH_P3
        h ^= h >> U64(32)
        return h


def splitmix64_inplace(z: np.ndarray, tmp: np.ndarray) -> np.ndarray:
    """splitmix64 over a PRELOADED u64 array, in place, with one scratch
    array — bit-identical to :func:`splitmix64` (same wrapping u64 ops in
    the same order) but zero fresh allocations. The expression form churns
    ~6 full-size temporaries per call; on the big (rows × num_perm)
    minhash matrices that temporary traffic, not the arithmetic, is the
    cost (same class of fix as the in-place murmur block loop above)."""
    with np.errstate(over="ignore"):
        np.add(z, U64(0x9E3779B97F4A7C15), out=z)
        np.right_shift(z, U64(30), out=tmp)
        np.bitwise_xor(z, tmp, out=z)
        np.multiply(z, U64(0xBF58476D1CE4E5B9), out=z)
        np.right_shift(z, U64(27), out=tmp)
        np.bitwise_xor(z, tmp, out=z)
        np.multiply(z, U64(0x94D049BB133111EB), out=z)
        np.right_shift(z, U64(31), out=tmp)
        np.bitwise_xor(z, tmp, out=z)
    return z


def hash64_batch(items: np.ndarray | list[bytes]) -> np.ndarray:
    """64-bit hash of a byte-string batch: murmur32(seed 0) and fnv1a64
    combined through splitmix64. Used by HLL/CMS/minhash kernels when the
    JVM-side xxhash64 pre-hash path is not taken."""
    buf, lens = _pad_batch(items)
    lo = murmur3_32_batch(buf, lens).astype(U64)
    hi = fnv1a64_batch(buf, lens)
    return splitmix64((hi << U64(1)) ^ lo)
