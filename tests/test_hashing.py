"""Layer 1 (SURVEY.md §5): pure kernel tests — hash parity against pinned
vectors, sizing formulas vs literature values (reference
``src/hash.rs:194-291``), pack/unpack round-trips."""

from __future__ import annotations

import numpy as np
import pytest

from probabilistic_rs_spark.functions import hashing as H


# Pinned public murmur3_x86_32 seed-0 vectors (smhasher / pymmh3 suites)
MURMUR_VECTORS = {
    b"": 0x00000000,
    b"a": 0x3C2569B2,
    b"hello": 0x248BFA47,
    b"test": 0xBA6BD213,
}

# FNV-1a 64 canonical vectors (Landon Curt Noll's published test suite)
FNV_VECTORS = {
    b"": 0xCBF29CE484222325,
    b"a": 0xAF63DC4C8601EC8C,
}


def test_murmur3_pinned_vectors():
    for data, want in MURMUR_VECTORS.items():
        assert H.murmur3_32(data) == want


def test_fnv1a64_pinned_vectors():
    for data, want in FNV_VECTORS.items():
        assert H.fnv1a64(data) == want


def test_batch_parity_with_scalar():
    """Vectorized kernels must be byte-identical to the scalar spec across
    random lengths 0..130 incl. block/tail boundaries."""
    rng = np.random.default_rng(42)
    items = [bytes(rng.integers(0, 256, rng.integers(0, 131)).tolist()) for _ in range(400)]
    items += [b"", b"\x00" * 4, b"\xff" * 64, bytes(range(256))]
    buf, lens = H._pad_batch(items)
    mv = H.murmur3_32_batch(buf, lens)
    fv = H.fnv1a64_batch(buf, lens)
    for i, it in enumerate(items):
        assert int(mv[i]) == H.murmur3_32(it)
        assert int(fv[i]) == H.fnv1a64(it)


def test_double_hash_parity():
    """Index derivation parity with reference default_hash_function
    (src/hash.rs:67-77): (h1 + i*h2 wrapping u32) % m."""
    items = [f"test_item_{i:06d}".encode() for i in range(200)]
    idx = H.bloom_index_batch(items, 7, 95851)
    for i, it in enumerate(items):
        assert list(idx[i]) == H.double_hash_indices(it, 7, 95851)


def test_arrow_pad_batch_parity():
    import pyarrow as pa

    items = [b"", b"abc", None, b"x" * 100, "héllo".encode()]
    arr = pa.array(items, type=pa.binary())
    buf, lens = H.pad_batch_arrow(arr)
    assert lens.tolist() == [0, 3, 0, 100, 6]
    assert bytes(buf[1, :3]) == b"abc"
    assert bytes(buf[3, :100]) == b"x" * 100
    # string arrays too
    sarr = pa.array(["ab", None, "cdef"])
    buf, lens = H.pad_batch_arrow(sarr)
    assert lens.tolist() == [2, 0, 4]
    assert bytes(buf[2, :4]) == b"cdef"


def test_optimal_sizing_literature_values():
    """Reference src/hash.rs:199-249: m≈95,850 bits for 10k @ 1%;
    linear scaling; k≈7 at m/n=10; k doubles with m/n."""
    m = H.optimal_bit_vector_size(10_000, 0.01)
    assert 90_000 < m < 100_000
    m2 = H.optimal_bit_vector_size(1_000, 0.001)
    assert 13_000 < m2 < 16_000
    assert H.optimal_bit_vector_size(1, 0.5) > 0
    ratio = H.optimal_bit_vector_size(10_000, 0.01) / H.optimal_bit_vector_size(1_000, 0.01)
    assert 9.0 < ratio < 11.0
    k = H.optimal_num_hashes(1_000, 10_000)
    assert 6 <= k <= 8
    k2 = H.optimal_num_hashes(1_000, 20_000)
    assert 1.8 < k2 / k < 2.2


def test_hash_distribution_uniformity():
    """Reference src/hash.rs:251-290: coverage and mean-ratio gates."""
    capacity, num_samples = 10_000, 1_000
    items = [f"test_data_{i}".encode() for i in range(num_samples)]
    idx = H.bloom_index_batch(items, 1, capacity).ravel()
    counts = np.bincount(idx, minlength=capacity)
    coverage = (counts > 0).mean()
    assert coverage > 0.05
    mean_ratio = counts.mean() / (num_samples / capacity)
    assert 0.8 < mean_ratio < 1.2


def test_level_fpr_helper():
    lf = H.calculate_level_fpr(0.01, 3, 0.5)
    assert 0.0 < lf < 0.01


def test_splitmix64_determinism():
    x = np.arange(10, dtype=np.uint64)
    a, b = H.splitmix64(x), H.splitmix64(x)
    assert (a == b).all()
    assert len(np.unique(a)) == 10


def test_xxh64_long_pinned_spark_parity():
    """Pinned against live Spark `xxhash64(cast(x as bigint))` output
    (seed 42) — the bridge the native cuckoo family's Python build uses
    to mirror the JVM probe expressions. Vectors captured from Spark
    4.1.2 in this environment."""
    import numpy as np

    from probabilistic_rs_spark.functions.hashing import xxh64_long

    vectors = {
        0: -5252525462095825812,
        1: -7001672635703045582,
        42: -6876166290308861218,
        -1: 3858142552250413010,
        123456789: 3415128141240069951,
        -987654321: 5435279837322829586,
        (1 << 63) - 1: -3246596055638297850,
        -(1 << 63): -8619748838626508300,
        0xDEADBEEF: -4661190416160088710,
    }
    xs = np.array(list(vectors.keys()), dtype=np.int64)
    got = xxh64_long(xs).view(np.int64).tolist()
    assert got == list(vectors.values())
    # a different seed must change the output (routing-hash chain safety)
    assert xxh64_long(xs, seed=0).view(np.int64).tolist() != got
