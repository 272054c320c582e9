"""Layer 2 (SURVEY.md §5): Bloom behavioral gates, mirroring the
reference's test suite (tests/core_bloom_filter_tests.rs)."""

from __future__ import annotations

import numpy as np
import pytest

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.sketches.bloom import BloomConfig, BloomSketch


def seq_items(n: int) -> list[bytes]:
    # reference generator: tests/core_bloom_filter_tests.rs:27-31
    return [f"test_item_{i:06d}".encode() for i in range(n)]


def test_insert_contains_basics():
    sk = BloomSketch(BloomConfig(1000, 0.01))
    items = seq_items(100)
    sk.update_batch(items)
    assert sk.contains_batch(items).all()
    assert sk.insert_count == 100


def test_empty_filter_contains_nothing():
    sk = BloomSketch(BloomConfig(1000, 0.01))
    assert not sk.contains_batch(seq_items(50)).any()


def test_clear():
    sk = BloomSketch(BloomConfig(1000, 0.01))
    sk.update_batch(seq_items(100))
    sk.clear()
    assert sk.insert_count == 0
    assert not sk.contains_batch(seq_items(100)).any()


def test_edge_items():
    """Reference edge cases (tests/core_bloom_filter_tests.rs:296-394):
    empty item, 1 MB item, binary patterns."""
    sk = BloomSketch(BloomConfig(1000, 0.01))
    edge = [b"", b"\x2a" * (1 << 20), b"\x00" * 32, b"\xff" * 32, bytes(range(256))]
    sk.update_batch(edge)
    assert sk.contains_batch(edge).all()


def test_overload_beyond_capacity_no_false_negatives():
    sk = BloomSketch(BloomConfig(100, 0.1))
    items = seq_items(200)  # 2x capacity
    sk.update_batch(items)
    assert sk.contains_batch(items).all()


def test_zero_false_negatives():
    # reference gate: tests/core_bloom_filter_tests.rs:402-420
    sk = BloomSketch(BloomConfig(10_000, 0.01))
    items = seq_items(5_000)
    sk.update_batch(items)
    assert int(sk.contains_batch(items).sum()) == 5_000


def test_measured_fpr_within_3x_target():
    # reference gate: tests/core_bloom_filter_tests.rs:461-467
    # 50% fill, 2000 non-member probes, target 5%
    target = 0.05
    sk = BloomSketch(BloomConfig(4_000, target))
    sk.update_batch(seq_items(2_000))
    probes = [f"not_inserted_{i}".encode() for i in range(2_000)]
    fpr = sk.contains_batch(probes).mean()
    assert fpr <= 3 * target


def test_determinism_two_identical_builds():
    # reference: tests/core_bloom_filter_tests.rs:471-501
    a, b = BloomSketch(BloomConfig(1000, 0.01)), BloomSketch(BloomConfig(1000, 0.01))
    a.update_batch(seq_items(500))
    b.update_batch(seq_items(500))
    assert (a.bits == b.bits).all()
    assert a.to_bytes() == b.to_bytes()


def test_bulk_equals_individual():
    # reference: tests/core_bloom_filter_tests.rs:807-836
    a, b = BloomSketch(BloomConfig(1000, 0.01)), BloomSketch(BloomConfig(1000, 0.01))
    items = seq_items(300)
    a.update_batch(items)
    for it in items:
        b.update_batch([it])
    assert (a.bits == b.bits).all()
    probes = items[:150] + [f"nope_{i}".encode() for i in range(150)]
    assert (a.contains_batch(probes) == b.contains_batch(probes)).all()


def test_merge_is_bitwise_or_and_commutative():
    items = seq_items(1000)
    whole = BloomSketch(BloomConfig(2000, 0.01))
    whole.update_batch(items)
    parts = []
    for lo in range(0, 1000, 250):
        p = BloomSketch(BloomConfig(2000, 0.01))
        p.update_batch(items[lo : lo + 250])
        parts.append(p)
    import itertools

    for perm in itertools.permutations(range(4)):
        acc = BloomSketch.from_bytes(parts[perm[0]].to_bytes())
        for j in perm[1:]:
            acc.merge(BloomSketch.from_bytes(parts[j].to_bytes()))
        assert (acc.bits == whole.bits).all()
        assert acc.n_updates == 1000


def test_merge_incompatible_config_raises():
    a = BloomSketch(BloomConfig(1000, 0.01))
    b = BloomSketch(BloomConfig(2000, 0.01))
    with pytest.raises(SketchStateError):
        a.merge(b)


def test_config_validation():
    # reference: src/bloom/config.rs:31-44, tests in
    # core_bloom_config_validation_tests.rs
    with pytest.raises(SketchConfigError):
        BloomConfig(0, 0.01).validate()
    with pytest.raises(SketchConfigError):
        BloomConfig(100, 0.0).validate()
    with pytest.raises(SketchConfigError):
        BloomConfig(100, 1.0).validate()
    with pytest.raises(SketchConfigError):
        BloomConfig(100, -0.5).validate()
    # defaults: capacity 1M, fpr 0.01 (src/bloom/config.rs:10-14)
    c = BloomConfig()
    assert c.capacity == 1_000_000 and c.false_positive_rate == 0.01
    assert c.chunk_size_bytes == 4096


def test_config_rejects_m_beyond_uint32():
    # ADVICE r3 (medium): positions travel as uint32 in the build kernels
    # and the sparse-partial wire format — a filter whose m >= 2^32 would
    # silently wrap build positions while the native family's JVM probe
    # evaluates untruncated 64-bit expressions → false negatives. Must
    # fail at config validation, before any job launches.
    with pytest.raises(SketchConfigError, match="2\\^32"):
        BloomConfig(capacity=460_000_000, false_positive_rate=0.01).validate()
    with pytest.raises(SketchConfigError, match="2\\^32"):
        BloomSketch(BloomConfig(capacity=1_000_000_000))
    # just under the cap still validates (m < 2^32 at ~448M @ 1%)
    BloomConfig(capacity=440_000_000, false_positive_rate=0.01).validate()


def test_serialization_roundtrip_and_corruption():
    sk = BloomSketch(BloomConfig(1000, 0.01))
    sk.update_batch(seq_items(500))
    blob = sk.to_bytes()
    back = BloomSketch.from_bytes(blob)
    assert (back.bits == sk.bits).all()
    assert back.n_updates == 500
    with pytest.raises(SketchStateError):
        BloomSketch.from_bytes(b"XXXX" + blob[4:])
    with pytest.raises(SketchStateError):
        BloomSketch.from_bytes(blob[:10])


def test_chunk_extract_reconstruct_roundtrip():
    """Chunked state parity with reference pack/unpack
    (src/bloom/filter.rs:245-301): LSB-first bytes, sorted-by-id load."""
    sk = BloomSketch(BloomConfig(10_000, 0.01, chunk_size_bytes=512))
    sk.update_batch(seq_items(5_000))
    chunks = sk.extract_all_chunks()
    assert len(chunks) == (len(sk.bits) + 511) // 512
    fresh = BloomSketch(BloomConfig(10_000, 0.01, chunk_size_bytes=512))
    import random

    rng = random.Random(42)
    shuffled = chunks[:]
    rng.shuffle(shuffled)
    fresh.load_chunks(shuffled)
    assert (fresh.bits == sk.bits).all()


def test_dirty_chunk_tracking():
    sk = BloomSketch(BloomConfig(100_000, 0.01, chunk_size_bytes=512))
    sk.update_batch(seq_items(10))
    dirty = sk.extract_dirty_chunks()
    assert 0 < len(dirty) < len(sk.extract_all_chunks())
    sk.clear_dirty()
    assert sk.extract_dirty_chunks() == []
    sk.update_batch([b"one more"])
    assert 0 < len(sk.extract_dirty_chunks()) <= 7  # k=7 bits → ≤7 chunks


def test_lsb_first_bit_layout():
    """Bit i lives at byte i>>3, bit i&7 — the reference's LSB-first chunk
    packing (src/bloom/filter.rs:262-269)."""
    sk = BloomSketch(BloomConfig(100, 0.5))  # small m, k=1
    from probabilistic_rs_spark.functions.hashing import double_hash_indices

    item = b"layout-check"
    sk.update_batch([item])
    idx = double_hash_indices(item, sk.k, sk.m)
    unpacked = np.unpackbits(sk.bits, bitorder="little")
    assert all(unpacked[i] == 1 for i in idx)
    assert unpacked.sum() == len(set(idx))


def test_stats():
    sk = BloomSketch(BloomConfig(10_000, 0.01))
    assert sk.approx_memory_bits() >= sk.m
    assert 9 < sk.bits_per_item() < 11  # ~9.6 bits/item at 1%
    sk.update_batch(seq_items(100))
    assert sk.insert_count == 100
    assert 0 < sk.fill_ratio() < 0.01


class TestPartialBuilder:
    """BloomPartialBuilder: dense-free partial build must be wire-format
    identical to the dense path at every fill level (and bounded in
    memory via the collapse-to-dense switch)."""

    def test_builder_matches_dense_sparse_regime(self):
        from probabilistic_rs_spark.sketches.bloom import (
            BloomConfig,
            BloomPartialBuilder,
            BloomSketch,
        )

        cfg = BloomConfig(capacity=500_000, false_positive_rate=0.01)
        items = [f"item_{i:06d}".encode() for i in range(20_000)]
        b = BloomPartialBuilder(cfg)
        d = BloomSketch(cfg)
        for lo in range(0, len(items), 3000):  # multiple batches
            b.update_batch(items[lo : lo + 3000])
            d.update_batch(items[lo : lo + 3000])
        assert b.dense is None  # stayed sparse
        assert b.to_bytes() == d.to_bytes()
        assert b.n_updates == d.n_updates == 20_000

    def test_builder_collapse_to_dense_regime(self):
        from probabilistic_rs_spark.sketches.bloom import (
            BloomConfig,
            BloomPartialBuilder,
            BloomSketch,
        )

        # tiny capacity: indices quickly outweigh the dense array
        cfg = BloomConfig(capacity=2_000, false_positive_rate=0.01)
        items = [f"x{i}".encode() for i in range(4_000)]
        b = BloomPartialBuilder(cfg)
        d = BloomSketch(cfg)
        for lo in range(0, len(items), 500):
            b.update_batch(items[lo : lo + 500])
            d.update_batch(items[lo : lo + 500])
        assert b.dense is not None  # collapsed: memory stayed bounded
        assert b.to_bytes() == d.to_bytes()
        sk = BloomSketch.from_bytes(b.to_bytes())
        assert sk.contains_batch(items).all()

    def test_builder_empty(self):
        from probabilistic_rs_spark.sketches.bloom import (
            BloomConfig,
            BloomPartialBuilder,
            BloomSketch,
        )

        b = BloomPartialBuilder(BloomConfig(capacity=1000))
        sk = BloomSketch.from_bytes(b.to_bytes())
        assert sk.n_updates == 0 and sk.fill_ratio() == 0.0
