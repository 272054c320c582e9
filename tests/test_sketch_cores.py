"""Layers 2+3 (SURVEY.md §5): statistical bounds per structure and merge
algebra — bit-equality for HLL/CMS under shuffled merge orders,
bound-invariance for t-digest/KLL."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.functions.hashing import hash64_batch
from probabilistic_rs_spark.sketches import (
    CountMinSketch,
    HyperLogLog,
    KLLSketch,
    TDigest,
)


def hashes_for(n: int, prefix: str = "item") -> np.ndarray:
    return hash64_batch([f"{prefix}_{i}".encode() for i in range(n)])


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------

class TestHLL:
    def test_sparse_mode_exact(self):
        sk = HyperLogLog(p=14)
        sk.update_hashes(hashes_for(3000))
        assert sk.estimate() == 3000.0

    def test_sparse_dedupes(self):
        sk = HyperLogLog(p=14)
        h = hashes_for(100)
        for _ in range(5):
            sk.update_hashes(h)
        assert sk.estimate() == 100.0
        assert sk.n_updates == 500

    @pytest.mark.parametrize("p", [12, 14])
    def test_dense_error_bound(self, p):
        sk = HyperLogLog(p=p, sparse_threshold=0)
        n = 200_000
        sk.update_hashes(hashes_for(n))
        rel_err = abs(sk.estimate() - n) / n
        # assert at 3x the 1σ bound (deterministic data — observed ≪ bound)
        assert rel_err <= 3 * 1.04 / np.sqrt(1 << p)

    def test_merge_bit_equality_any_order(self):
        parts = []
        for j in range(4):
            sk = HyperLogLog(p=12, sparse_threshold=64)
            sk.update_hashes(hashes_for(5000, prefix=f"p{j}"))
            parts.append(sk.to_bytes())
        ref = None
        for perm in itertools.permutations(range(4)):
            acc = HyperLogLog.from_bytes(parts[perm[0]])
            for j in perm[1:]:
                acc.merge(HyperLogLog.from_bytes(parts[j]))
            blob_regs = acc.registers.tobytes()
            if ref is None:
                ref = blob_regs
            assert blob_regs == ref

    def test_sparse_dense_mixed_merge(self):
        big = HyperLogLog(p=12, sparse_threshold=16)
        big.update_hashes(hashes_for(10_000))
        small = HyperLogLog(p=12, sparse_threshold=16)
        small.update_hashes(hashes_for(10, prefix="s"))
        merged = HyperLogLog.from_bytes(big.to_bytes()).merge(small)
        merged2 = HyperLogLog.from_bytes(small.to_bytes()).merge(big)
        assert merged.registers.tobytes() == merged2.registers.tobytes()

    def test_serde_roundtrip(self):
        sk = HyperLogLog(p=10, sparse_threshold=8)
        sk.update_hashes(hashes_for(1000))
        back = HyperLogLog.from_bytes(sk.to_bytes())
        assert back.estimate() == sk.estimate()
        assert back.n_updates == sk.n_updates

    def test_config_validation(self):
        with pytest.raises(SketchConfigError):
            HyperLogLog(p=3)
        with pytest.raises(SketchConfigError):
            HyperLogLog(p=19)
        with pytest.raises(SketchStateError):
            HyperLogLog(p=10).merge(HyperLogLog(p=12))


# ---------------------------------------------------------------------------
# CMS
# ---------------------------------------------------------------------------

class TestCMS:
    def test_exact_at_low_load(self):
        cms = CountMinSketch(eps=0.0001, delta=0.001)
        counts = np.arange(1, 101)
        keys = np.repeat(np.arange(100), counts)
        cms.update_hashes(hash64_batch([f"k{i}".encode() for i in keys]))
        est = cms.estimate_hashes(hash64_batch([f"k{i}".encode() for i in range(100)]))
        assert (est == counts).all()

    def test_never_underestimates(self):
        cms = CountMinSketch(eps=0.01, delta=0.05)  # tiny table → collisions
        n_keys, reps = 5000, 3
        keys = np.tile(np.arange(n_keys), reps)
        cms.update_hashes(hash64_batch([f"k{i}".encode() for i in keys]))
        est = cms.estimate_hashes(hash64_batch([f"k{i}".encode() for i in range(n_keys)]))
        assert (est >= reps).all()

    def test_eps_n_overestimate_bound(self):
        cms = CountMinSketch(eps=0.001, delta=0.01)
        n_keys, reps = 20_000, 2
        keys = np.tile(np.arange(n_keys), reps)
        cms.update_hashes(hash64_batch([f"k{i}".encode() for i in keys]))
        est = cms.estimate_hashes(hash64_batch([f"k{i}".encode() for i in range(n_keys)]))
        overshoot = est - reps
        bound = cms.error_bound()  # eps * N
        frac_violating = (overshoot > bound).mean()
        assert frac_violating <= cms.delta

    def test_weighted_updates(self):
        cms = CountMinSketch(eps=0.0001, delta=0.001)
        h = hash64_batch([b"a", b"b"])
        cms.update_hashes(h, np.array([10, 32]))
        assert cms.estimate_hashes(h).tolist() == [10, 32]
        assert cms.n_total == 42

    def test_merge_bit_equality_any_order(self):
        parts = []
        for j in range(4):
            cms = CountMinSketch(eps=0.001, delta=0.01)
            cms.update_hashes(hashes_for(2000, prefix=f"p{j}"))
            parts.append(cms.to_bytes())
        ref = None
        for perm in itertools.permutations(range(4)):
            acc = CountMinSketch.from_bytes(parts[perm[0]])
            for j in perm[1:]:
                acc.merge(CountMinSketch.from_bytes(parts[j]))
            blob = acc.table.tobytes()
            ref = ref or blob
            assert blob == ref

    def test_serde_and_validation(self):
        cms = CountMinSketch(eps=0.01, delta=0.1)
        cms.update_hashes(hashes_for(100))
        back = CountMinSketch.from_bytes(cms.to_bytes())
        assert (back.table == cms.table).all()
        with pytest.raises(SketchConfigError):
            CountMinSketch(eps=0.0)
        with pytest.raises(SketchConfigError):
            CountMinSketch(delta=1.5)
        with pytest.raises(SketchStateError):
            CountMinSketch(eps=0.01).merge(CountMinSketch(eps=0.001))


# ---------------------------------------------------------------------------
# quantile sketches
# ---------------------------------------------------------------------------

QS = [0.01, 0.25, 0.5, 0.75, 0.99]


def rank_of(sorted_vals: np.ndarray, x: float) -> float:
    return np.searchsorted(sorted_vals, x, side="right") / len(sorted_vals)


def make_datasets():
    rng = np.random.default_rng(42)
    return {
        "lognormal": rng.lognormal(6, 1.2, 100_000),
        "uniform": rng.uniform(-1000, 1000, 100_000),
        "bimodal": np.concatenate(
            [rng.normal(0, 1, 50_000), rng.normal(1000, 10, 50_000)]
        ),
        "sorted": np.arange(100_000, dtype=np.float64),
    }


class TestTDigest:
    @pytest.mark.parametrize("name", ["lognormal", "uniform", "bimodal", "sorted"])
    def test_rank_error_bound(self, name):
        data = make_datasets()[name]
        td = TDigest(delta=200.0)
        for lo in range(0, len(data), 10_000):
            td.update_values(data[lo : lo + 10_000])
        sv = np.sort(data)
        for q, est in zip(QS, td.quantile(np.array(QS))):
            assert abs(rank_of(sv, est) - q) <= 0.01, (name, q)

    def test_centroid_budget(self):
        td = TDigest(delta=100.0)
        td.update_values(np.random.default_rng(1).normal(0, 1, 50_000))
        assert td.n_centroids <= 100

    def test_merge_bound_invariance(self):
        data = make_datasets()["lognormal"]
        sv = np.sort(data)
        parts = []
        for j in range(4):
            td = TDigest(delta=200.0)
            td.update_values(data[j * 25_000 : (j + 1) * 25_000])
            parts.append(td.to_bytes())
        for perm in itertools.permutations(range(4)):
            acc = TDigest.from_bytes(parts[perm[0]])
            for j in perm[1:]:
                acc.merge(TDigest.from_bytes(parts[j]))
            for q, est in zip(QS, acc.quantile(np.array(QS))):
                assert abs(rank_of(sv, est) - q) <= 0.015

    def test_nan_dropped_and_serde(self):
        td = TDigest(delta=100.0)
        td.update_values(np.array([1.0, np.nan, 3.0]))
        assert td.total_weight == 2.0
        back = TDigest.from_bytes(td.to_bytes())
        assert back.quantile(0.5) == td.quantile(0.5)

    def test_extremes_exact(self):
        td = TDigest(delta=100.0)
        td.update_values(np.arange(10_000, dtype=np.float64))
        assert float(td.quantile(0.0)[0]) == 0.0
        assert float(td.quantile(1.0)[0]) == 9999.0


class TestKLL:
    @pytest.mark.parametrize("name", ["lognormal", "uniform", "bimodal", "sorted"])
    def test_rank_error_bound(self, name):
        data = make_datasets()[name]
        kll = KLLSketch(k=200)
        for lo in range(0, len(data), 10_000):
            kll.update_values(data[lo : lo + 10_000])
        sv = np.sort(data)
        for q, est in zip(QS, kll.quantile(np.array(QS))):
            assert abs(rank_of(sv, est) - q) <= kll.rank_error_bound(), (name, q)

    def test_space_bound(self):
        kll = KLLSketch(k=128)
        kll.update_values(np.random.default_rng(2).uniform(0, 1, 500_000))
        # geometric schedule: total retained ≈ k/(1-c) = 3k
        assert kll.n_retained <= 3 * 128 + 64

    def test_merge_bound_invariance(self):
        data = make_datasets()["bimodal"]
        sv = np.sort(data)
        parts = []
        for j in range(4):
            kll = KLLSketch(k=256)
            kll.update_values(data[j * 25_000 : (j + 1) * 25_000])
            parts.append(kll.to_bytes())
        for perm in itertools.permutations(range(4)):
            acc = KLLSketch.from_bytes(parts[perm[0]])
            for j in perm[1:]:
                acc.merge(KLLSketch.from_bytes(parts[j]))
            for q, est in zip(QS, acc.quantile(np.array(QS))):
                assert abs(rank_of(sv, est) - q) <= 2 * acc.rank_error_bound()

    def test_deterministic_identical_builds(self):
        a, b = KLLSketch(k=128), KLLSketch(k=128)
        data = np.random.default_rng(3).uniform(0, 1, 30_000)
        a.update_values(data)
        b.update_values(data)
        assert a.to_bytes() == b.to_bytes()

    def test_small_n_exact(self):
        kll = KLLSketch(k=200)
        kll.update_values(np.arange(100, dtype=np.float64))
        assert float(kll.quantile(0.5)[0]) == 49.0
