"""Native-hash (JVM-probe) Bloom family — correctness, accuracy gates,
family-separation, and plan hygiene.

The same gates the reference asserts for its filter
(``tests/core_bloom_filter_tests.rs:402-420`` zero false negatives,
``:461-467`` FPR bound) are reproduced for the xxhash64 position family,
plus cross-checks that the Python ``contains_positions`` kernel and the
JVM expression probe agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from probabilistic_rs_spark.errors import SketchStateError
from probabilistic_rs_spark.operators.membership import (
    build_native_bloom_state,
    native_bloom_probe,
    native_bloom_semi_filter,
)
from probabilistic_rs_spark.operators.sketch_agg import (
    SketchSpec,
    native_bloom_position_exprs,
    sketch_aggregate,
)
from probabilistic_rs_spark.sketches.bloom import BloomConfig, BloomSketch
from probabilistic_rs_spark.sketches.native_bloom import (
    NativeBloomPartialBuilder,
    NativeBloomSketch,
)

SF = "/root/testdata/sf0.001"


def _keys(spark, n, prefix="key_"):
    return spark.range(n).select(F.concat(F.lit(prefix), F.col("id")).alias("k"))


class TestNativeBloomCore:
    def test_state_roundtrip_and_words_layout(self):
        sk = NativeBloomSketch(BloomConfig(capacity=1000, false_positive_rate=0.01))
        pos = np.array([[0, 7, 63, 64, 65, 127, int(sk.m) - 1]], dtype=np.int64)[
            :, : sk.k
        ]
        sk.update_positions(pos)
        back = NativeBloomSketch.from_bytes(sk.to_bytes())
        assert np.array_equal(back.bits, sk.bits)
        assert back.n_updates == 1
        # words(): bit b must be readable at word[b>>6] >> (b&63) & 1
        words = back.words().view(np.uint64)
        for b in pos.ravel().tolist():
            assert (int(words[b >> 6]) >> (b & 63)) & 1 == 1

    def test_family_separation_raises(self):
        """A native state can never be loaded/probed as a parity state."""
        nsk = NativeBloomSketch(BloomConfig(capacity=1000))
        nsk.update_positions(np.arange(nsk.k, dtype=np.int64).reshape(1, -1))
        blob = nsk.to_bytes()
        with pytest.raises(SketchStateError):
            BloomSketch.from_bytes(blob)
        psk = BloomSketch(BloomConfig(capacity=1000))
        psk.update_batch([b"x"])
        with pytest.raises(SketchStateError):
            NativeBloomSketch.from_bytes(psk.to_bytes())
        with pytest.raises(SketchStateError):
            nsk.update_batch([b"x"])
        with pytest.raises(SketchStateError):
            nsk.contains_batch([b"x"])

    def test_partial_builder_matches_dense_sketch(self):
        rng = np.random.default_rng(7)
        cfg = BloomConfig(capacity=5000, false_positive_rate=0.01)
        dense = NativeBloomSketch(cfg)
        builder = NativeBloomPartialBuilder(cfg)
        pos = rng.integers(0, dense.m, size=(400, dense.k), dtype=np.int64)
        dense.update_positions(pos)
        builder.update_positions(pos)
        rebuilt = NativeBloomSketch.from_bytes(builder.to_bytes())
        assert np.array_equal(rebuilt.bits, dense.bits)
        assert rebuilt.n_updates == dense.n_updates == 400

    def test_merge_is_commutative_bitwise(self):
        rng = np.random.default_rng(11)
        cfg = BloomConfig(capacity=2000)
        a, b = NativeBloomSketch(cfg), NativeBloomSketch(cfg)
        a.update_positions(rng.integers(0, a.m, size=(100, a.k), dtype=np.int64))
        b.update_positions(rng.integers(0, b.m, size=(150, b.k), dtype=np.int64))
        ab = NativeBloomSketch.from_bytes(a.to_bytes()).merge(b)
        ba = NativeBloomSketch.from_bytes(b.to_bytes()).merge(a)
        assert np.array_equal(ab.bits, ba.bits)
        assert ab.n_updates == ba.n_updates == 250


@pytest.mark.usefixtures("spark")
class TestNativeBloomSpark:
    def test_zero_false_negatives_and_fpr_bound(self, spark):
        """Reference gates distributed: 0 FN over all members; measured
        FPR <= 3x target at full capacity fill over 20k never-inserted
        probes (mirrors tests/core_bloom_filter_tests.rs:461-467)."""
        target = 0.02
        n = 20_000
        members = _keys(spark, n)
        state = build_native_bloom_state(
            members, "k", capacity=n, false_positive_rate=target
        )
        fn = (
            native_bloom_probe(members, "k", state)
            .where(~F.col("is_member"))
            .count()
        )
        assert fn == 0
        strangers = _keys(spark, 20_000, prefix="never_")
        fp = (
            native_bloom_probe(strangers, "k", state)
            .where(F.col("is_member"))
            .count()
        )
        assert fp / 20_000 <= 3.0 * target

    def test_python_kernel_and_jvm_probe_agree(self, spark):
        members = _keys(spark, 5000)
        state = build_native_bloom_state(members, "k", capacity=5000)
        sk = NativeBloomSketch.from_bytes(state)
        mixed = _keys(spark, 4000).union(_keys(spark, 4000, prefix="no_"))
        pos_rows = mixed.select(
            "k",
            F.array(*native_bloom_position_exprs(F.col("k"), sk.m, sk.k)).alias("p"),
        ).collect()
        pos = np.array([r["p"] for r in pos_rows], dtype=np.int64)
        py = sk.contains_positions(pos)
        jvm = {
            r["k"]: r["is_member"]
            for r in native_bloom_probe(mixed, "k", state).collect()
        }
        assert all(jvm[r["k"]] == bool(py[i]) for i, r in enumerate(pos_rows))

    def test_merge_invariant_to_parallelism(self, spark):
        """Bit-identical final state at 1 vs 8 partitions (associativity/
        commutativity contract of the north rule)."""
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        s1 = build_native_bloom_state(
            orders.coalesce(1), "o_custkey", capacity=10_000, tree_fanin=None
        )
        s8 = build_native_bloom_state(
            orders.repartition(8), "o_custkey", capacity=10_000, tree_fanin=None
        )
        a = NativeBloomSketch.from_bytes(s1)
        b = NativeBloomSketch.from_bytes(s8)
        assert np.array_equal(a.bits, b.bits)
        assert a.n_updates == b.n_updates

    def test_semi_filter_exact_after_join(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
        state = build_native_bloom_state(
            urgent, "o_orderkey", capacity=max(1000, urgent.count())
        )
        pre = native_bloom_semi_filter(li, "l_orderkey", state)
        exact = pre.join(
            F.broadcast(urgent.select("o_orderkey")),
            pre["l_orderkey"] == F.col("o_orderkey"),
            "left_semi",
        )
        expected = li.join(
            urgent.select("o_orderkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left_semi",
        )
        assert exact.count() == expected.count()

    def test_probe_plan_is_jvm_only_no_shuffle(self, spark):
        """The whole point of the family: no Python evaluation node and no
        shuffle exchange anywhere in the probe plan."""
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        state = build_native_bloom_state(orders, "o_orderkey", capacity=50_000)
        probed = native_bloom_probe(
            orders.select("o_orderkey"), "o_orderkey", state
        ).where(F.col("is_member"))
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan

    def test_nbloom_composes_in_multisketch_aggregate(self, spark):
        """nbloom rides the same sketch_aggregate pass as the other kinds
        (grouped, alongside an HLL) and round-trips through the group
        merge."""
        ev = spark.read.parquet(f"{SF}/events.parquet")
        agg = sketch_aggregate(
            ev,
            ["event_type"],
            [
                SketchSpec("users_f", "nbloom", "user_id", {"capacity": 50_000}),
                SketchSpec("users_h", "hll", "user_id", {"p": 12}),
            ],
        )
        rows = agg.collect()
        assert len(rows) > 0
        for r in rows:
            sk = NativeBloomSketch.from_bytes(bytes(r["users_f_state"]))
            assert sk.n_updates > 0
