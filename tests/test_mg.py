"""Misra–Gries summary: kernel contracts, the PODS'12 merge-bound
invariant, and the Spark operators (``operators/heavy_hitters.py::
mg_states / mg_topk``).

The determinism contract is BOUND-INVARIANCE (like t-digest/KLL):
counter values may differ by merge tree, but every tree preserves
``est <= true <= est + D`` with ``D = (n_total − M)/(k+1)`` computable
from the state alone — and in the no-compaction regime (per-group key
cardinality ≤ k everywhere) every count is exact under any tree.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.sketches.base import TYPE_MG, peek_type
from probabilistic_rs_spark.sketches.mg import MisraGries


def _zipf_keys(seed: int, n: int, a: float = 1.3) -> list[str]:
    rng = np.random.default_rng(seed)
    return [f"k{int(i)}" for i in rng.zipf(a, n)]


def _assert_bound(mg: MisraGries, true: Counter) -> None:
    d = mg.max_undercount()
    for key, t in true.items():
        est = mg.estimate(key)
        assert est <= t <= est + d + 1e-9, (key, est, t, d)
    # any key with true count > D is guaranteed retained
    for key, t in true.items():
        if t > d:
            assert mg.estimate(key) > 0, (key, t, d)
    # retained keys never overcount
    for key, v in mg.counts.items():
        assert v <= true[key.decode("utf-8")]


class TestKernel:
    def test_config_validation(self):
        with pytest.raises(SketchConfigError):
            MisraGries(k=0)
        with pytest.raises(SketchConfigError):
            MisraGries(k=1 << 23)
        MisraGries(k=1)

    def test_exact_regime(self):
        keys = _zipf_keys(1, 2000)
        mg = MisraGries(k=4096)
        mg.update_batch(keys)
        true = Counter(keys)
        assert mg.is_exact
        assert mg.max_undercount() == 0.0
        assert all(mg.estimate(k) == v for k, v in true.items())
        assert mg.top(threshold=2) == sorted(
            ((k.encode(), v) for k, v in true.items() if v >= 2),
            key=lambda kv: (-kv[1], kv[0]),
        )

    def test_compaction_bound_holds(self):
        keys = _zipf_keys(2, 50_000)
        mg = MisraGries(k=64)
        mg.update_batch(keys)
        assert len(mg.counts) <= 64
        assert not mg.is_exact
        _assert_bound(mg, Counter(keys))

    def test_batch_split_equals_one_shot(self):
        """Feeding one batch or many batches yields the same state
        (compaction points are per-call but the invariant and the exact
        regime result are identical; in exact regime states are equal)."""
        keys = _zipf_keys(3, 1500)
        one = MisraGries(k=4096)
        one.update_batch(keys)
        many = MisraGries(k=4096)
        for chunk in np.array_split(np.array(keys, dtype=object), 13):
            many.update_batch(list(chunk))
        assert one.to_bytes() == many.to_bytes()

    def test_merge_tree_bound_invariance(self):
        keys = _zipf_keys(4, 40_000)
        true = Counter(keys)
        parts = np.array_split(np.array(keys, dtype=object), 9)
        sks = []
        for p in parts:
            s = MisraGries(k=64)
            s.update_batch(list(p))
            sks.append(s)
        left = MisraGries.from_bytes(sks[0].to_bytes())
        for s in sks[1:]:
            left.merge(s)
        right = MisraGries.from_bytes(sks[-1].to_bytes())
        for s in reversed(sks[:-1]):
            right.merge(s)
        for m in (left, right):
            assert m.n_total == len(keys)
            assert m.max_undercount() <= len(keys) / 65
            _assert_bound(m, true)

    def test_merge_k_mismatch_raises(self):
        with pytest.raises(SketchConfigError):
            MisraGries(k=8).merge(MisraGries(k=16))

    def test_update_padded_matches_update_batch(self):
        """The vectorized Arrow path (padded matrix + composite-row
        np.unique pre-aggregation) absorbs exactly what the plain path
        does — including keys with trailing NUL bytes, which must not
        alias shorter keys + zero padding."""
        items = [b"aa", b"aa\x00", b"b", b"", b"aa", b"b\x00\x00", b"b"]
        maxlen = max(len(i) for i in items)
        buf = np.zeros((len(items), maxlen), dtype=np.uint8)
        lens = np.zeros(len(items), dtype=np.int64)
        for i, it in enumerate(items):
            buf[i, : len(it)] = np.frombuffer(it, dtype=np.uint8)
            lens[i] = len(it)
        a = MisraGries(k=64)
        a.update_padded(buf, lens)
        b = MisraGries(k=64)
        b.update_batch(items)
        assert a.to_bytes() == b.to_bytes()
        assert a.estimate(b"aa") == 2
        assert a.estimate(b"aa\x00") == 1
        assert a.estimate(b"b") == 2
        assert a.estimate(b"b\x00\x00") == 1
        assert a.estimate(b"") == 1

    def test_serde_round_trip_and_peek(self):
        keys = _zipf_keys(5, 10_000)
        mg = MisraGries(k=64)
        mg.update_batch(keys)
        b = mg.to_bytes()
        assert peek_type(b) == TYPE_MG
        back = MisraGries.from_bytes(b)
        assert back.to_bytes() == b
        assert back.counts == mg.counts
        assert back.n_total == mg.n_total

    def test_corrupt_states_raise(self):
        mg = MisraGries(k=64)
        mg.update_batch(["x", "y", "z"])
        b = mg.to_bytes()
        with pytest.raises(SketchStateError):
            MisraGries.from_bytes(b[:-1])  # truncated key bytes

    def test_empty_state(self):
        mg = MisraGries(k=64)
        assert mg.top() == []
        assert mg.max_undercount() == 0.0
        back = MisraGries.from_bytes(mg.to_bytes())
        assert back.counts == {}


class TestSparkOperators:
    def test_mg_topk_exact_regime_matches_sql(self, spark, sf_correct):
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.heavy_hitters import mg_topk

        li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
        got = {
            r["key"]: r["est_count"]
            for r in mg_topk(li, "l_suppkey", k=4096, threshold=650).collect()
        }
        exact = {
            str(r["l_suppkey"]): r["n"]
            for r in li.groupBy("l_suppkey")
            .agg(F.count("*").alias("n"))
            .where("n >= 650")
            .collect()
        }
        assert got == exact

    def test_mg_topk_grouped_with_guarantee_cols(self, spark, sf_correct):
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.heavy_hitters import mg_topk

        ev = spark.read.parquet(f"{sf_correct}/events.parquet")
        out = mg_topk(ev, "user_id", ["event_type"], k=2048, threshold=1)
        rows = out.collect()
        exact = {
            (r["event_type"], str(r["user_id"])): r["n"]
            for r in ev.groupBy("event_type", "user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert len(rows) == len(exact)
        for r in rows:
            assert r["max_undercount"] == 0.0  # 150 users << k: exact regime
            assert r["est_count"] == exact[(r["event_type"], r["key"])]

    def test_mg_topk_compaction_regime_bound(self, spark, sf_correct):
        """k far below the key cardinality: the distributed build must
        still satisfy est <= true <= est + max_undercount for every
        emitted key, and must retain every key with true > bound."""
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.heavy_hitters import mg_topk

        li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
        out = mg_topk(li, "l_partkey", k=128, threshold=1).collect()
        exact = {
            str(r["l_partkey"]): r["n"]
            for r in li.groupBy("l_partkey").agg(F.count("*").alias("n")).collect()
        }
        assert 0 < len(out) <= 128
        d = out[0]["max_undercount"]
        for r in out:
            assert r["max_undercount"] == d  # one summary -> one bound
            assert r["est_count"] <= exact[r["key"]] <= r["est_count"] + d
        emitted = {r["key"] for r in out}
        for key, t in exact.items():
            if t > d:
                assert key in emitted


class TestStreamingWindowedMG:
    def test_per_window_topk_states_match_batch(self, spark, tmp_path):
        """Streaming windowed MG — per-event-time-window heavy hitters
        with certificates. The 'bytes' value kind flows through the
        generic streaming projection (UTF-8 items) and the stateful
        kernel's update_padded, so each emitted window state must be a
        valid MG summary whose retained counts equal the batch truth in
        the no-compaction regime."""
        import pandas as pd

        from probabilistic_rs_spark.operators.sketch_agg import SketchSpec
        from probabilistic_rs_spark.sketches.mg import MisraGries
        from probabilistic_rs_spark.streaming.expiring import streaming_windowed_sketch

        src = tmp_path / "src"
        src.mkdir()
        rows = []
        for i, (ts, item) in enumerate(
            [("2024-01-01 00:05", "a"), ("2024-01-01 00:10", "a"),
             ("2024-01-01 00:20", "b"), ("2024-01-01 01:15", "c"),
             ("2024-01-01 01:40", "c"), ("2024-01-01 01:55", "c")]
        ):
            rows.append({"ts": pd.Timestamp(ts), "item": item})
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.parquet(
            str(src / "b0")
        )
        stream = (
            spark.readStream.schema("ts timestamp, item string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        out = streaming_windowed_sketch(
            stream, "ts", "item",
            SketchSpec("hh", "mg", "item", {"k": 16}),
            level_duration="1 hour", watermark_delay="0 seconds",
        )
        q = (
            out.writeStream.format("memory")
            .queryName("mg_stream_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "SELECT * FROM mg_stream_test WHERE NOT expired ORDER BY window_start"
        ).collect()
        assert len(got) == 2
        w0 = MisraGries.from_bytes(bytes(got[0]["state"]))
        w1 = MisraGries.from_bytes(bytes(got[1]["state"]))
        assert w0.is_exact and w1.is_exact  # k=16 > cardinality: exact
        assert dict(w0.top()) == {b"a": 2, b"b": 1}
        assert dict(w1.top()) == {b"c": 3}


class TestMGRollup:
    def test_reaggregate_keeps_bound_and_exact_regime(self, spark, sf_smoke):
        """MG states re-aggregated to the global grouping through the
        rollup operator (states only, no rescan): in the exact regime
        (k above global cardinality) every rolled-up count equals the
        exact global count; with a tiny k the PODS'12 bound must still
        hold for every retained key after the rollup merge."""
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.rollup import reaggregate_states
        from probabilistic_rs_spark.operators.sketch_agg import SketchSpec, sketch_aggregate
        from probabilistic_rs_spark.sketches.mg import MisraGries

        ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
        exact = {
            str(r["user_id"]): r["n"]
            for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        }

        def rolled(k):
            spec = SketchSpec("mg", "mg", "user_id", {"k": k})
            per_type = sketch_aggregate(ev, ["event_type"], [spec])
            out = reaggregate_states(per_type, ["event_type"], [], [spec])
            return MisraGries.from_bytes(bytes(out.head()["mg_state"]))

        big = rolled(4096)  # k >> cardinality: exact through the rollup
        assert big.is_exact
        assert {k.decode(): v for k, v in big.top()} == exact

        small = rolled(8)  # forced compaction at both levels
        d = small.max_undercount()
        assert d > 0
        assert small.n_total == sum(exact.values())
        for key, est in small.top():
            true = exact[key.decode()]
            assert est <= true <= est + d
