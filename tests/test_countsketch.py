"""Count sketch + AMS F2 family (sketches/countsketch.py,
operators/moments.py): published accuracy bounds, merge bit-equality,
wire round trips, and the distributed build/probe paths — the same gate
structure the CMS family carries (reference accuracy-gate idiom,
tests/core_bloom_filter_tests.rs:402-467)."""

from __future__ import annotations

import numpy as np
import pytest

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.sketches.countsketch import CountSketch


def _base(rng, n):
    h1 = rng.integers(0, 1 << 62, n, dtype=np.int64)
    h2 = rng.integers(0, 1 << 56, n, dtype=np.int64)
    return np.stack([h1, h2], axis=1)


class TestConfig:
    def test_param_validation(self):
        with pytest.raises(SketchConfigError):
            CountSketch(eps=0.0)
        with pytest.raises(SketchConfigError):
            CountSketch(eps=1.5)
        with pytest.raises(SketchConfigError):
            CountSketch(delta=0.0)
        with pytest.raises(SketchConfigError):
            CountSketch(eps=0.0001)  # width above 2^26
        with pytest.raises(SketchConfigError):
            CountSketch(delta=1e-15)  # d above 31

    def test_derived_shape(self):
        cs = CountSketch(eps=0.02, delta=0.001)
        assert cs.d % 2 == 1  # odd → integer median
        assert cs.w & (cs.w - 1) == 0  # power of two → mask indexing
        assert cs.w >= 2.0 / (0.02**2)


class TestAccuracy:
    def test_point_estimates_within_published_bound(self):
        """|est − true| ≤ ε·√F2 (per-key, Charikar et al. Thm 1 regime).
        Deterministic hashing makes this a fixed outcome, not a flaky
        sample — the assert covers every key."""
        rng = np.random.default_rng(11)
        n = 20_000
        base = _base(rng, n)
        true = rng.zipf(1.3, n).astype(np.int64)
        cs = CountSketch(eps=0.02, delta=0.001)
        cs.update_base_hashes(base, true)
        est = cs.estimate_base_hashes(base)
        bound = cs.eps * np.sqrt(float((true.astype(float) ** 2).sum()))
        assert np.abs(est - true).max() <= bound
        # estimates are signed and roughly centered — not one-sided like CMS
        err = est - true
        assert err.min() < 0 < err.max() or np.all(err == 0)

    def test_f2_estimate_relative_error(self):
        rng = np.random.default_rng(13)
        n = 30_000
        base = _base(rng, n)
        true = rng.zipf(1.5, n).astype(np.int64)
        cs = CountSketch(eps=0.02, delta=0.001)
        cs.update_base_hashes(base, true)
        f2 = float((true.astype(float) ** 2).sum())
        # AMS per-row std = √(2/w)·F2 ≈ 0.0156·F2 at w=8192; median of 7
        # rows — 5σ headroom on a deterministic outcome
        assert abs(cs.f2_estimate() - f2) <= 5 * np.sqrt(2.0 / cs.w) * f2

    def test_exact_regime_small_cardinality(self):
        """Distinct keys ≪ w with no cell collisions: every point estimate
        and the F2 estimate are EXACT — the regime the oracle query gates."""
        rng = np.random.default_rng(17)
        base = _base(rng, 64)
        counts = rng.integers(1, 500, 64)
        cs = CountSketch(eps=0.02, delta=0.001)
        cs.update_base_hashes(base, counts)
        assert np.array_equal(cs.estimate_base_hashes(base), counts)
        assert cs.f2_estimate() == float((counts.astype(float) ** 2).sum())
        assert cs.point_error_bound() == cs.eps * np.sqrt(cs.f2_estimate())

    def test_unseen_keys_estimate_near_zero(self):
        rng = np.random.default_rng(19)
        cs = CountSketch(eps=0.02, delta=0.001)
        cs.update_base_hashes(_base(rng, 1000))
        unseen = _base(np.random.default_rng(999), 500)
        est = cs.estimate_base_hashes(unseen)
        bound = cs.eps * np.sqrt(1000.0)  # F2 = n when all counts are 1
        assert np.abs(est).max() <= bound


class TestMergeAndWire:
    def test_merge_bit_identical_to_one_shot(self):
        rng = np.random.default_rng(23)
        base = _base(rng, 5000)
        counts = rng.integers(1, 50, 5000)
        one = CountSketch(eps=0.05, delta=0.01)
        one.update_base_hashes(base, counts)
        cuts = [0, 1, 700, 701, 3000, 5000]
        blobs = []
        for lo, hi in zip(cuts, cuts[1:]):
            p = CountSketch(eps=0.05, delta=0.01)
            p.update_base_hashes(base[lo:hi], counts[lo:hi])
            blobs.append(p.to_bytes())
        fold = CountSketch(eps=0.05, delta=0.01)
        for b in blobs:
            fold.merge_bytes(b)
        assert fold.to_bytes() == one.to_bytes()
        assert fold.n_total == int(counts.sum())

    def test_shape_mismatch_raises(self):
        a = CountSketch(eps=0.05, delta=0.01)
        b = CountSketch(eps=0.1, delta=0.01)
        with pytest.raises(SketchStateError):
            a.merge(b)
        with pytest.raises(SketchStateError):
            a.merge_bytes(b.to_bytes())

    def test_wire_round_trip_sparse_and_dense(self):
        rng = np.random.default_rng(29)
        sparse = CountSketch(eps=0.02, delta=0.001)
        sparse.update_base_hashes(_base(rng, 20))
        blob_s = sparse.to_bytes()
        assert len(blob_s) < sparse.table.nbytes  # sparse wire chosen
        assert CountSketch.from_bytes(blob_s).to_bytes() == blob_s

        dense = CountSketch(eps=0.3, delta=0.1)  # tiny w → fills quickly
        dense.update_base_hashes(_base(rng, 5000))
        blob_d = dense.to_bytes()
        back = CountSketch.from_bytes(blob_d)
        assert np.array_equal(back.table, dense.table)
        assert back.to_bytes() == blob_d

    def test_corrupt_state_raises(self):
        cs = CountSketch(eps=0.05, delta=0.01)
        cs.update_base_hashes(_base(np.random.default_rng(1), 10))
        blob = cs.to_bytes()
        with pytest.raises(SketchStateError):
            CountSketch.from_bytes(blob[: len(blob) - 3])


class TestSparkPaths:
    def test_build_probe_exact_and_probe_parity(self, spark, sf_correct):
        """Distributed build over events.event_type at the oracle scale:
        cardinality ≪ w → pandas probe, native probe, and exact counts all
        agree; F2 from the state equals the exact self-join size."""
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.moments import (
            build_cs_state,
            cs_probe,
            f2_from_state,
            native_cs_probe,
        )

        ev = spark.read.parquet(f"{sf_correct}/events.parquet")
        state = build_cs_state(ev, "event_type", eps=0.02, delta=0.001)
        probes = ev.select("event_type").distinct()
        both = native_cs_probe(
            cs_probe(probes, "event_type", state, out_col="est_pandas"),
            "event_type",
            state,
            out_col="est_native",
        )
        rows = both.join(ev.groupBy("event_type").count(), "event_type").collect()
        assert rows
        for r in rows:
            assert r["est_pandas"] == r["count"] == r["est_native"]
        exact_f2 = (
            ev.groupBy("event_type")
            .count()
            .select(F.sum(F.col("count") * F.col("count")))
            .collect()[0][0]
        )
        assert int(f2_from_state(state)) == int(exact_f2)

    def test_probe_family_parity_in_collision_regime(self, spark, sf_correct):
        """A deliberately tiny width (eps=0.3 → w=32) over ~150 distinct
        users forces real collisions: estimates are INEXACT, but the
        pandas kernel and the codegen probe must still agree on every row
        — the signed-lookup/median expression is bit-equal to the numpy
        kernel by construction, and this is the regime where a sign or
        bucket derivation mismatch would actually show."""
        from probabilistic_rs_spark.operators.moments import (
            build_cs_state,
            cs_probe,
            native_cs_probe,
        )

        ev = spark.read.parquet(f"{sf_correct}/events.parquet")
        state = build_cs_state(ev, "user_id", eps=0.3, delta=0.01)
        probes = ev.select("user_id").distinct()
        both = native_cs_probe(
            cs_probe(probes, "user_id", state, out_col="est_pandas"),
            "user_id",
            state,
            out_col="est_native",
        ).collect()
        assert both
        exact = {
            r["user_id"]: r["count"]
            for r in ev.groupBy("user_id").count().collect()
        }
        mismatched = [r for r in both if r["est_pandas"] != r["est_native"]]
        assert not mismatched
        # and the regime is genuinely inexact (collisions happened)
        assert any(r["est_pandas"] != exact[r["user_id"]] for r in both)

    def test_native_probe_plan_is_broadcast_codegen(self, spark, sf_correct):
        """The native probe plan: broadcast one-row relation, no shuffle
        of the probe side, zero Python evaluation nodes."""
        from probabilistic_rs_spark.operators.moments import build_cs_state, native_cs_probe

        ev = spark.read.parquet(f"{sf_correct}/events.parquet")
        state = build_cs_state(ev, "event_type", eps=0.05, delta=0.01)
        out = native_cs_probe(ev.select("event_type"), "event_type", state)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        for marker in (
            "ArrowEvalPython",
            "BatchEvalPython",
            "MapInPandas",
            "FlatMapGroupsInPandas",
        ):
            assert marker not in plan

    def test_grouped_aggregate_and_fold_parity(self, spark, sf_smoke):
        """Kind 'cs' through the generic grouped pipeline: per-group states
        whose driver-side fold equals a global build (linearity), and whose
        per-group F2 matches the exact per-group self-join size."""
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.moments import f2_from_state
        from probabilistic_rs_spark.operators.sketch_agg import (
            SketchSpec,
            sketch_aggregate,
        )
        from probabilistic_rs_spark.sketches.countsketch import CountSketch

        ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
        spec = SketchSpec("cs", "cs", "user_id", {"eps": 0.05, "delta": 0.01})
        states = sketch_aggregate(ev, ["event_type"], [spec]).collect()
        assert states
        exact = {
            r["event_type"]: int(r["f2"])
            for r in ev.groupBy("event_type", "user_id")
            .count()
            .groupBy("event_type")
            .agg(F.sum(F.col("count") * F.col("count")).alias("f2"))
            .collect()
        }
        folded = None
        for r in states:
            blob = bytes(r["cs_state"])
            # per-group F2 exact in this regime (users ≪ w)
            assert int(f2_from_state(blob)) == exact[r["event_type"]]
            if folded is None:
                folded = CountSketch.from_bytes(blob)
            else:
                folded.merge_bytes(blob)
        glob = SketchSpec("cs", "cs", "user_id", {"eps": 0.05, "delta": 0.01})
        from probabilistic_rs_spark.operators.sketch_agg import build_global_state

        assert folded.to_bytes() == build_global_state(ev, glob, tree_fanin=None)

    def test_rollup_reaggregate_bit_identical(self, spark, sf_smoke):
        """Per-group CS states re-aggregated to the global grouping
        through the rollup operator (states only, no input rescan) are
        BIT-IDENTICAL to a direct global build — linearity through the
        whole distributed algebra."""
        from probabilistic_rs_spark.operators.rollup import reaggregate_states
        from probabilistic_rs_spark.operators.sketch_agg import (
            SketchSpec,
            build_global_state,
            sketch_aggregate,
        )

        ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
        spec = SketchSpec("cs", "cs", "user_id", {"eps": 0.05, "delta": 0.01})
        per_type = sketch_aggregate(ev, ["event_type"], [spec])
        rolled = reaggregate_states(per_type, ["event_type"], [], [spec])
        blob = bytes(rolled.select("cs_state").head()["cs_state"])
        assert blob == build_global_state(ev, spec, tree_fanin=None)

    def test_weighted_build_equals_row_repetition(self, spark):
        """Linearity: one weighted row ≡ that many unweighted rows —
        bit-identical states through the distributed builds."""
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.moments import (
            build_cs_state,
            build_cs_state_weighted,
        )

        keys = [(f"k{i}", (i % 7) + 1) for i in range(200)]
        wdf = spark.createDataFrame(keys, "key string, w int")
        rep = wdf.select("key", F.explode(F.sequence(F.lit(1), F.col("w"))).alias("_")).select("key")
        a = build_cs_state_weighted(wdf, "key", "w", eps=0.05, delta=0.01)
        b = build_cs_state(rep, "key", eps=0.05, delta=0.01, tree_fanin=None)
        assert a == b

    def test_turnstile_ops_log_fold(self, spark):
        """Insert/delete ops fold to the NET multiset bit-identically —
        the turnstile property the membership families' ops-log folds
        need generation machinery for; over-deletion estimates negative
        (loud), and unknown tags raise."""
        from probabilistic_rs_spark.operators.moments import (
            build_cs_state,
            cs_apply_ops_df,
            cs_probe,
        )

        ops = [("a", "insert")] * 5 + [("a", "delete")] * 2 \
            + [("b", "insert")] * 3 + [("b", "delete")] * 3 \
            + [("c", "insert")] * 4 + [("c", "delete")] * 6
        ops_df = spark.createDataFrame(ops, "key string, op string")
        state = cs_apply_ops_df(ops_df, "key", eps=0.05, delta=0.01)
        # net multiset: a×3; b and c net to 0 and −2 — the net build only
        # sees a (zero/negative keys contribute nothing/negatively)
        net = spark.createDataFrame([("a",)] * 3, "key string")
        probes = spark.createDataFrame([("a",), ("b",), ("c",)], "key string")
        est = {
            r["key"]: r["est_count"]
            for r in cs_probe(probes, "key", state).collect()
        }
        assert est == {"a": 3, "b": 0, "c": -2}
        # second generation folds on top, order-free
        gen2 = cs_apply_ops_df(
            spark.createDataFrame([("c", "insert")] * 2, "key string, op string"),
            "key",
            eps=0.05,
            delta=0.01,
            state=state,
        )
        est2 = {
            r["key"]: r["est_count"]
            for r in cs_probe(probes, "key", gen2).collect()
        }
        assert est2 == {"a": 3, "b": 0, "c": 0}
        # unknown tags raise TASK-SIDE via raise_error (no extra distinct
        # scan of the ops log) — surfaces as a Spark runtime error
        with pytest.raises(Exception, match="unknown op tag"):
            cs_apply_ops_df(
                spark.createDataFrame([("x", "upsert")], "key string, op string"),
                "key",
            )
        # the fold's TABLE equals the net build's table cell-for-cell
        # (n_total legitimately differs: gross absorbed weight vs net)
        from probabilistic_rs_spark.sketches.countsketch import CountSketch

        net_cs = CountSketch.from_bytes(
            build_cs_state(net, "key", eps=0.05, delta=0.01, tree_fanin=None)
        )
        ops_cs = CountSketch.from_bytes(state)
        # b nets to 0 exactly; c's −2 lives in cells the net build never
        # touched — remove c's contribution before comparing
        neg_c = CountSketch(eps=0.05, delta=0.01)
        neg_c.update_base_hashes(
            _spark_base_hashes(spark, ["c"]), np.array([-2], dtype=np.int64)
        )
        assert np.array_equal(ops_cs.table - neg_c.table, net_cs.table)

    def test_weighted_build_null_weight_raises(self, spark):
        """A null weight must fail loudly: the silent path would cast
        NaN → INT64_MIN into the table."""
        from probabilistic_rs_spark.operators.moments import build_cs_state_weighted

        df = spark.createDataFrame(
            [("a", 1), ("b", None)], "key string, w int"
        )
        with pytest.raises(Exception, match="null weight"):
            build_cs_state_weighted(df, "key", "w", eps=0.1, delta=0.05)

    def test_join_skew_advisor_exact_regime(self, spark, sf_correct):
        """One-scan advisor report: every statistic exact at this
        cardinality (theta/CS/MG all below their sampling/compaction
        thresholds) and equal to the ground truth computed the expensive
        way; the recommendation branches respond to the thresholds."""
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.moments import join_skew_advisor

        ev = spark.read.parquet(f"{sf_correct}/events.parquet")
        rep = join_skew_advisor(ev, "user_id")
        counts = ev.groupBy("user_id").count()
        truth = counts.select(
            F.count("*").alias("nd"),
            F.sum("count").alias("n"),
            F.sum(F.col("count") * F.col("count")).alias("f2"),
        ).collect()[0]
        assert rep["n"] == truth["n"]
        assert int(rep["n_distinct"]) == truth["nd"]
        assert int(rep["f2"]) == truth["f2"]
        assert rep["estimator_modes"]["theta_exact"]
        assert rep["estimator_modes"]["mg_max_undercount"] == 0.0
        # top keys carry exact counts, and their count multiset is the
        # true 10 largest (key order under ties may differ)
        all_counts = {
            str(r["user_id"]): r["count"] for r in counts.collect()
        }
        for t in rep["top_keys"]:
            assert t["est_count"] == all_counts[t["key"]]
        assert sorted((t["est_count"] for t in rep["top_keys"]), reverse=True) == sorted(
            all_counts.values(), reverse=True
        )[:10]
        # small distinct side → broadcast; force the other branches
        assert rep["recommendation"] == "broadcast"
        salted = join_skew_advisor(
            ev, "user_id", broadcast_threshold_rows=10, skew_ratio_threshold=0.5
        )
        assert salted["recommendation"] == "salt"  # uniform-ish ratio > 0.5
        shuffled = join_skew_advisor(
            ev, "user_id", broadcast_threshold_rows=10, skew_ratio_threshold=1e9
        )
        assert shuffled["recommendation"] == "shuffle"
        # a genuinely hot key moves the ratio: 50% of rows on one key
        hot = ev.select(
            F.when(F.rand(7) > 0.5, F.lit("HOT")).otherwise(
                F.col("user_id").cast("string")
            ).alias("k")
        )
        hot_rep = join_skew_advisor(hot, "k", broadcast_threshold_rows=10)
        assert hot_rep["skew_ratio"] > rep["skew_ratio"] * 5
        assert hot_rep["top_keys"][0]["key"] == "HOT"
        assert hot_rep["recommendation"] == "salt"

    def test_streaming_windowed_cs(self, spark, tmp_path):
        """Kind 'cs' through the streaming expiring operator: per-window
        states match batch-built states bit-for-bit (the hash2 projection
        and kernel are shared with the batch path)."""
        import pandas as pd

        from probabilistic_rs_spark.operators.sketch_agg import SketchSpec
        from probabilistic_rs_spark.sketches.countsketch import CountSketch
        from probabilistic_rs_spark.streaming.expiring import streaming_windowed_sketch

        src_dir = tmp_path / "src"
        src_dir.mkdir()
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    ["2024-01-01 00:05", "2024-01-01 00:20", "2024-01-01 01:10"]
                ),
                "item": ["a", "b", "a"],
            }
        )
        # one part-file → one micro-batch → exactly one update row per window
        spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src_dir / "batch0"))
        stream = (
            spark.readStream.schema("ts timestamp, item string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir / "*"))
        )
        spec = SketchSpec("cs", "cs", "item", {"eps": 0.1, "delta": 0.05})
        out = streaming_windowed_sketch(
            stream, "ts", "item", spec,
            level_duration="1 hour", watermark_delay="0 seconds",
        )
        q = (
            out.writeStream.format("memory")
            .queryName("cs_stream_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT * FROM cs_stream_test WHERE NOT expired ORDER BY window_start"
        ).collect()
        assert len(rows) == 2
        # window 0 saw {a, b}; window 1 saw {a} — rebuild batch-side
        ref0 = spec.make()
        h = _spark_base_hashes(spark, ["a", "b"])
        ref0.update_base_hashes(h)
        ref1 = spec.make()
        ref1.update_base_hashes(_spark_base_hashes(spark, ["a"]))
        assert bytes(rows[0]["state"]) == ref0.to_bytes()
        assert bytes(rows[1]["state"]) == ref1.to_bytes()
        assert isinstance(CountSketch.from_bytes(bytes(rows[0]["state"])), CountSketch)


def _spark_base_hashes(spark, items):
    """JVM KM base-hash pairs for a list of strings — ground truth for
    kernel-parity asserts (same exprs the build projects)."""
    from pyspark.sql import functions as F

    from probabilistic_rs_spark.operators.sketch_agg import native_bloom_base_hash_exprs

    df = spark.createDataFrame([(x,) for x in items], "item string")
    h1, h2 = native_bloom_base_hash_exprs(F.col("item"))
    rows = df.select(h1.alias("h1"), h2.alias("h2")).collect()
    return np.array([[r["h1"], r["h2"]] for r in rows], dtype=np.int64)
