"""Theta/KMV sketch: kernel contracts, set algebra, and the Spark
operators (``operators/set_ops.py``).

Mirrors the reference's test strategy for its structures (config
validation → insert/estimate → merge → serialization round-trip →
accuracy gates, ``tests/core_bloom_filter_tests.rs``) on the new family,
plus the set-operation estimators HLL cannot express.
"""

from __future__ import annotations

import numpy as np
import pytest

from probabilistic_rs_spark.errors import SketchConfigError, SketchStateError
from probabilistic_rs_spark.sketches.base import TYPE_THETA, peek_type
from probabilistic_rs_spark.sketches.theta import (
    THETA_MAX,
    ThetaSketch,
    theta_a_not_b,
    theta_intersect,
    theta_jaccard,
    theta_union,
)

U64 = np.uint64


def _hashes(rng, n):
    return rng.integers(0, 2**64, n, dtype=np.uint64)


class TestKernel:
    def test_config_validation(self):
        with pytest.raises(SketchConfigError):
            ThetaSketch(k=8)
        with pytest.raises(SketchConfigError):
            ThetaSketch(k=1 << 27)
        ThetaSketch(k=16)  # boundary ok

    def test_exact_mode_is_exact(self):
        rng = np.random.default_rng(1)
        h = _hashes(rng, 500)
        sk = ThetaSketch(k=1024)
        sk.update_hashes(h)
        assert sk.is_exact
        assert sk.estimate() == len(np.unique(h >> U64(1)))
        assert sk.rse() == 0.0

    def test_duplicates_collapse(self):
        sk = ThetaSketch(k=64)
        h = np.array([5, 5, 5, 9, 9], dtype=np.uint64)
        sk.update_hashes(h)
        sk.update_hashes(h)
        assert sk.estimate() == 2.0
        assert sk.n_updates == 10

    def test_estimate_within_4_sigma(self):
        rng = np.random.default_rng(2)
        n, k = 500_000, 4096
        sk = ThetaSketch(k=k)
        sk.update_hashes(_hashes(rng, n))
        assert not sk.is_exact
        rse = sk.rse()
        assert abs(sk.estimate() - n) <= 4 * rse * n

    def test_batch_split_invariance(self):
        """State is a pure function of the absorbed hash set: one batch,
        many batches, or per-element feeding give identical bytes."""
        rng = np.random.default_rng(3)
        h = _hashes(rng, 5000)
        one = ThetaSketch(k=256)
        one.update_hashes(h)
        many = ThetaSketch(k=256)
        for chunk in np.array_split(h, 17):
            many.update_hashes(chunk)
        assert one.to_bytes() == many.to_bytes()

    def test_merge_tree_bit_identical(self):
        rng = np.random.default_rng(4)
        h = _hashes(rng, 20_000)
        ref = ThetaSketch(k=512)
        ref.update_hashes(h)
        parts = np.array_split(h, 9)
        sks = []
        for p in parts:
            s = ThetaSketch(k=512)
            s.update_hashes(p)
            sks.append(s)
        # left fold and right fold
        left = ThetaSketch.from_bytes(sks[0].to_bytes())
        for s in sks[1:]:
            left.merge(s)
        right = ThetaSketch.from_bytes(sks[-1].to_bytes())
        for s in reversed(sks[:-1]):
            right.merge(s)
        assert left.to_bytes() == ref.to_bytes()
        assert right.to_bytes() == ref.to_bytes()

    def test_merge_k_mismatch_raises(self):
        a, b = ThetaSketch(k=64), ThetaSketch(k=128)
        with pytest.raises(SketchConfigError):
            a.merge(b)

    def test_serde_round_trip_and_peek(self):
        rng = np.random.default_rng(5)
        sk = ThetaSketch(k=64)
        sk.update_hashes(_hashes(rng, 1000))
        b = sk.to_bytes()
        assert peek_type(b) == TYPE_THETA
        back = ThetaSketch.from_bytes(b)
        assert back.to_bytes() == b
        assert back.estimate() == sk.estimate()
        assert back.n_updates == 1000

    def test_corrupt_states_raise(self):
        rng = np.random.default_rng(6)
        sk = ThetaSketch(k=64)
        sk.update_hashes(_hashes(rng, 1000))
        b = bytearray(sk.to_bytes())
        with pytest.raises(SketchStateError):
            ThetaSketch.from_bytes(bytes(b[:-3]))  # unaligned payload
        # unsorted retained set
        tail = b[-16:]
        b[-16:] = tail[8:] + tail[:8]
        with pytest.raises(SketchStateError):
            ThetaSketch.from_bytes(bytes(b))

    def test_empty_state(self):
        sk = ThetaSketch(k=64)
        assert sk.estimate() == 0.0
        back = ThetaSketch.from_bytes(sk.to_bytes())
        assert back.estimate() == 0.0


class TestSetOps:
    def _pair(self, k=256):
        """A=0..99, B=50..179 under a collision-free injective map."""
        mult = U64(0x9E3779B97F4A7C15)
        a = ThetaSketch(k=k)
        b = ThetaSketch(k=k)
        a.update_hashes(np.arange(100, dtype=np.uint64) * mult)
        b.update_hashes(np.arange(50, 180, dtype=np.uint64) * mult)
        return a, b

    def test_exact_mode_set_ops_are_exact(self):
        a, b = self._pair()
        assert theta_intersect(a, b).estimate() == 50.0
        assert theta_union(a, b).estimate() == 180.0
        assert theta_a_not_b(a, b).estimate() == 50.0
        assert theta_jaccard(a, b) == 50.0 / 180.0

    def test_sampled_set_ops_within_bounds(self):
        rng = np.random.default_rng(7)
        na, nb, common, k = 150_000, 120_000, 60_000, 8192
        shared = _hashes(rng, common)
        ha = np.concatenate([shared, _hashes(rng, na - common)])
        hb = np.concatenate([shared, _hashes(rng, nb - common)])
        a, b = ThetaSketch(k=k), ThetaSketch(k=k)
        a.update_hashes(ha)
        b.update_hashes(hb)
        # intersection sample size ~ k * |A∩B| / max(|A|,|B|) → looser
        # bound than the plain-estimate RSE; 6 sigma of the effective
        # sample keeps this deterministic-seed test far from flaky
        inter = theta_intersect(a, b).estimate()
        eff = k * common / max(na, nb)
        assert abs(inter - common) <= 6 * common / np.sqrt(eff)
        union = theta_union(a, b).estimate()
        n_union = na + nb - common
        assert abs(union - n_union) <= 6 * n_union * a.rse()
        dnb = theta_a_not_b(a, b).estimate()
        assert abs(dnb - (na - common)) <= 6 * (na - common) / np.sqrt(eff)

    def test_set_ops_k_mismatch_raises(self):
        with pytest.raises(SketchConfigError):
            theta_intersect(ThetaSketch(k=64), ThetaSketch(k=128))

    def test_empty_jaccard(self):
        assert theta_jaccard(ThetaSketch(k=64), ThetaSketch(k=64)) == 0.0

    def test_intersect_with_empty_is_empty(self):
        a, _ = self._pair()
        e = ThetaSketch(k=256)
        assert theta_intersect(a, e).estimate() == 0.0
        assert theta_a_not_b(a, e).estimate() == a.estimate()


class TestSparkOperators:
    def test_theta_distinct_exact_matches_count_distinct(self, spark, sf_correct):
        from probabilistic_rs_spark.operators.set_ops import theta_distinct

        ev = spark.read.parquet(f"{sf_correct}/events.parquet")
        got = {
            r["event_type"]: r["n"]
            for r in theta_distinct(
                ev, "user_id", ["event_type"], k=4096, out_col="n"
            ).collect()
        }
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(__import__("pyspark").sql.functions.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert got == exact

    def test_theta_overlap_exact_mode_matches_exact_sql(self, spark, sf_correct):
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.set_ops import theta_overlap, theta_states

        ev = spark.read.parquet(f"{sf_correct}/events.parquet")
        states = theta_states(ev, "user_id", ["event_type"], k=4096)
        got = {
            (r["event_type_a"], r["event_type_b"]): (
                r["n_a"], r["n_b"], r["n_intersection"], r["n_union"], r["n_a_not_b"]
            )
            for r in theta_overlap(states, ["event_type"]).collect()
        }
        d = ev.select("event_type", "user_id").distinct()
        pairs = (
            d.alias("a")
            .join(d.alias("b"), F.col("a.user_id") == F.col("b.user_id"))
            .where(F.col("a.event_type") < F.col("b.event_type"))
            .groupBy(
                F.col("a.event_type").alias("et_a"), F.col("b.event_type").alias("et_b")
            )
            .agg(F.countDistinct("a.user_id").alias("n_common"))
        )
        per_type = {
            r["event_type"]: r["n"]
            for r in d.groupBy("event_type").agg(F.count("*").alias("n")).collect()
        }
        exact_common = {
            (r["et_a"], r["et_b"]): r["n_common"] for r in pairs.collect()
        }
        assert set(got) == set(exact_common)
        for (ta, tb), (n_a, n_b, n_int, n_uni, n_anb) in got.items():
            c = exact_common[(ta, tb)]
            assert (n_a, n_b) == (per_type[ta], per_type[tb])
            assert n_int == c
            assert n_uni == per_type[ta] + per_type[tb] - c
            assert n_anb == per_type[ta] - c

    def test_theta_overlap_explicit_pairs(self, spark, sf_correct):
        from probabilistic_rs_spark.operators.set_ops import theta_overlap, theta_states

        ev = spark.read.parquet(f"{sf_correct}/events.parquet")
        states = theta_states(ev, "user_id", ["event_type"], k=4096)
        pairs = spark.createDataFrame(
            [("click", "purchase")], ["event_type_a", "event_type_b"]
        )
        rows = theta_overlap(states, ["event_type"], pairs=pairs).collect()
        assert len(rows) == 1
        assert rows[0]["event_type_a"] == "click"

    def test_rollup_reaggregate_bit_identical(self, spark, sf_correct):
        """Theta states compose with the generic state re-aggregation
        (operators/rollup.py): folding per-(event_type, week) states down
        to per-event_type reproduces the direct build's bytes exactly —
        the bit-equality merge contract through the rollup path, no input
        rescan."""
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.rollup import reaggregate_states
        from probabilistic_rs_spark.operators.sketch_agg import (
            SketchSpec,
            sketch_aggregate,
        )

        ev = (
            spark.read.parquet(f"{sf_correct}/events.parquet")
            .withColumn("week", F.floor(F.unix_timestamp("ts") / (7 * 86400)))
        )
        spec = SketchSpec("u", "theta", "user_id", {"k": 256})
        fine = sketch_aggregate(ev, ["event_type", "week"], [spec])
        rolled = {
            r["event_type"]: bytes(r["u_state"])
            for r in reaggregate_states(
                fine, ["event_type", "week"], ["event_type"], [spec]
            ).collect()
        }
        direct = {
            r["event_type"]: bytes(r["u_state"])
            for r in sketch_aggregate(ev, ["event_type"], [spec]).collect()
        }
        assert rolled == direct

    def test_streaming_theta_weekly_retention(self, spark, sf_correct):
        """Streaming per-window theta states (applyInPandasWithState)
        compose with the set algebra: week-over-week NEW users =
        theta_a_not_b(week_n, week_{n-1}) on the emitted states — exact
        at this scale, checked against the batch-SQL retention."""
        import shutil
        import tempfile
        import uuid

        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.sketch_agg import SketchSpec
        from probabilistic_rs_spark.streaming import streaming_windowed_sketch

        ev = spark.read.parquet(f"{sf_correct}/events.parquet").select("user_id", "ts")
        tmp = tempfile.mkdtemp(prefix="prs_stream_theta_")
        qname = f"prs_theta_windows_{uuid.uuid4().hex[:8]}"
        try:
            src = f"{tmp}/src"
            ev.coalesce(1).write.parquet(src)
            stream = spark.readStream.schema(ev.schema).parquet(src)
            out = streaming_windowed_sketch(
                stream,
                "ts",
                "user_id",
                SketchSpec("u", "theta", "user_id", {"k": 4096}),
                level_duration="7 days",
                watermark_delay="30 days",
            )
            q = (
                out.writeStream.format("memory")
                .queryName(qname)
                .outputMode("update")
                .option("checkpointLocation", f"{tmp}/ck")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            res = spark.sql(f"SELECT * FROM {qname}").where(~F.col("expired"))
            latest = res.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("window_start").orderBy(F.desc("n_updates"))
                ),
            ).where("rn = 1")
            states = {
                r["window_start"]: ThetaSketch.from_bytes(bytes(r["state"]))
                for r in latest.select("window_start", "state").collect()
            }
            assert len(states) >= 2
            weeks = sorted(states)
            # exact per-week user sets from the batch side
            exact = {
                r["ws"]: set(r["users"])
                for r in ev.select(
                    F.window("ts", "7 days").getField("start").alias("ws"), "user_id"
                )
                .groupBy("ws")
                .agg(F.collect_set("user_id").alias("users"))
                .collect()
            }
            for prev, cur in zip(weeks, weeks[1:]):
                got = theta_a_not_b(states[cur], states[prev]).estimate()
                want = len(exact[cur] - exact[prev])
                assert got == want, (cur, got, want)
                j = theta_jaccard(states[cur], states[prev])
                inter = len(exact[cur] & exact[prev])
                uni = len(exact[cur] | exact[prev])
                assert j == (inter / uni if uni else 0.0)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_global_build_strategy(self, spark, sf_correct):
        """build_global_state works for the theta kind (bounded partials
        → driver fold at modest partition counts) and matches a local
        reference build."""
        from pyspark.sql import functions as F

        from probabilistic_rs_spark.operators.sketch_agg import (
            SketchSpec,
            build_global_state,
        )

        ev = spark.read.parquet(f"{sf_correct}/events.parquet")
        spec = SketchSpec("t", "theta", "user_id", {"k": 4096})
        blob = build_global_state(ev, spec)
        sk = ThetaSketch.from_bytes(blob)
        local = ThetaSketch(k=4096)
        vals = np.array(
            [
                r["h"]
                for r in ev.select(
                    F.xxhash64(F.col("user_id").cast("string")).alias("h")
                ).collect()
            ],
            dtype=np.int64,
        ).view(np.uint64)
        local.update_hashes(vals)
        assert sk.to_bytes() == local.to_bytes()
