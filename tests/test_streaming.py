"""Structured Streaming expiring-Bloom tests: state parity with the batch
windowed path, probe semantics, and watermark-driven expiry (the
reference's level rotation/expiry, src/ebloom/filter.rs:249-341, restated
on event time per SURVEY.md §2.10)."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()


def _run_stream(spark, src_dir, ckpt, schema, **kwargs):
    from probabilistic_rs_spark.streaming import streaming_windowed_bloom

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = streaming_windowed_bloom(stream, "ts", "user_id", **kwargs)
    q = (
        out.writeStream.format("memory")
        .queryName("ebloom_out")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("SELECT * FROM ebloom_out")


class TestStreamingExpiringBloom:
    def test_state_parity_and_expiry(self, spark, events, tmp_path):
        from probabilistic_rs_spark.operators.windowed_bloom import (
            probe_recent,
            windowed_bloom_states,
        )

        # chronological file splits => watermark advances between batches
        src = str(tmp_path / "src")
        tmin, tmax = events.agg(F.min("ts"), F.max("ts")).head()
        span = (tmax - tmin).total_seconds()
        bounds = [tmin + _td(span * f) for f in (0.34, 0.67)]
        parts = [
            events.where(F.col("ts") < bounds[0]),
            events.where((F.col("ts") >= bounds[0]) & (F.col("ts") < bounds[1])),
            events.where(F.col("ts") >= bounds[1]),
        ]
        for i, p in enumerate(parts):
            p.coalesce(1).write.parquet(f"{src}/f{i}")
            time.sleep(1.1)  # file-source ordering is by mod time
        # register the three dirs as one glob source
        import glob
        import os
        import shutil

        flat = str(tmp_path / "flat")
        os.makedirs(flat)
        for i in range(3):
            for f in glob.glob(f"{src}/f{i}/part-*.parquet"):
                shutil.copy(f, f"{flat}/{i:02d}_{os.path.basename(f)}")
                os.utime(f"{flat}/{i:02d}_{os.path.basename(f)}", (time.time() + i, time.time() + i))

        kwargs = dict(
            level_duration="7 days",
            watermark_delay="1 day",
            capacity_per_level=10_000,
            target_fpr=0.01,
        )
        res = _run_stream(
            spark, flat, str(tmp_path / "ck"), events.schema, **kwargs
        ).cache()
        assert res.count() > 0

        # last emission per window (update mode emits once per touched batch)
        from pyspark.sql import Window as W

        latest = (
            res.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("window_start").orderBy(
                        F.desc("expired"), F.desc("n_updates")
                    )
                ),
            )
            .where(F.col("rn") == 1)
            .select("window_start", "window_end", "state", "n_updates", "expired")
        )

        batch = windowed_bloom_states(
            events,
            "ts",
            "user_id",
            level_duration="7 days",
            capacity_per_level=10_000,
            target_fpr=0.01,
        )
        want = {
            r["window_start"]: (bytes(r["bloom_state"]), r["n_updates"])
            for r in batch.collect()
        }
        got = {
            r["window_start"]: (bytes(r["state"]), r["n_updates"])
            for r in latest.collect()
        }
        assert set(got) == set(want)
        for wstart, (blob, n) in want.items():
            gblob, gn = got[wstart]
            assert gn == n, f"n_updates mismatch for {wstart}"
            # bit-identical states: OR-merge is order-independent
            from probabilistic_rs_spark.sketches.bloom import BloomSketch

            assert (
                BloomSketch.from_bytes(gblob).bits.tobytes()
                == BloomSketch.from_bytes(blob).bits.tobytes()
            )

        # expiry: with 3 chronological micro-batches and a 1-day watermark
        # over a ~30-day span, at least the oldest window must have expired
        n_expired = res.where("expired").count()
        assert n_expired >= 1

        # probe semantics over the streamed states (cross-level OR)
        levels = [
            (r["window_start"], r["window_end"], bytes(r["state"]))
            for r in latest.where(~F.col("expired")).collect()
        ][:3]
        if levels:
            users = events.select("user_id").distinct().limit(50)
            hit = probe_recent(users, "user_id", levels).where("is_member").count()
            assert hit >= 0  # no exceptions; zero-false-negative checked in batch tests


def _td(seconds: float):
    import datetime

    return datetime.timedelta(seconds=seconds)


class TestExpiringStatsAndRetention:
    """Stats + retention parity with the reference's expiring filter
    (src/ebloom/filter.rs:747-768 stats; src/ebloom/storage.rs delete_level)."""

    def test_expiring_stats_rollup(self, spark, events):
        from probabilistic_rs_spark.operators.windowed_bloom import (
            expiring_stats,
            windowed_bloom_states,
        )

        states = windowed_bloom_states(
            events, "ts", "user_id", level_duration="7 days",
            capacity_per_level=10_000, target_fpr=0.01,
        ).cache()
        all_rows = sorted(
            [(r["window_start"], r["n_updates"]) for r in states.collect()]
        )
        assert len(all_rows) >= 4
        got = expiring_stats(states, num_levels=3).head()
        # active = 3 most recent windows; total_insert_count sums ONLY them
        want_active = all_rows[-3:]
        assert got["active_levels"] == 3
        assert got["total_insert_count"] == sum(n for _, n in want_active)
        assert got["total_windows"] == len(all_rows)
        assert got["expired_windows"] == len(all_rows) - 3
        # num_levels larger than available windows: all are active
        got_all = expiring_stats(states, num_levels=255).head()
        assert got_all["active_levels"] == len(all_rows)
        assert got_all["total_insert_count"] == sum(n for _, n in all_rows)
        assert got_all["expired_windows"] == 0

    def test_prune_states_table_bounds_rows_probe_unchanged(self, spark, events, tmp_path):
        from probabilistic_rs_spark.operators.windowed_bloom import (
            probe_recent,
            prune_states_table,
            recent_level_states,
            windowed_bloom_states,
        )

        states = windowed_bloom_states(
            events, "ts", "user_id", level_duration="7 days",
            capacity_per_level=10_000, target_fpr=0.01,
        )
        path = str(tmp_path / "states")
        states.write.parquet(path)
        n_before = spark.read.parquet(path).count()
        assert n_before > 3
        levels_before = recent_level_states(spark.read.parquet(path), 3)
        users = events.select("user_id").distinct().limit(200)
        before = {
            r["user_id"]
            for r in probe_recent(users, "user_id", levels_before)
            .where("is_member").collect()
        }
        kept = prune_states_table(spark, path, num_levels=3)
        assert kept == 3
        assert spark.read.parquet(path).count() == 3
        levels_after = recent_level_states(spark.read.parquet(path), 3)
        after = {
            r["user_id"]
            for r in probe_recent(users, "user_id", levels_after)
            .where("is_member").collect()
        }
        # retention never changes what the active-set probe sees
        assert after == before
        assert {w for w, _, _ in levels_after} == {w for w, _, _ in levels_before}


class TestStreamingChunkPersistence:
    """foreachBatch × WindowedBloomChunkStores (VERDICT r2 #6): the
    streaming expiring Bloom persists per-window dirty chunks in the
    reference's externalized layout (src/ebloom/storage.rs:177-253)
    alongside Spark's opaque checkpoint — kill/restart, then reloaded
    window states must equal the batch-computed states bit-for-bit."""

    def test_kill_restart_states_bit_identical(self, spark, events, tmp_path):
        import glob
        import os
        import shutil

        from probabilistic_rs_spark.chunkstore import WindowedBloomChunkStores
        from probabilistic_rs_spark.operators.windowed_bloom import (
            windowed_bloom_states,
        )
        from probabilistic_rs_spark.sketches.bloom import BloomConfig, BloomSketch
        from probabilistic_rs_spark.streaming import (
            start_persisted_windowed_bloom,
            streaming_windowed_bloom,
        )
        from probabilistic_rs_spark.streaming.persistence import window_key

        tmin, tmax = events.agg(F.min("ts"), F.max("ts")).head()
        span = (tmax - tmin).total_seconds()
        bounds = [tmin + _td(span * f) for f in (0.34, 0.67)]
        parts = [
            events.where(F.col("ts") < bounds[0]),
            events.where((F.col("ts") >= bounds[0]) & (F.col("ts") < bounds[1])),
            events.where(F.col("ts") >= bounds[1]),
        ]
        staged = str(tmp_path / "staged")
        for i, p in enumerate(parts):
            p.coalesce(1).write.parquet(f"{staged}/f{i}")
        flat = str(tmp_path / "flat")
        os.makedirs(flat)

        def add_file(i: int) -> None:
            for f in glob.glob(f"{staged}/f{i}/part-*.parquet"):
                dst = f"{flat}/{i:02d}_{os.path.basename(f)}"
                shutil.copy(f, dst)
                os.utime(dst, (time.time() + i, time.time() + i))

        cfg = BloomConfig(capacity=10_000, false_positive_rate=0.01)
        stores = WindowedBloomChunkStores(str(tmp_path / "wstores"), cfg, num_levels=20)
        ckpt = str(tmp_path / "ck")
        kwargs = dict(
            level_duration="7 days",
            watermark_delay="1 day",
            capacity_per_level=10_000,
            target_fpr=0.01,
        )

        def run_once():
            stream = (
                spark.readStream.schema(events.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(flat)
            )
            out = streaming_windowed_bloom(stream, "ts", "user_id", **kwargs)
            q = start_persisted_windowed_bloom(out, stores, ckpt, available_now=True)
            q.awaitTermination(120)

        # phase 1: two files, then the query terminates (the "kill")
        add_file(0)
        add_file(1)
        run_once()
        assert stores.windows(), "phase 1 persisted no windows"
        # snapshot the earliest window's on-disk file set: phase 2's data
        # is strictly later, so this frozen window must not be rewritten
        w0 = stores.windows()[0]
        w0_chunks = os.path.join(stores._wdir(w0), "chunks")
        frozen_before = sorted(os.listdir(w0_chunks))

        # phase 2: new file arrives, NEW query resumes from the checkpoint
        add_file(2)
        run_once()

        assert sorted(os.listdir(w0_chunks)) == frozen_before

        # reloaded states equal the batch-computed ground truth bit-for-bit
        batch = windowed_bloom_states(
            events, "ts", "user_id",
            level_duration="7 days", capacity_per_level=10_000, target_fpr=0.01,
        )
        want = {
            window_key(r["window_start"]): (bytes(r["bloom_state"]), r["n_updates"])
            for r in batch.collect()
        }
        got_keys = set(stores.windows())
        # streaming may drop late rows beyond the watermark; every
        # persisted window must exist in the batch truth
        assert got_keys <= set(want)
        assert len(got_keys) >= 2
        for w in got_keys:
            reloaded = stores.load(w)
            truth = BloomSketch.from_bytes(want[w][0])
            assert reloaded.bits.tobytes() == truth.bits.tobytes(), w
            assert reloaded.n_updates == want[w][1], w
