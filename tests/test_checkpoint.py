"""Checkpoint / lineage / resume lifecycle tests — mirroring the
reference's persistence suite structure (tests/core_bloom_fjall_tests.rs:
save→drop→load→verify :55-93, create_or_load both branches :95-127,
accumulating cycles :172-203, config-survives-reload :206-239)."""

from __future__ import annotations

import json
import os

import pytest

from probabilistic_rs_spark.checkpoint import (
    SketchCheckpoint,
    resumable_sketch_aggregate,
)
from probabilistic_rs_spark.errors import SketchConfigError
from probabilistic_rs_spark.operators.sketch_agg import SketchSpec, with_hll_estimate


SPECS = [
    SketchSpec("users", "hll", "user_id", {"p": 14}),
    SketchSpec("vals", "kll", "value", {"k": 200}),
]


@pytest.fixture()
def units(spark, tmp_path):
    """Split events into 4 single-file parquet units."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = []
    for i in range(4):
        p = str(tmp_path / f"unit{i}")
        ev.where(f"event_id % 4 = {i}").coalesce(1).write.parquet(p)
        out.append(p)
    return out


class TestLifecycle:
    def test_create_wipes_and_load_restores_config(self, tmp_path):
        d = str(tmp_path / "ck")
        SketchCheckpoint.create(d, ["event_type"], SPECS)
        loaded = SketchCheckpoint.load(d)
        assert loaded.group_cols == ["event_type"]
        assert [s.kind for s in loaded.specs] == ["hll", "kll"]
        assert loaded.specs[0].params == {"p": 14}
        # create again → wiped clean
        (tmp_path / "ck" / "lineage" / "junk.json").write_text(
            json.dumps({"unit": "x", "n_rows": 0, "n_partials": 0, "state_bytes": 0, "wall_s": 0})
        )
        SketchCheckpoint.create(d, ["event_type"], SPECS)
        assert SketchCheckpoint.load(d).completed_units() == {}

    def test_load_missing_manifest_raises(self, tmp_path):
        with pytest.raises(SketchConfigError, match="manifest"):
            SketchCheckpoint.load(str(tmp_path / "nope"))

    def test_create_or_load_both_branches(self, tmp_path):
        d = str(tmp_path / "ck")
        a = SketchCheckpoint.create_or_load(d, ["event_type"], SPECS)
        assert a.group_cols == ["event_type"]
        # second call loads (persisted config wins over different caller args)
        b = SketchCheckpoint.create_or_load(d, ["IGNORED"], [SPECS[0]])
        assert b.group_cols == ["event_type"]
        assert len(b.specs) == 2


class TestResume:
    def test_kill_after_two_units_then_resume(self, spark, tmp_path, units):
        d = str(tmp_path / "ck")

        # single-shot ground truth
        full = resumable_sketch_aggregate(
            spark, units, str(tmp_path / "ck_full"), ["event_type"], SPECS
        )
        want = {
            r["event_type"]: (bytes(r["users_state"]), r["n_updates"])
            for r in full.collect()
        }

        class Kill(Exception):
            pass

        ck = SketchCheckpoint.create(d, ["event_type"], SPECS)
        seen = []

        def killer(unit, rec):
            seen.append(unit)
            if len(seen) == 2:
                raise Kill()

        with pytest.raises(Kill):
            ck.run_units(spark, units, on_unit_done=killer)
        assert len(ck.completed_units()) == 2

        # resume: completed units must be skipped, not re-read
        ck2 = SketchCheckpoint.load(d)
        res = ck2.run_units(spark, units)
        assert sorted(res["skipped"]) == sorted(units[:2])
        assert sorted(res["ran"]) == sorted(units[2:])

        got = {
            r["event_type"]: (bytes(r["users_state"]), r["n_updates"])
            for r in ck2.merged_states(spark).collect()
        }
        # bit-identical final states vs the never-killed run (merge order
        # is pid-sorted → deterministic)
        assert got == want

    def test_rerun_is_noop_and_metrics_accumulate(self, spark, tmp_path, units):
        d = str(tmp_path / "ck")
        ck = SketchCheckpoint.create(d, [], [SPECS[0]])
        ck.run_units(spark, units)
        m1 = ck.metrics()
        res = ck.run_units(spark, units)
        assert res["ran"] == [] and len(res["skipped"]) == 4
        assert ck.metrics() == m1
        assert m1["units_done"] == 4 and m1["rows_absorbed"] == 1000  # sf0.001 events

    def test_estimates_survive_resume(self, spark, tmp_path, units):
        """HLL estimate from a resumed checkpoint equals exact distinct
        (sparse mode at this scale) — the reference's save→load→verify."""
        d = str(tmp_path / "ck")
        out = resumable_sketch_aggregate(spark, units[:2], d, [], [SPECS[0]])
        # second call with remaining units resumes and extends
        out = resumable_sketch_aggregate(spark, units, d, [], [SPECS[0]])
        est = with_hll_estimate(out, "users_state", "est").head()["est"]
        exact = (
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .select("user_id")
            .distinct()
            .count()
        )
        assert abs(est - exact) / exact <= 0.026  # 1.04/sqrt(2^14) * 3.2

    def test_config_mismatch_raises(self, spark, tmp_path, units):
        d = str(tmp_path / "ck")
        resumable_sketch_aggregate(spark, units[:1], d, [], [SPECS[0]])
        with pytest.raises(SketchConfigError, match="manifest wins"):
            resumable_sketch_aggregate(
                spark, units, d, [], [SketchSpec("other", "hll", "user_id", {"p": 12})]
            )

    def test_crash_between_partials_and_lineage_is_idempotent(
        self, spark, tmp_path, units
    ):
        """Partials dir exists but lineage record missing (crash window):
        the unit re-runs and overwrites — final result unchanged."""
        d = str(tmp_path / "ck")
        ck = SketchCheckpoint.create(d, [], [SPECS[0]])
        ck.run_units(spark, units)
        want = ck.merged_states(spark).head()["n_updates"]
        # simulate the crash window: delete one lineage record
        ldir = os.path.join(d, "lineage")
        os.remove(os.path.join(ldir, sorted(os.listdir(ldir))[0]))
        assert len(ck.completed_units()) == 3
        res = ck.run_units(spark, units)
        assert len(res["ran"]) == 1
        assert ck.merged_states(spark).head()["n_updates"] == want

    def test_merge_excludes_orphan_partials(self, spark, tmp_path, units):
        """Round 6b: merged_states folds LINEAGE-COMPLETE units only — an
        orphan partials dir from a crashed unit (lineage never written)
        must not leak half-written state into the merge when the caller
        merges before re-running."""
        from probabilistic_rs_spark.checkpoint import _unit_id

        d = str(tmp_path / "ck-orphan")
        ck = SketchCheckpoint.create(d, [], [SPECS[0]])
        ck.run_units(spark, units[:3])
        want3 = ck.merged_states(spark).head()["n_updates"]
        # emulate the crash window on unit 4: partials land on disk,
        # lineage does not (run it, then delete only its lineage record)
        ck.run_units(spark, [units[3]])
        os.remove(os.path.join(d, "lineage", f"{_unit_id(units[3])}.json"))
        assert len(ck.completed_units()) == 3
        # the orphan partials dir exists but is excluded from the merge
        assert os.path.isdir(os.path.join(d, "partials", f"unit={_unit_id(units[3])}"))
        assert ck.merged_states(spark).head()["n_updates"] == want3

    def test_merge_raises_on_externally_deleted_partials(
        self, spark, tmp_path, units
    ):
        """ADVICE r6: a unit with a lineage record but NO partials dir is
        impossible-by-protocol (lineage is the commit point, written
        after the partials) — it means external deletion/corruption, and
        silently filtering it out would merge an incomplete state."""
        import shutil

        from probabilistic_rs_spark.checkpoint import _unit_id

        d = str(tmp_path / "ck-deleted")
        ck = SketchCheckpoint.create(d, [], [SPECS[0]])
        ck.run_units(spark, units[:2])
        victim = sorted(ck.completed_units())[0]
        shutil.rmtree(os.path.join(d, "partials", f"unit={_unit_id(victim)}"))
        with pytest.raises(SketchConfigError, match="lineage record but"):
            ck.merged_states(spark)


class TestChunkStore:
    """Dirty-chunk incremental checkpointing end-to-end (reference's
    headline persistence feature: src/bloom/filter.rs:221-243, bench
    benches/bloom_fjall_benchmarks.rs:26-63 — only touched chunks
    rewritten; VERDICT.md round-1 missing item #1/#2)."""

    def _cfg(self):
        from probabilistic_rs_spark.sketches.bloom import BloomConfig

        # capacity 200k -> m ~ 1.9M bits ~ 240KB -> 59 chunks of 4KB
        return BloomConfig(capacity=200_000, false_positive_rate=0.01)

    def test_incremental_snapshot_writes_only_dirty_chunks(self, tmp_path):
        from probabilistic_rs_spark.chunkstore import BloomChunkStore
        from probabilistic_rs_spark.sketches.bloom import BloomSketch

        d = str(tmp_path / "store")
        store = BloomChunkStore.create(d, self._cfg())
        sk = BloomSketch(self._cfg())
        sk.update_batch([f"item_{i:06d}".encode() for i in range(5000)])
        s1 = store.save_snapshot(sk)  # first snapshot: all touched chunks
        assert s1["chunks_written"] > 0
        # a tiny second batch touches few chunks; snapshot 2 writes ONLY those
        sk.update_batch([b"late_a", b"late_b", b"late_c"])
        dirty_now = len(sk.dirty_chunks)
        s2 = store.save_snapshot(sk)
        assert s2["chunks_written"] == dirty_now
        assert s2["chunks_written"] < s1["chunks_written"]
        assert s2["chunks_written"] <= 3 * sk.k  # <= one chunk per set bit
        # reconstruction is bit-identical and counter-identical
        _, loaded = BloomChunkStore.load(d)
        assert loaded.to_bytes() == sk.to_bytes()
        assert loaded.n_updates == 5003
        # nothing dirty after a snapshot (reference clears the tracker)
        assert sk.dirty_chunks == set()

    def test_load_missing_config_raises(self, tmp_path):
        from probabilistic_rs_spark.chunkstore import BloomChunkStore
        from probabilistic_rs_spark.errors import SketchConfigError

        with pytest.raises(SketchConfigError, match="config not found"):
            BloomChunkStore.load(str(tmp_path / "nope"))

    def test_create_wipes_existing(self, tmp_path):
        from probabilistic_rs_spark.chunkstore import BloomChunkStore
        from probabilistic_rs_spark.sketches.bloom import BloomSketch

        d = str(tmp_path / "store")
        store = BloomChunkStore.create(d, self._cfg())
        sk = BloomSketch(self._cfg())
        sk.update_batch([b"x", b"y"])
        store.save_snapshot(sk)
        BloomChunkStore.create(d, self._cfg())  # wipe
        _, loaded = BloomChunkStore.load(d)
        assert loaded.n_updates == 0 and loaded.fill_ratio() == 0.0

    def test_merge_bytes_dirty_marking_feeds_incremental_snapshot(self, tmp_path):
        """A live filter folded via merge_bytes (sparse AND dense) then
        incrementally checkpointed must not silently omit merged-in bits
        (round-1 ADVICE item)."""
        from probabilistic_rs_spark.chunkstore import BloomChunkStore
        from probabilistic_rs_spark.sketches.bloom import BloomSketch

        d = str(tmp_path / "store")
        store = BloomChunkStore.create(d, self._cfg())
        live = BloomSketch(self._cfg())
        other = BloomSketch(self._cfg())
        other.update_batch([b"sparse_1", b"sparse_2"])
        live.merge_bytes(other.to_bytes())  # sparse v2 payload
        dense = BloomSketch(self._cfg())
        dense.update_batch([f"d{i}".encode() for i in range(60_000)])
        assert dense.to_bytes()[:1]  # force materialization
        live.merge_bytes(dense.to_bytes())  # likely dense v1 payload
        store.save_snapshot(live)
        _, loaded = BloomChunkStore.load(d)
        assert loaded.to_bytes() == live.to_bytes()
        for item in [b"sparse_1", b"sparse_2", b"d0", b"d59999"]:
            assert loaded.contains(item)

    def test_incremental_checkpoint_kill_resume(self, spark, tmp_path, units):
        """Kill after unit 2 of 4; resume skips done units, the second run's
        snapshots write only newly-dirtied chunks, and the final filter is
        bit-identical to a one-shot build."""
        from probabilistic_rs_spark.chunkstore import IncrementalBloomCheckpoint
        from probabilistic_rs_spark.operators.sketch_agg import SketchSpec, sketch_aggregate
        from probabilistic_rs_spark.sketches.bloom import BloomConfig, BloomSketch

        cfg = BloomConfig(capacity=200_000, false_positive_rate=0.01)
        d = str(tmp_path / "ick")

        class Kill(Exception):
            pass

        def killer(unit, rec):
            if unit == units[1]:
                raise Kill()

        ck = IncrementalBloomCheckpoint(d, "user_id", cfg)
        with pytest.raises(Kill):
            ck.run_units(spark, units, on_unit_done=killer)
        done = ck.completed_units()
        assert set(done) == set(units[:2])
        total_chunks_written_before = sum(r["chunks_written"] for r in done.values())
        live, report = ck.run_units(spark, units)  # resume
        assert report["skipped"] == units[:2] and report["ran"] == units[2:]
        # one-shot oracle build
        spec = SketchSpec("bloom", "bloom", "user_id",
                          {"capacity": cfg.capacity, "false_positive_rate": cfg.false_positive_rate})
        ev = spark.read.parquet(*units)
        oneshot_bytes = bytes(sketch_aggregate(ev, [], [spec]).select("bloom_state").head()[0])
        oneshot = BloomSketch.from_bytes(oneshot_bytes)
        assert live.bits.tobytes() == oneshot.bits.tobytes()
        assert live.n_updates == oneshot.n_updates
        # resumed units wrote incremental generations, not full rewrites
        done = ck.completed_units()
        later = [r for u, r in done.items() if u in units[2:]]
        assert all(r["generation"] >= 3 for r in later)
        assert total_chunks_written_before > 0


    def test_compaction_bounds_generation_files(self, tmp_path):
        """ADVICE r2: a long-running incremental job must not grow the
        store without bound — after compact_every snapshots the
        generations fold into ONE full file, and reconstruction stays
        bit-identical across the compaction boundary."""
        import os

        from probabilistic_rs_spark.chunkstore import BloomChunkStore
        from probabilistic_rs_spark.sketches.bloom import BloomSketch

        d = str(tmp_path / "store")
        store = BloomChunkStore.create(d, self._cfg())
        store.compact_every = 5
        sk = BloomSketch(self._cfg())
        for i in range(12):  # 12 snapshots, threshold 5 -> 2 compactions
            sk.update_batch([f"unit{i}_item{j}".encode() for j in range(200)])
            store.save_snapshot(sk)
            n_files = len(
                [f for f in os.listdir(store.chunks_dir) if f.endswith(".parquet")]
            )
            assert n_files <= 5
        _, loaded = BloomChunkStore.load(d)
        assert loaded.to_bytes() == sk.to_bytes()
        assert loaded.n_updates == sk.n_updates
        # frozen dirt tracker semantics survive compaction
        sk.update_batch([b"post_compact"])
        s = store.save_snapshot(sk)
        assert 0 < s["chunks_written"] <= sk.k
        _, loaded2 = BloomChunkStore.load(d)
        assert loaded2.to_bytes() == sk.to_bytes()

    def test_compact_every_validation(self, tmp_path):
        from probabilistic_rs_spark.chunkstore import BloomChunkStore
        from probabilistic_rs_spark.errors import SketchConfigError

        with pytest.raises(SketchConfigError):
            BloomChunkStore(str(tmp_path / "x"), compact_every=1)


class TestWindowedChunkStores:
    """Per-window incremental persistence — expiring-filter storage parity
    (src/ebloom/storage.rs per-level partitions :210-243, delete_level;
    src/ebloom/filter.rs:344-403 incremental/full snapshot split)."""

    def _cfg(self):
        from probabilistic_rs_spark.sketches.bloom import BloomConfig

        return BloomConfig(capacity=50_000, false_positive_rate=0.01)

    def _blob(self, items):
        from probabilistic_rs_spark.sketches.bloom import BloomPartialBuilder

        b = BloomPartialBuilder(self._cfg())
        b.update_batch(items)
        return b.to_bytes()

    def test_absorb_is_incremental_and_frozen_windows_untouched(self, tmp_path):
        import os

        from probabilistic_rs_spark.chunkstore import WindowedBloomChunkStores

        ws = WindowedBloomChunkStores(str(tmp_path / "w"), self._cfg(), num_levels=3)
        s1 = ws.absorb("2024-01-01", self._blob([f"a{i}".encode() for i in range(3000)]))
        assert s1["chunks_written"] > 0
        # second fold into the SAME window: only newly-dirtied chunks
        s2 = ws.absorb("2024-01-01", self._blob([b"late_x", b"late_y"]))
        assert 0 < s2["chunks_written"] <= 2 * 8  # <= one chunk per set bit
        # a new window freezes the old one: absorbing into window 2 must
        # not rewrite window 1's files
        w1dir = str(tmp_path / "w" / "window=2024-01-01" / "chunks")
        before = {f: os.path.getmtime(os.path.join(w1dir, f)) for f in os.listdir(w1dir)}
        ws.absorb("2024-01-08", self._blob([f"b{i}".encode() for i in range(1000)]))
        after = {f: os.path.getmtime(os.path.join(w1dir, f)) for f in os.listdir(w1dir)}
        assert after == before
        # reload parity: window 1 contains its items
        sk = ws.load("2024-01-01")
        assert sk.contains(b"a0") and sk.contains(b"late_x") and not sk.contains(b"zz")

    def test_retention_deletes_old_windows_probe_set_stable(self, tmp_path):
        from probabilistic_rs_spark.chunkstore import WindowedBloomChunkStores
        from probabilistic_rs_spark.sketches.bloom import BloomSketch

        ws = WindowedBloomChunkStores(str(tmp_path / "w"), self._cfg(), num_levels=2)
        for i, wk in enumerate(["2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22"]):
            ws.absorb(wk, self._blob([f"w{i}_{j}".encode() for j in range(500)]))
        active_before = ws.active_level_states()
        assert [k for k, _ in active_before] == ["2024-01-15", "2024-01-22"]
        doomed = ws.enforce_retention()
        assert doomed == ["2024-01-01", "2024-01-08"]
        assert ws.windows() == ["2024-01-15", "2024-01-22"]
        active_after = ws.active_level_states()
        # probe view over the active set is unchanged by retention
        assert [k for k, _ in active_after] == [k for k, _ in active_before]
        for (_, a), (_, b) in zip(active_after, active_before):
            assert BloomSketch.from_bytes(a).bits.tobytes() == BloomSketch.from_bytes(b).bits.tobytes()

    def test_level_cap_and_bad_key(self, tmp_path):
        from probabilistic_rs_spark.chunkstore import WindowedBloomChunkStores
        from probabilistic_rs_spark.errors import SketchConfigError

        with pytest.raises(SketchConfigError, match="1..=255"):
            WindowedBloomChunkStores(str(tmp_path / "w"), self._cfg(), num_levels=256)
        ws = WindowedBloomChunkStores(str(tmp_path / "w"), self._cfg())
        with pytest.raises(SketchConfigError, match="invalid window key"):
            ws.absorb("../evil", b"")


class TestConfigJsonRoundTrip:
    """Config serialization parity tests (reference
    tests/core_bloom_config_validation_tests.rs:455-675: round-trip with
    custom values, corrupted-input failure, error-message content)."""

    def test_chunk_store_config_round_trip_custom_values(self, tmp_path):
        from probabilistic_rs_spark.chunkstore import BloomChunkStore
        from probabilistic_rs_spark.sketches.bloom import BloomConfig

        cfg = BloomConfig(capacity=123_456, false_positive_rate=0.007, chunk_size_bytes=1024)
        d = str(tmp_path / "s")
        BloomChunkStore.create(d, cfg)
        _, sk = BloomChunkStore.load(d)
        assert sk.config == cfg  # persisted config wins, all custom fields intact
        # derived params recomputed identically from the round-tripped config
        from probabilistic_rs_spark.sketches.bloom import BloomSketch

        ref = BloomSketch(cfg)
        assert (sk.m, sk.k) == (ref.m, ref.k)

    def test_corrupted_config_json_fails(self, tmp_path):
        from probabilistic_rs_spark.chunkstore import BloomChunkStore
        from probabilistic_rs_spark.sketches.bloom import BloomConfig

        d = str(tmp_path / "s")
        store = BloomChunkStore.create(d, BloomConfig(capacity=1000))
        with open(store.meta_path, "w") as f:
            f.write('{"capacity": 1000, "false_po')  # truncated mid-key
        with pytest.raises(Exception):
            BloomChunkStore.load(d)

    def test_validation_error_messages_match_reference(self):
        """Error-message content parity (reference asserts exact strings,
        tests/core_bloom_config_validation_tests.rs:646-675)."""
        from probabilistic_rs_spark.errors import SketchConfigError
        from probabilistic_rs_spark.sketches.bloom import BloomConfig

        with pytest.raises(SketchConfigError, match="Capacity must be greater than 0"):
            BloomConfig(capacity=0).validate()
        with pytest.raises(
            SketchConfigError, match="False positive rate must be between 0 and 1"
        ):
            BloomConfig(false_positive_rate=1.5).validate()
        with pytest.raises(SketchConfigError, match="Chunk size must be greater than 0"):
            BloomConfig(chunk_size_bytes=0).validate()
