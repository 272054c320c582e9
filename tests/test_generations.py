"""Round-6 durable ops-log generations (VERDICT r5 next-round #5): the
GDPR-purge chain through the lineage layer — write generation g, kill,
resume, fold g+1; the resumed chain must be BIT-IDENTICAL to an
uninterrupted one, the crash window (states written, lineage missing)
must be idempotent, and the persisted config must win on load."""

from __future__ import annotations


import os


import pytest

from pyspark.sql import functions as F

from probabilistic_rs_spark.errors import SketchConfigError
from probabilistic_rs_spark.generations import GenerationLog


def _ops(spark, lo, hi, op, prefix="g"):
    return spark.range(lo, hi).select(
        F.lit(op).alias("op"), F.concat(F.lit(prefix), F.col("id")).alias("key")
    )


def _state_rows(spark, log, gen):
    return sorted(
        (r["shard"], bytes(r["state"]), r["n_items"], r["n_shards"])
        for r in log.states_df(spark, gen).collect()
    )


GENS = [
    (1, "insert", (0, 5000)),
    (2, "insert", (5000, 8000)),
    (3, "delete", (0, 2000)),
]


def _feed(spark, g):
    gen, op, (lo, hi) = GENS[g - 1]
    return _ops(spark, lo, hi, op)


@pytest.mark.parametrize("family,params", [
    ("cuckoo", {"capacity": 20_000, "n_shards": 8}),
    ("cuckoo", {"capacity": 20_000, "n_shards": 8, "native": True}),
    ("quotient", {"capacity": 20_000, "false_positive_rate": 1e-8, "shard_bits": 3}),
])
def test_kill_resume_bit_identical(spark, tmp_path, family, params):
    # uninterrupted chain
    d_ref = str(tmp_path / f"{family}-ref")
    ref = GenerationLog.create(d_ref, family, "key", **params)
    for g in (1, 2, 3):
        ref.apply_generation(spark, _feed(spark, g), g)

    # interrupted chain: apply 1..2, "kill" (drop the object), resume
    d = str(tmp_path / f"{family}-resumed")
    log = GenerationLog.create(d, family, "key", **params)
    log.apply_generation(spark, _feed(spark, 1), 1)
    log.apply_generation(spark, _feed(spark, 2), 2)
    del log
    resumed = GenerationLog.load(d)
    assert resumed.last_generation() == 2
    # re-applying a durable generation is a no-op skip
    resumed.apply_generation(spark, _feed(spark, 2), 2)
    assert resumed.last_generation() == 2
    resumed.apply_generation(spark, _feed(spark, 3), 3)

    for g in (1, 2, 3):
        assert _state_rows(spark, resumed, g) == _state_rows(spark, ref, g), (
            family, g,
        )

    # the surviving set probes correctly through the durable layer
    probes = spark.range(8000).select(F.concat(F.lit("g"), F.col("id")).alias("key"))
    got = resumed.probe(probes, "key").where("is_member").count()
    assert got == 6000  # 8000 inserted - 2000 purged
    gone = resumed.probe(
        spark.range(2000).select(F.concat(F.lit("g"), F.col("id")).alias("key")), "key"
    )
    assert gone.where("is_member").count() == 0


def test_crash_window_between_states_and_lineage(spark, tmp_path):
    d = str(tmp_path / "crashwin")
    log = GenerationLog.create(d, "cuckoo", "key", capacity=20_000, n_shards=4)
    log.apply_generation(spark, _feed(spark, 1), 1)
    before = _state_rows(spark, log, 1)
    # simulate the crash: gen-2 states fully written, lineage NOT
    log.apply_generation(spark, _feed(spark, 2), 2)
    os.remove(os.path.join(d, "lineage", "gen-2.json"))
    resumed = GenerationLog.load(d)
    assert resumed.last_generation() == 1
    with pytest.raises(SketchConfigError, match="no lineage record"):
        resumed.states_df(spark, 2)
    # re-run overwrites the orphaned states dir, bit-identical outcome
    resumed.apply_generation(spark, _feed(spark, 2), 2)
    ref = GenerationLog.create(str(tmp_path / "crashref"), "cuckoo", "key",
                               capacity=20_000, n_shards=4)
    ref.apply_generation(spark, _feed(spark, 1), 1)
    ref.apply_generation(spark, _feed(spark, 2), 2)
    assert _state_rows(spark, resumed, 2) == _state_rows(spark, ref, 2)
    assert _state_rows(spark, resumed, 1) == before  # gen 1 untouched


def test_out_of_order_and_config_wins(spark, tmp_path):
    d = str(tmp_path / "order")
    log = GenerationLog.create(d, "quotient", "key",
                               capacity=1000, false_positive_rate=1e-6, shard_bits=2)
    with pytest.raises(SketchConfigError, match="in order"):
        log.apply_generation(spark, _feed(spark, 1), 2)
    log.apply_generation(spark, _feed(spark, 1), 1)
    # load ignores caller params entirely (persisted config wins)
    again = GenerationLog.create_or_load(d, "quotient", "key",
                                         capacity=999_999, shard_bits=9)
    assert again.params["capacity"] == 1000
    assert again.params["shard_bits"] == 2
    # unknown family rejected
    with pytest.raises(SketchConfigError, match="family"):
        GenerationLog.create(str(tmp_path / "bad"), "bloomish", "key")


def test_create_refuses_to_wipe_foreign_dir(tmp_path):
    """ADVICE r6: create() used to rmtree any existing gen_dir — a typo'd
    path at unrelated data was destroyed. Now it only wipes a directory
    that is recognizably a generation log (has manifest.json) or empty."""
    d = str(tmp_path / "notalog")
    os.makedirs(d)
    with open(os.path.join(d, "precious.txt"), "w") as f:
        f.write("user data")
    with pytest.raises(SketchConfigError, match="refusing to wipe"):
        GenerationLog.create(d, "cuckoo", "key", capacity=1000, n_shards=2)
    assert os.path.exists(os.path.join(d, "precious.txt"))
    # an EMPTY pre-existing directory is fine (mkdir-then-create pattern)
    d2 = str(tmp_path / "empty")
    os.makedirs(d2)
    GenerationLog.create(d2, "cuckoo", "key", capacity=1000, n_shards=2)
    # and recreating over a real log still wipes it (documented recreate)
    log = GenerationLog.create(d2, "cuckoo", "key", capacity=2000, n_shards=2)
    assert log.params["capacity"] == 2000


class TestStreamingOpsFeed:
    """Round 6b: micro-batches as generations — the foreachBatch feed
    over GenerationLog (streaming/ops_feed.py). One parquet file per
    micro-batch (maxFilesPerTrigger=1), so the stream applies one
    generation per file; the durable chain must equal the batch-API
    chain fed the same ops, and a replayed batch must be a no-op."""

    @staticmethod
    def _write_ops_file(spark, path, lo, hi, op):
        import time as _t

        df = _ops(spark, lo, hi, op)
        df.coalesce(1).write.mode("append").parquet(path)
        _t.sleep(0.05)  # distinct mtimes → deterministic file order

    def test_stream_equals_batch_chain_and_resume(self, spark, tmp_path):
        from probabilistic_rs_spark.streaming.ops_feed import (
            start_generation_feed,
        )

        src = str(tmp_path / "ops-src")
        ckpt = str(tmp_path / "ckpt")
        self._write_ops_file(spark, src, 0, 3000, "insert")
        self._write_ops_file(spark, src, 3000, 5000, "insert")

        log = GenerationLog.create(
            str(tmp_path / "stream-log"), "cuckoo", "key",
            capacity=20_000, n_shards=4,
        )
        schema = "op string, key string"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_generation_feed(stream, log, ckpt, available_now=True)
        q.awaitTermination(120)
        assert log.last_generation() == 2

        # restart the SAME checkpoint after a third file arrives: the
        # stream resumes at batch 2 → generation 3 (no replay damage)
        self._write_ops_file(spark, src, 0, 1000, "delete")
        stream2 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q2 = start_generation_feed(stream2, log, ckpt, available_now=True)
        q2.awaitTermination(120)
        assert log.last_generation() == 3

        # the streamed chain is bit-identical to the batch-API chain
        ref = GenerationLog.create(
            str(tmp_path / "batch-log"), "cuckoo", "key",
            capacity=20_000, n_shards=4,
        )
        ref.apply_generation(spark, _ops(spark, 0, 3000, "insert"), 1)
        ref.apply_generation(spark, _ops(spark, 3000, 5000, "insert"), 2)
        ref.apply_generation(spark, _ops(spark, 0, 1000, "delete"), 3)
        assert _state_rows(spark, log, 3) == _state_rows(spark, ref, 3)

        # membership sanity through the log's partitioned probe
        probes = _ops(spark, 0, 6000, "x").select("key")
        out = {
            r["key"]: r["is_member"]
            for r in log.probe(probes, "key").collect()
        }
        assert all(out[f"g{i}"] for i in range(1500, 5000, 377))
        assert not any(out[f"g{i}"] for i in range(0, 1000, 97))
        assert not any(out[f"g{i}"] for i in range(5000, 6000, 97))

    def test_replayed_batch_is_noop(self, spark, tmp_path):
        from probabilistic_rs_spark.streaming.ops_feed import generation_ops_sink

        log = GenerationLog.create(
            str(tmp_path / "replay-log"), "quotient", "key",
            capacity=20_000, false_positive_rate=1e-8, shard_bits=3,
        )
        sink = generation_ops_sink(log)
        sink(_ops(spark, 0, 2000, "insert"), 0)
        before = _state_rows(spark, log, 1)
        # crash-replay of micro-batch 0: lineage exists → skipped
        sink(_ops(spark, 0, 2000, "insert"), 0)
        assert log.last_generation() == 1
        assert _state_rows(spark, log, 1) == before
        # a batch id that would skip a generation fails loudly
        with pytest.raises(SketchConfigError, match="in order"):
            sink(_ops(spark, 0, 10, "insert"), 5)


def test_cs_ops_feed_sink_chain(spark, tmp_path):
    """The streaming ops-feed composes with the cs family unchanged
    (family-agnostic sink): micro-batch folds chain to the same blob as
    the batch API, and a crash-replayed batch id is a no-op."""
    from probabilistic_rs_spark.streaming.ops_feed import generation_ops_sink

    params = {"eps": 0.02, "delta": 0.01}
    log = GenerationLog.create(str(tmp_path / "cs-feed"), "cs", "key", **params)
    sink = generation_ops_sink(log)
    sink(_ops(spark, 0, 500, "insert"), 0)
    sink(_ops(spark, 0, 200, "delete"), 1)
    assert log.last_generation() == 2
    blob = bytes(log.states_df(spark, 2).head()["cs_state"])
    sink(_ops(spark, 0, 500, "insert"), 0)  # replay → skipped
    assert bytes(log.states_df(spark, 2).head()["cs_state"]) == blob

    ref = GenerationLog.create(str(tmp_path / "cs-feed-ref"), "cs", "key", **params)
    ref.apply_generation(spark, _ops(spark, 0, 500, "insert"), 1)
    ref.apply_generation(spark, _ops(spark, 0, 200, "delete"), 2)
    assert bytes(ref.states_df(spark, 2).head()["cs_state"]) == blob


def test_cs_turnstile_generation_chain(spark, tmp_path):
    """Round 7: the count-sketch family through the durable layer — the
    TURNSTILE member: deletes are native (no shard routing), the states
    table is one blob row, kill/resume is bit-identical, and the probe
    returns net counts (negative after over-delete — representable where
    a membership family can only go false)."""
    # exact regime: 800 distinct keys ≪ w = 8192 (eps=0.02) so every net
    # count is exact and the asserts below are deterministic facts
    params = {"eps": 0.02, "delta": 0.01}
    gens = [(1, "insert", (0, 500)), (2, "insert", (500, 800)), (3, "delete", (0, 200))]

    def feed(g):
        _, op, (lo, hi) = gens[g - 1]
        return _ops(spark, lo, hi, op)

    d_ref = str(tmp_path / "cs-ref")
    ref = GenerationLog.create(d_ref, "cs", "key", **params)
    for g in (1, 2, 3):
        ref.apply_generation(spark, feed(g), g)

    d = str(tmp_path / "cs-resumed")
    log = GenerationLog.create(d, "cs", "key", **params)
    log.apply_generation(spark, feed(1), 1)
    log.apply_generation(spark, feed(2), 2)
    del log
    resumed = GenerationLog.load(d)
    assert resumed.last_generation() == 2
    resumed.apply_generation(spark, feed(2), 2)  # idempotent skip
    resumed.apply_generation(spark, feed(3), 3)

    def blob(log_, g):
        return bytes(log_.states_df(spark, g).head()["cs_state"])

    for g in (1, 2, 3):
        assert blob(resumed, g) == blob(ref, g), g

    # net counts through the durable probe: 0..199 purged (1 - 1 = 0),
    # 200..799 present once
    probes = spark.range(800).select(
        F.concat(F.lit("g"), F.col("id")).alias("key")
    )
    got = resumed.probe(probes, "key", out_col="est_count")
    counts = {r["key"]: r["est_count"] for r in got.collect()}
    assert all(counts[f"g{i}"] == 0 for i in range(0, 200))
    assert all(counts[f"g{i}"] == 1 for i in range(200, 800))
    # over-delete generation: counts go NEGATIVE, loudly representable
    resumed.apply_generation(spark, _ops(spark, 0, 100, "delete"), 4)
    neg = resumed.probe(
        spark.range(100).select(F.concat(F.lit("g"), F.col("id")).alias("key")),
        "key",
        out_col="est_count",
    )
    assert all(r["est_count"] == -1 for r in neg.collect())
    m = resumed.metrics()
    assert m["generations"] == 4
    # empty-log probe path returns a zero count column
    empty = GenerationLog.create(str(tmp_path / "cs-empty"), "cs", "key", **params)
    z = empty.probe(probes.limit(5), "key", out_col="est_count")
    assert [r["est_count"] for r in z.collect()] == [0] * 5
