"""Zipf skewed-probe evidence for the partitioned block families
(VERDICT r6 #6): the hash-keyed ``distinct`` at the head of
``windowed_bloom_partitioned_probe`` / ``cms_partitioned_probe``
collapses a hot probe key to ONE row, so a Zipf-distributed probe
multiset costs the bit-test/lookup join only its DISTINCT key count —
the hot key cannot skew the regroup stages.

Evidence is read from the executed plan's own SQL metrics (not a
re-derivation): after running the probe over a multiset where one key
carries ~90% of the rows, the first HashAggregate above the probe scan
(the distinct) reports ``number of output rows == n_distinct``, orders
of magnitude below the probe row count."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


HOT_COPIES = 20_000
N_TAIL = 50


def _zipf_probes(spark, key_col: str):
    """One hot key repeated HOT_COPIES times + N_TAIL singleton keys
    (half of them absent from the build)."""
    hot = spark.range(HOT_COPIES).select(F.lit("k0").alias(key_col))
    tail = spark.range(N_TAIL).select(
        F.concat(F.lit("k"), F.col("id") + 1).alias(key_col)
    )
    return hot.unionByName(tail)


def _final_plan(df):
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getName().endswith("AdaptiveSparkPlanExec"):
        plan = plan.executedPlan()
    return plan


def _iter_nodes(node, _seen=None):
    """Walk the executed physical plan, descending into AQE query-stage
    wrappers (children() is empty on QueryStageExec — the materialized
    subtree hangs off .plan()) with node-id dedup (reused stages)."""
    if _seen is None:
        _seen = set()
    nid = int(node.id())
    if nid in _seen:
        return
    _seen.add(nid)
    yield node
    kids = node.children()
    for i in range(kids.size()):
        yield from _iter_nodes(kids.apply(i), _seen)
    if "QueryStageExec" in node.getClass().getSimpleName():
        yield from _iter_nodes(node.plan(), _seen)


def _distinct_agg_output_rows(df, key_fragment: str) -> list[int]:
    """numOutputRows of every HashAggregate whose grouping references
    ``key_fragment`` (the probe-hash column) in the EXECUTED plan."""
    out = []
    for node in _iter_nodes(_final_plan(df)):
        name = node.getClass().getSimpleName()
        if "HashAggregate" not in name:
            continue
        if key_fragment not in node.simpleString(500):
            continue
        metrics = node.metrics()
        opt = metrics.get("numOutputRows")
        if not opt.isEmpty():
            out.append(int(opt.get().value()))
    return out


class TestZipfSkewedProbe:
    def test_windowed_blocks_hot_key_costs_one_regroup_row(self, spark):
        from probabilistic_rs_spark.operators.windowed_bloom import (
            build_windowed_bloom_blocks_df,
            windowed_bloom_partitioned_probe,
        )

        build = spark.range(2 * 30).select(
            (F.col("id") % 2).alias("level"),
            F.concat(F.lit("k"), (F.col("id") / 2).cast("long")).alias("key"),
        )
        blocks = build_windowed_bloom_blocks_df(
            build, "level", "key",
            capacity_per_level=1000, target_fpr=1e-6, words_per_block=64,
        ).persist()
        try:
            blocks.count()
            probes = _zipf_probes(spark, "key")
            out = windowed_bloom_partitioned_probe(probes, "key", blocks)
            rows = out.collect()
            # verdicts: every row of the hot key true, tail split at k30
            got = {}
            for r in rows:
                got.setdefault(r["key"], set()).add(r["is_member"])
            assert got["k0"] == {True}
            assert len(rows) == HOT_COPIES + N_TAIL
            for i in range(1, N_TAIL + 1):
                assert got[f"k{i}"] == {i < 30}
            # plan evidence: the distinct on the KM hash pair emitted
            # one row per DISTINCT key, not per probe row
            n_distinct = N_TAIL + 1
            aggs = _distinct_agg_output_rows(out, "__wbh1")
            assert aggs, "no HashAggregate over the probe hash pair found"
            assert min(aggs) <= n_distinct * 2
            assert all(a < HOT_COPIES // 10 for a in aggs), (
                f"distinct/regroup stages saw {aggs} rows — the hot key "
                "did not collapse"
            )
        finally:
            blocks.unpersist()

    def test_cms_blocks_hot_key_costs_one_regroup_row(self, spark):
        from probabilistic_rs_spark.operators.heavy_hitters import (
            build_cms_blocks_df,
            cms_partitioned_probe,
        )

        build = spark.range(500).select(
            F.concat(F.lit("k"), F.col("id") % 40).alias("key")
        )
        blocks = build_cms_blocks_df(
            build, "key", eps=0.01, delta=0.01, cells_per_block=64
        ).persist()
        try:
            blocks.count()
            probes = _zipf_probes(spark, "key")
            out = cms_partitioned_probe(probes, "key", blocks)
            rows = out.collect()
            assert len(rows) == HOT_COPIES + N_TAIL
            ests = {}
            for r in rows:
                ests.setdefault(r["key"], set()).add(r["est_count"])
            # the hot key's HOT_COPIES output rows all carry the ONE
            # estimate computed from its single distinct row (build
            # counted k0 500/40 rounded-up times = 13)
            assert ests["k0"] == {13}
            for i in range(40, N_TAIL + 1):
                assert ests[f"k{i}"] == {0}  # absent keys exact zero
            aggs = _distinct_agg_output_rows(out, "__cmsph")
            assert aggs, "no HashAggregate over the probe hash found"
            assert all(a < HOT_COPIES // 10 for a in aggs), (
                f"distinct/regroup stages saw {aggs} rows — the hot key "
                "did not collapse"
            )
        finally:
            blocks.unpersist()
