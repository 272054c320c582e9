"""Round-6 partitioned (non-broadcast) CMS — the count family's
degradation path past the broadcast budget, mirroring the membership
families: distributed (row, block, cells) matrix slices, d JVM-computed
KM cell lookups shuffled to their block, min-combine per key.

* estimates identical to the broadcast probes (same hash, same cells);
* the distributed build's reconstructed matrix is CELL-IDENTICAL to the
  driver-built CountMinSketch on the same data;
* never-seen keys estimate 0 (when their cells are empty);
* mixed geometries and empty tables fail safe;
* the probe plan needs no broadcast (shuffle equi-joins only).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from probabilistic_rs_spark.errors import SketchConfigError
from probabilistic_rs_spark.operators.heavy_hitters import (
    build_cms_blocks_df,
    build_cms_state,
    cms_partitioned_probe,
    cms_probe,
    native_cms_probe,
)
from probabilistic_rs_spark.sketches.cms import CountMinSketch

EPS, DELTA = 0.01, 0.001  # d=7, w=512: small enough to reconstruct


def _skewed(spark, n=20_000, keys=300):
    # zipf-ish: key id = floor(sqrt(uniform * keys^2)) — heavy low ids
    return spark.range(n).select(
        F.concat(
            F.lit("k"),
            F.floor(F.sqrt(F.pmod(F.xxhash64("id"), F.lit(keys * keys)))).cast("long"),
        ).alias("key")
    )


@pytest.fixture(scope="module")
def built(spark):
    df = _skewed(spark).cache()
    df.count()
    blocks = build_cms_blocks_df(df, "key", eps=EPS, delta=DELTA, cells_per_block=64)
    blocks = blocks.cache()
    blocks.count()
    state = build_cms_state(df, "key", eps=EPS, delta=DELTA)
    yield df, blocks, state
    df.unpersist()
    blocks.unpersist()


class TestCmsPartitioned:
    def test_matrix_cell_identical_to_driver_build(self, built):
        _, blocks, state = built
        cms = CountMinSketch.from_bytes(state)
        got = np.zeros((cms.d, cms.w), dtype=np.int64)
        for r in blocks.collect():
            cells = np.array(r["cells"], dtype=np.int64)
            c0 = r["block"] * r["cells_per_block"]
            got[r["row"], c0 : c0 + len(cells)] = cells
        assert (got == cms.table).all()

    def test_estimates_match_broadcast_probes(self, spark, built):
        df, blocks, state = built
        probes = df.select("key").distinct().union(
            spark.range(5).select(F.concat(F.lit("absent"), "id").alias("key"))
        )
        part = {
            r["key"]: r["est_count"]
            for r in cms_partitioned_probe(probes, "key", blocks).collect()
        }
        pand = {
            r["key"]: r["est_count"]
            for r in cms_probe(probes, "key", state).collect()
        }
        nat = {
            r["key"]: r["est_count"]
            for r in native_cms_probe(probes, "key", state).collect()
        }
        assert part == pand == nat

    def test_exactness_and_bound(self, built):
        df, blocks, _ = built
        exact = {
            r["key"]: r["cnt"]
            for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        n_total = sum(exact.values())
        got = {
            r["key"]: r["est_count"]
            for r in cms_partitioned_probe(
                df.select("key").distinct(), "key", blocks
            ).collect()
        }
        for k, c in exact.items():
            assert got[k] >= c  # CMS never underestimates
            assert got[k] <= c + EPS * n_total  # and stays within eN here

    def test_mixed_geometry_and_empty(self, spark, built):
        df, blocks, _ = built
        mixed = blocks.unionByName(blocks.withColumn("d", F.col("d") + 1))
        with pytest.raises(SketchConfigError, match="mixes CMS geometries"):
            cms_partitioned_probe(df.select("key").limit(1), "key", mixed)
        out = cms_partitioned_probe(
            df.select("key").limit(4), "key", blocks.where("block < 0")
        )
        assert [r["est_count"] for r in out.collect()] == [0, 0, 0, 0]

    def test_probe_plan_needs_no_broadcast(self, spark, built):
        df, blocks, _ = built
        conf = spark.conf
        old_static = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
        old_aqe = conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
        try:
            conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            out = cms_partitioned_probe(df.select("key").distinct(), "key", blocks)
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "CartesianProduct" not in plan
            assert "BroadcastExchange" not in plan
            assert "BroadcastNestedLoopJoin" not in plan
            assert out.count() == df.select("key").distinct().count()
        finally:
            conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
            if old_aqe is None:
                conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
            else:
                conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
