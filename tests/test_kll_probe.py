"""KLL CDF probe family (VERDICT r4 advice #4): the pandas kernel and
the native resampled-CDF codegen probe, cross-checked against each other
and against exact ranks."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from probabilistic_rs_spark.operators.quantiles import (
    build_kll_state,
    kll_cdf_probe,
    native_kll_cdf_probe,
)
from probabilistic_rs_spark.sketches.kll import KLLSketch


@pytest.fixture(scope="module")
def values_and_state(spark):
    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [rng.normal(50, 10, 60_000), rng.exponential(30, 40_000)]
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "v double").cache()
    df.count()
    state = build_kll_state(df, "v", k=200)
    return vals, df, state


class TestKllCdf:
    def test_pandas_probe_within_rank_error(self, spark, values_and_state):
        vals, _, state = values_and_state
        pts = [10.0, 30.0, 50.0, 70.0, 120.0]
        probes = spark.createDataFrame([(p,) for p in pts], "v double")
        est = {r["v"]: r["cdf"] for r in kll_cdf_probe(probes, "v", state).collect()}
        for p in pts:
            exact = float((vals <= p).mean())
            assert abs(est[p] - exact) <= 0.02, (p, est[p], exact)

    def test_native_probe_matches_pandas_kernel(self, spark, values_and_state):
        vals, df, state = values_and_state
        # probe the whole input: native interp must track the exact
        # kernel within the resample-bucket variation everywhere
        pd_rows = kll_cdf_probe(df, "v", state).select("v", "cdf").collect()
        nat_rows = native_kll_cdf_probe(df, "v", state).select("v", "cdf").collect()
        pd_map = {r["v"]: r["cdf"] for r in pd_rows}
        max_dev = max(abs(pd_map[r["v"]] - r["cdf"]) for r in nat_rows)
        assert max_dev <= 0.01, max_dev

    def test_native_probe_plan_is_jvm_only(self, spark, values_and_state):
        _, df, state = values_and_state
        plan = native_kll_cdf_probe(df, "v", state)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_null_and_bounds(self, spark, values_and_state):
        _, _, state = values_and_state
        sk = KLLSketch.from_bytes(state)
        probes = spark.createDataFrame(
            [(None,), (sk.item_min - 100.0,), (sk.item_max + 100.0,)], "v double"
        )
        got = native_kll_cdf_probe(probes, "v", state).collect()
        by_v = {r["v"]: r["cdf"] for r in got}
        assert by_v[None] is None
        assert by_v[sk.item_min - 100.0] == 0.0
        assert by_v[sk.item_max + 100.0] == 1.0

    def test_pandas_probe_null_agrees_with_native(self, spark, values_and_state):
        # ADVICE r5: the pandas kernel used to map null → cdf=1.0 (NaN
        # sorts past the last item); both probes must return null on null
        _, _, state = values_and_state
        probes = spark.createDataFrame([(None,), (50.0,)], "v double")
        got = {r["v"]: r["cdf"] for r in kll_cdf_probe(probes, "v", state).collect()}
        assert got[None] is None
        assert got[50.0] is not None

    def test_empty_and_degenerate_states(self, spark):
        empty = KLLSketch(k=200).to_bytes()
        one = KLLSketch(k=200)
        one.update_values(np.array([5.0] * 10))
        probes = spark.createDataFrame([(1.0,), (5.0,), (9.0,)], "v double")
        out = native_kll_cdf_probe(probes, "v", empty).collect()
        assert all(np.isnan(r["cdf"]) for r in out)
        got = {r["v"]: r["cdf"] for r in native_kll_cdf_probe(probes, "v", one.to_bytes()).collect()}
        assert got[1.0] == 0.0 and got[5.0] == 1.0 and got[9.0] == 1.0
