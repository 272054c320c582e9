"""Sketch-state re-aggregation — merging already-built states to a
coarser grouping without touching input data.

This is the property that makes a sketch library worth having at 100 TB:
partial states are first-class, so a per-(lang, day) HLL table built once
can answer per-lang, per-day, and global cardinalities by merging a few
KB of states instead of rescanning the input (SURVEY.md §2.7 "set ops":
merge-as-union is the one operation the reference never ships —
``src/bloom/filter.rs`` has no ``merge()`` — and the Spark build adds as
the core algebra; Bloom OR / HLL register-max / CMS add are exact under
re-association, t-digest/KLL stay within their rank-error bound).

The input is any DataFrame shaped like ``sketch_aggregate`` output:
``(group_cols…, {name}_state binary…, n_updates long)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from probabilistic_rs_spark.errors import SketchConfigError
from probabilistic_rs_spark.operators.sketch_agg import SketchSpec, sketch_merge


def reaggregate_states(
    states: DataFrame,
    finer_cols: list[str],
    coarser_cols: list[str],
    specs: list[SketchSpec],
    tree_fanin: int | None = None,
) -> DataFrame:
    """Merge state rows grouped by ``finer_cols`` down to ``coarser_cols``
    (must be a subset). Only sketch bytes move; input data is never read.

    The merge-order tag (``__pid``) is derived from a hash of the dropped
    finer key so the fold order is stable across runs and shuffle
    arrivals — bit-identical results for Bloom/HLL/CMS, bound-stable for
    t-digest/KLL (SURVEY.md §2.8).
    """
    missing = [c for c in coarser_cols if c not in finer_cols]
    if missing:
        raise SketchConfigError(
            f"coarser_cols must be a subset of finer_cols; extra: {missing}"
        )
    dropped = [c for c in finer_cols if c not in coarser_cols]
    order_tag = (
        F.pmod(
            F.xxhash64(*[F.col(c).cast("string") for c in dropped]),
            F.lit(2_147_483_647),
        ).cast("int")
        if dropped
        else F.lit(0)
    )
    partials = states.withColumn("__pid", order_tag).select(
        *coarser_cols, "__pid", *[s.state_col for s in specs], "n_updates"
    )
    return sketch_merge(partials, coarser_cols, specs, tree_fanin=tree_fanin)


def with_hll_intersection(
    df: DataFrame,
    state_a_col: str,
    state_b_col: str,
    out_col: str = "n_intersection",
) -> DataFrame:
    """Set-algebra over mergeable HLL states: estimate |A ∩ B| by
    inclusion–exclusion, ``|A| + |B| − |A ∪ B|``, where the union is one
    register-max merge — no input rescan. In sparse mode (both states
    below their sparse threshold) all three terms are exact distinct
    counts, so the intersection is exact up to 64-bit hash collisions; in
    dense mode the error compounds to ~3 sketch standard errors, the
    textbook inclusion–exclusion caveat. Adds a bigint column, clamped at
    0 (the estimator can go slightly negative for near-disjoint sets)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    from probabilistic_rs_spark.sketches.hll import HyperLogLog

    def _inter(a, b):
        out = []
        for ab, bb in zip(a, b):
            ha = HyperLogLog.from_bytes(bytes(ab))
            hb = HyperLogLog.from_bytes(bytes(bb))
            union = HyperLogLog.from_bytes(bytes(ab)).merge(hb)
            est = ha.estimate() + hb.estimate() - union.estimate()
            out.append(max(0, int(round(est))))
        return pd.Series(out, dtype="int64")

    # real annotation objects (this module uses PEP-563 string annotations,
    # which pyspark's multi-arg pandas_udf signature check rejects)
    _inter.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    inter = pandas_udf(LongType())(_inter)

    return df.withColumn(out_col, inter(F.col(state_a_col), F.col(state_b_col)))
