"""Distributed quantile estimation (t-digest / KLL) — north-star query 3.

Thin composition over the generic partial/merge pipeline: partial digests
per partition, one tiny-state shuffle, merged digest, quantile vector —
then exploded to tidy (metric, q, value) rows with built-in
``posexplode`` (JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from probabilistic_rs_spark.operators.sketch_agg import (
    SketchSpec,
    sketch_aggregate,
    with_quantiles,
)


def approx_quantiles(
    df: DataFrame,
    value_cols: dict[str, str],
    qs: list[float],
    kind: str = "tdigest",
    group_cols: list[str] | None = None,
    tree_fanin: int | None = 64,
    **params,
) -> DataFrame:
    """Quantiles of several numeric columns in ONE pass.

    ``value_cols``: {metric_name: column_expr_string}. Returns
    (group_cols…, metric, q, value)."""
    group_cols = group_cols or []
    specs = [SketchSpec(name, kind, col, dict(params)) for name, col in value_cols.items()]
    merged = sketch_aggregate(df, group_cols, specs, tree_fanin=tree_fanin)
    for spec in specs:
        merged = with_quantiles(merged, spec.state_col, kind, qs, f"__q_{spec.name}")
    qs_arr = F.array(*[F.lit(float(q)) for q in qs])
    parts = []
    for spec in specs:
        base = merged.select(
            *group_cols,
            F.lit(spec.name).alias("metric"),
            F.posexplode(F.col(f"__q_{spec.name}")).alias("__pos", "value"),
        )
        parts.append(
            base.withColumn("q", F.element_at(qs_arr, F.col("__pos") + 1)).select(
                *group_cols, "metric", "q", "value"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
