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


def tdigest_cdf_probe(
    probe_df: DataFrame,
    value_col: str,
    state: bytes,
    out_col: str = "cdf",
) -> DataFrame:
    """Adds a double column: the approximate rank fraction of each row's
    value under a broadcast t-digest state — the inverse of the quantile
    query, and the building block for quantile-bucket assignment
    ("which decile is this document's length in?") at any scale: the
    digest is broadcast once, the probe is a vectorized map-side batch
    interp with zero exchanges."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from probabilistic_rs_spark.sketches.tdigest import TDigest

    sc = probe_df.sparkSession.sparkContext
    bc = sc.broadcast(state)

    def _cdf(vals):
        td = TDigest.from_bytes(bc.value)
        return pd.Series(td.cdf_batch(vals.to_numpy(dtype="float64")))

    _cdf.__annotations__ = {"vals": pd.Series, "return": pd.Series}
    cdf_udf = pandas_udf(DoubleType())(_cdf)
    return probe_df.withColumn(out_col, cdf_udf(F.col(value_col).cast("double")))


def build_tdigest_state(
    df: DataFrame, value_col: str, delta: float = 200.0, tree_fanin: int | str | None = "auto"
) -> bytes:
    """Distributed t-digest build over a numeric column; returns final
    state bytes on the driver (for broadcast probing with
    :func:`tdigest_cdf_probe`)."""
    from probabilistic_rs_spark.operators.sketch_agg import resolve_tree_fanin

    spec = SketchSpec("td", "tdigest", value_col, {"delta": delta})
    merged = sketch_aggregate(df, [], [spec], tree_fanin=resolve_tree_fanin(df, tree_fanin))
    row = merged.select("td_state").head()
    if row is None:  # empty input -> empty digest, not a crash
        return spec.make().to_bytes()
    return bytes(row["td_state"])
