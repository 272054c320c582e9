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


# driver-side cache of the one-row resampled-CDF relation, keyed by
# (applicationId, state digest, resolution) — membership._WORDS_DF_CACHE idiom
_CDF_TABLE_DF_CACHE: dict[tuple[str, str, int], DataFrame] = {}


def native_tdigest_cdf_probe(
    probe_df: DataFrame,
    value_col: str,
    state: bytes,
    out_col: str = "cdf",
    resolution: int = 4096,
) -> DataFrame:
    """``tdigest_cdf_probe`` with ZERO Python in the per-row path, via a
    RESAMPLED CDF: the digest's piecewise-linear CDF is evaluated once,
    driver-side, at ``resolution + 1`` equally spaced points over
    [vmin, vmax]; the probe is then pure codegen arithmetic — bucket
    index + linear interpolation between two ``element_at`` lookups of
    the broadcast table.

    This is a second approximation layered on the digest (the exact
    kernel interpolates between true centroid positions; this one
    between equal-width samples of that same curve). The added error is
    bounded by the CDF's variation within one bucket — ≤ the digest's
    own rank-error scale for ``resolution`` ≳ number of centroids (a
    delta-200 digest holds ~100–200 centroids; the default 4096 buckets
    oversample it 20×). NaN for empty digests and NULL for NULL inputs;
    values outside [vmin, vmax] clamp to 0/1 exactly like ``np.interp``.

    Measured (round 4, 600k-row probe, local[32]): a WASH vs the pandas
    kernel (0.46 s vs 0.48 s warm) — ``np.interp`` is already one
    vectorized call per Arrow batch, so unlike the membership probes
    there is no boxing to eliminate. Choose this form not for speed but
    for COMPOSABILITY: the CDF is a plain column expression that can sit
    inside a join condition, a streaming projection, or any plan segment
    where a Python boundary would break whole-stage codegen or state
    serialization; choose :func:`tdigest_cdf_probe` when exact-kernel
    interpolation parity matters."""
    from probabilistic_rs_spark.sketches.tdigest import TDigest

    td = TDigest.from_bytes(state)
    k = int(resolution)
    if k < 2:
        raise ValueError("resolution must be >= 2")
    if td.n_centroids == 0 or td.vmax <= td.vmin:
        # empty or degenerate (single point): constant expression, no join
        const = (
            F.lit(float("nan"))
            if td.n_centroids == 0
            else F.when(F.col(value_col).cast("double").isNull(), F.lit(None).cast("double"))
            .when(F.col(value_col).cast("double") < F.lit(float(td.vmin)), F.lit(0.0))
            .otherwise(F.lit(1.0))
        )
        return probe_df.withColumn(out_col, const)
    return _resampled_cdf_probe(
        probe_df, value_col, out_col, state,
        vmin=float(td.vmin), vmax=float(td.vmax),
        cdf_fn=td.cdf_batch, resolution=k, low_inclusive=True,
    )


def _cdf_table_df(spark, state: bytes, cdf_fn, vmin: float, vmax: float, k: int):
    """One-row cached relation of the resampled CDF table — shared by the
    t-digest and KLL native probes (same memo idiom as
    ``membership._WORDS_DF_CACHE``)."""
    from probabilistic_rs_spark.common import lru_evict, state_key

    app_id = spark.sparkContext.applicationId
    key = (app_id, state_key(state), k)
    tdf = _CDF_TABLE_DF_CACHE.get(key)
    if tdf is None:
        for old_key in [kk for kk in _CDF_TABLE_DF_CACHE if kk[0] != app_id]:
            try:
                _CDF_TABLE_DF_CACHE.pop(old_key).unpersist()
            except Exception:
                pass
        import numpy as np

        grid = np.linspace(vmin, vmax, k + 1)
        table = cdf_fn(grid)
        tdf = spark.createDataFrame(
            [(table.tolist(),)], "__cdf_table array<double>"
        ).cache()
        _CDF_TABLE_DF_CACHE[key] = tdf
        lru_evict(_CDF_TABLE_DF_CACHE, 8, lambda d: d.unpersist())
    return tdf


def _resampled_cdf_probe(
    probe_df: DataFrame,
    value_col: str,
    out_col: str,
    state: bytes,
    vmin: float,
    vmax: float,
    cdf_fn,
    resolution: int,
    low_inclusive: bool,
) -> DataFrame:
    """The shared codegen body of the native CDF probes: bucket index +
    linear interpolation between two ``element_at`` lookups of the
    broadcast resampled table. ``low_inclusive`` encodes the kernel's
    boundary convention: the t-digest CDF is 0 AT vmin (``np.interp``
    clamp), while the KLL step-CDF already carries positive mass at the
    smallest retained item (rank(min) ≥ weight(min)), so only values
    strictly below it are 0."""
    spark = probe_df.sparkSession
    k = int(resolution)
    tdf = _cdf_table_df(spark, state, cdf_fn, vmin, vmax, k)
    x = F.col(value_col).cast("double")
    span = (vmax - vmin) / k
    pos = (x - F.lit(vmin)) / F.lit(span)
    idx = F.least(F.greatest(F.floor(pos).cast("int"), F.lit(0)), F.lit(k - 1))
    frac = pos - idx.cast("double")
    lo = F.element_at(F.col("__cdf_table"), idx + F.lit(1))
    hi = F.element_at(F.col("__cdf_table"), idx + F.lit(2))
    interp = lo + (hi - lo) * frac
    low_pred = (x <= F.lit(vmin)) if low_inclusive else (x < F.lit(vmin))
    cdf = (
        F.when(x.isNull(), F.lit(None).cast("double"))
        .when(low_pred, F.lit(0.0))
        .when(x >= F.lit(vmax), F.lit(1.0))
        .otherwise(interp)
    )
    return (
        probe_df.crossJoin(F.broadcast(tdf))
        .withColumn(out_col, cdf)
        .drop("__cdf_table")
    )


def build_kll_state(
    df: DataFrame, value_col: str, k: int = 200, tree_fanin: int | str | None = "auto"
) -> bytes:
    """Distributed KLL build over a numeric column; returns final state
    bytes on the driver (for broadcast probing with
    :func:`kll_cdf_probe` / :func:`native_kll_cdf_probe`)."""
    from probabilistic_rs_spark.operators.sketch_agg import resolve_tree_fanin

    spec = SketchSpec("kll", "kll", value_col, {"k": k})
    merged = sketch_aggregate(df, [], [spec], tree_fanin=resolve_tree_fanin(df, tree_fanin))
    row = merged.select("kll_state").head()
    if row is None:
        return spec.make().to_bytes()
    return bytes(row["kll_state"])


def kll_cdf_probe(
    probe_df: DataFrame,
    value_col: str,
    state: bytes,
    out_col: str = "cdf",
) -> DataFrame:
    """Estimated rank fraction of each row's value under a broadcast KLL
    state — :func:`tdigest_cdf_probe`'s deterministic-compaction sibling.
    The kernel is one vectorized ``searchsorted`` over the weighted
    retained items per Arrow batch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from probabilistic_rs_spark.sketches.kll import KLLSketch

    sc = probe_df.sparkSession.sparkContext
    bc = sc.broadcast(state)

    def _cdf(vals):
        sk = KLLSketch.from_bytes(bc.value)
        return pd.Series(sk.cdf_batch(vals.to_numpy(dtype="float64")))

    _cdf.__annotations__ = {"vals": pd.Series, "return": pd.Series}
    cdf_udf = pandas_udf(DoubleType())(_cdf)
    return probe_df.withColumn(out_col, cdf_udf(F.col(value_col).cast("double")))


def native_kll_cdf_probe(
    probe_df: DataFrame,
    value_col: str,
    state: bytes,
    out_col: str = "cdf",
    resolution: int = 4096,
) -> DataFrame:
    """:func:`kll_cdf_probe` with ZERO Python in the per-row path — the
    t-digest resample trick (:func:`native_tdigest_cdf_probe`) applied to
    the KLL compactor CDF (VERDICT r4 advice #4): the step CDF over the
    weighted retained items is sampled once driver-side at ``resolution +
    1`` grid points over [min_item, max_item]; the probe interpolates
    between two ``element_at`` lookups inside whole-stage codegen.

    Added error ≤ the CDF's variation within one grid bucket; with the
    default 4096 buckets oversampling the ≤ O(k·log(n/k)) retained items
    this stays inside the sketch's own ~2/k rank-error scale. Like the
    t-digest variant, measured a perf WASH vs the pandas kernel (one
    vectorized ``searchsorted`` per batch has no boxing to eliminate) —
    ship it for COMPOSABILITY: the CDF becomes a plain column expression
    usable in join conditions / streaming projections where a Python
    boundary would break codegen."""
    from probabilistic_rs_spark.sketches.kll import KLLSketch

    sk = KLLSketch.from_bytes(state)
    k = int(resolution)
    if k < 2:
        raise ValueError("resolution must be >= 2")
    if sk.n_retained == 0 or sk.item_max <= sk.item_min:
        const = (
            F.lit(float("nan"))
            if sk.n_retained == 0
            else F.when(F.col(value_col).cast("double").isNull(), F.lit(None).cast("double"))
            .when(F.col(value_col).cast("double") < F.lit(float(sk.item_min)), F.lit(0.0))
            .otherwise(F.lit(1.0))
        )
        return probe_df.withColumn(out_col, const)
    return _resampled_cdf_probe(
        probe_df, value_col, out_col, state,
        vmin=sk.item_min, vmax=sk.item_max,
        cdf_fn=sk.cdf_batch, resolution=k, low_inclusive=False,
    )
