"""Spark-side operators: partial/merge sketch aggregation, membership
probes, heavy hitters, quantiles, windowed expiring filters, dedup, ANN."""

from probabilistic_rs_spark.operators.sketch_agg import (
    SketchSpec,
    sketch_aggregate,
    sketch_partials,
    sketch_merge,
)

__all__ = [
    "SketchSpec",
    "sketch_aggregate",
    "sketch_partials",
    "sketch_merge",
]
