"""Bloom membership operators — build, broadcast, probe.

The probe is the Spark restatement of the reference's ``contains_bulk``
(``src/bloom/filter.rs:440-477``): the final filter bytes are broadcast to
executors once, and a vectorized ``pandas_udf`` tests a whole Arrow batch
per call. At scale this is the approximate semi-join the Bloom filter
exists for (SURVEY.md §2.7): a ~1–100 MB broadcast replaces shuffling the
full probe side.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from probabilistic_rs_spark.operators.sketch_agg import SketchSpec, sketch_aggregate
from probabilistic_rs_spark.sketches.bloom import BloomSketch

# executor-side cache: deserialize a broadcast filter once per worker,
# not once per Arrow batch (analog of the reference's long-lived filter
# object behind Arc<RwLock>, src/bloom/filter.rs:20-34)
_FILTER_CACHE: dict[str, BloomSketch] = {}


def build_bloom_state(
    df: DataFrame,
    item_col: str,
    capacity: int,
    false_positive_rate: float = 0.01,
    tree_fanin: int | str | None = "auto",
) -> bytes:
    """Distributed Bloom build: partial filters per partition, bitwise-OR
    tree merge, returns the final state bytes on the driver.

    ``tree_fanin="auto"``: pre-merge level only when the partition count
    warrants it; an explicit int is always honored, ``None`` disables."""
    from probabilistic_rs_spark.operators.sketch_agg import resolve_tree_fanin

    spec = SketchSpec(
        "bloom",
        "bloom",
        item_col,
        {"capacity": capacity, "false_positive_rate": false_positive_rate},
    )
    merged = sketch_aggregate(df, [], [spec], tree_fanin=resolve_tree_fanin(df, tree_fanin))
    row = merged.select("bloom_state").head()
    if row is None:  # empty input -> empty filter, not a crash
        return spec.make().to_bytes()
    return bytes(row["bloom_state"])


def _get_filter(key: str, blob: bytes) -> BloomSketch:
    sk = _FILTER_CACHE.get(key)
    if sk is None:
        sk = BloomSketch.from_bytes(blob)
        if len(_FILTER_CACHE) > 8:
            _FILTER_CACHE.clear()
        _FILTER_CACHE[key] = sk
    return sk


def bloom_probe(
    probe_df: DataFrame,
    item_col: str,
    state: bytes,
    out_col: str = "is_member",
) -> DataFrame:
    """Adds a boolean membership column. Zero false negatives guaranteed
    (reference gate ``tests/core_bloom_filter_tests.rs:402-420``); false
    positives bounded by the filter's configured FPR."""
    sc = probe_df.sparkSession.sparkContext
    bc = sc.broadcast(state)
    key = hashlib.sha1(state[:64] + state[-64:] + len(state).to_bytes(8, "little")).hexdigest()

    @pandas_udf(BooleanType())
    def probe(items: pd.Series) -> pd.Series:
        import pyarrow as pa

        from probabilistic_rs_spark.functions.hashing import pad_batch_arrow

        sk = _get_filter(key, bc.value)
        buf, lens = pad_batch_arrow(
            pa.Array.from_pandas(items, type=pa.string()), scratch_key="bloom_probe"
        )
        return pd.Series(sk.contains_padded(buf, lens))

    return probe_df.withColumn(out_col, probe(F.col(item_col).cast("string")))


def bloom_semi_filter(
    probe_df: DataFrame, item_col: str, state: bytes
) -> DataFrame:
    """Approximate semi-join pre-filter: keep rows whose key is (probably)
    in the filter. At 100 TB this prunes the expensive exact join's input;
    the exact join downstream removes the ≤FPR false positives."""
    return bloom_probe(probe_df, item_col, state).where(F.col("is_member")).drop("is_member")
