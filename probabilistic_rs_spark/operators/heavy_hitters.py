"""Heavy hitters via Count-Min Sketch + partition-local candidate tracking.

North-star query 2 (SURVEY.md §2.9): heavy-hitter hostnames over a
Zipf-skewed key column. The classic Spark failure mode is
``groupBy(host).count()`` shuffling a hot key to one reducer. This
operator never shuffles by the key at all:

* per input partition (mapInArrow): one CMS absorbing every key occurrence
  (vectorized: ``np.unique`` + weighted counter scatter), plus the
  partition-local exact top-C candidates — a salted pre-aggregation where
  the "salt" is the physical partition id.
* one shuffle of (CMS state + candidate list) rows — size independent of
  both row count and key skew.
* final merge: CMS matrix-add, candidate-union, estimate = min-over-rows
  for each candidate. Overestimate ≤ εN with prob ≥ 1−δ.

A true heavy hitter (count ≥ N·φ) is guaranteed to be a local top
candidate in at least one partition when C is sized generously, since its
global share implies a matching local share in some partition.

Also provided: ``salted_group_count`` — the exact two-stage
``groupBy(key, salt) → groupBy(key)`` pre-aggregation pattern with Spark
built-ins, for when exact counts are required on skewed keys through
operators that lack partial aggregation (e.g. ``applyInPandas``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from probabilistic_rs_spark.sketches.cms import CountMinSketch

_PARTIAL_SCHEMA = StructType(
    [
        StructField("__pid", IntegerType(), False),
        StructField("cms_state", BinaryType(), False),
        StructField("cand_keys", ArrayType(StringType()), False),
        StructField("cand_hashes", ArrayType(LongType()), False),
        StructField("n_updates", LongType(), False),
    ]
)

_FINAL_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("est_count", LongType(), False),
    ]
)


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    eps: float = 0.0001,
    delta: float = 0.001,
    candidates_per_partition: int = 1024,
    threshold: int | None = None,
    top_k: int | None = None,
    tree_fanin: int | None = None,
) -> DataFrame:
    """Returns (key, est_count) for candidate heavy hitters; filter with
    ``threshold`` (count ≥ threshold) and/or ``top_k``.

    ``tree_fanin``: pre-merge partials in ``pid % fanin`` buckets so the
    final reducer sees at most ``fanin`` rows — required when the input
    has ~10⁴+ partitions (otherwise one reducer deserializes every
    partition's CMS matrix)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    projected = df.select(
        F.col(key_col).cast("string").alias("__key"),
        F.xxhash64(F.col(key_col).cast("string")).alias("__h"),
    )
    arrow_schema = to_arrow_schema(_PARTIAL_SCHEMA)
    eps_, delta_, cpp = eps, delta, candidates_per_partition

    def build(batches: Iterator) -> Iterator:
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        cms = CountMinSketch(eps=eps_, delta=delta_)
        counts: dict = {}  # hash -> [count, key]
        n = 0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            keys = batch.column("__key").to_numpy(zero_copy_only=False)
            hashes = (
                batch.column("__h").to_numpy(zero_copy_only=False).view(np.uint64)
            )
            n += len(hashes)
            uh, first_idx, ucnt = np.unique(
                hashes, return_index=True, return_counts=True
            )
            cms.update_hashes(uh, ucnt)
            for h, fi, c in zip(uh.tolist(), first_idx.tolist(), ucnt.tolist()):
                ent = counts.get(h)
                if ent is None:
                    counts[h] = [c, keys[fi]]
                else:
                    ent[0] += c
        if n == 0:
            return
        top = sorted(counts.items(), key=lambda kv: (-kv[1][0], kv[0]))[:cpp]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], type=pa.int32()),
                pa.array([cms.to_bytes()], type=pa.binary()),
                pa.array([[str(kv[1][1]) for kv in top]], type=pa.list_(pa.string())),
                pa.array(
                    [[np.int64(np.uint64(kv[0]).astype(np.int64)) for kv in top]],
                    type=pa.list_(pa.int64()),
                ),
                pa.array([n], type=pa.int64()),
            ],
            schema=arrow_schema,
        )

    partials = projected.mapInArrow(build, _PARTIAL_SCHEMA)

    def premerge(pdf: pd.DataFrame) -> pd.DataFrame:
        """Bucket-level partial merge: CMS add + candidate union (deduped
        by hash). Output shape identical to a single partial row."""
        pdf = pdf.sort_values("__pid", kind="stable")
        blobs = pdf["cms_state"]
        cms = CountMinSketch.from_bytes(blobs.iloc[0])
        for b in blobs.iloc[1:]:
            cms.merge_bytes(b)
        key_by_hash: dict = {}
        for keys, hashes in zip(pdf["cand_keys"], pdf["cand_hashes"]):
            for k, h in zip(keys, hashes):
                key_by_hash.setdefault(int(h), k)
        hs = sorted(key_by_hash.keys())
        return pd.DataFrame(
            {
                "__pid": [int(pdf["__pid"].iloc[0])],
                "cms_state": [cms.to_bytes()],
                "cand_keys": [[key_by_hash[h] for h in hs]],
                "cand_hashes": [hs],
                "n_updates": [int(pdf["n_updates"].sum())],
            }
        )

    if tree_fanin and tree_fanin > 1:
        partials = (
            partials.withColumn("__bucket", F.pmod(F.col("__pid"), F.lit(tree_fanin)))
            .groupBy("__bucket")
            .applyInPandas(premerge, _PARTIAL_SCHEMA)
        )

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__pid", kind="stable")
        blobs = pdf["cms_state"]
        cms = CountMinSketch.from_bytes(blobs.iloc[0])
        for b in blobs.iloc[1:]:
            cms.merge_bytes(b)
        key_by_hash: dict = {}
        for keys, hashes in zip(pdf["cand_keys"], pdf["cand_hashes"]):
            for k, h in zip(keys, hashes):
                key_by_hash.setdefault(int(h), k)
        if not key_by_hash:
            return pd.DataFrame({"key": [], "est_count": []})
        hs = np.array(sorted(key_by_hash.keys()), dtype=np.int64).view(np.uint64)
        ests = cms.estimate_hashes(hs)
        return pd.DataFrame(
            {
                "key": [key_by_hash[int(h)] for h in hs.view(np.int64)],
                "est_count": ests.astype(np.int64),
            }
        )

    merged = (
        partials.withColumn("__g", F.lit(1)).groupBy("__g").applyInPandas(finish, _FINAL_SCHEMA)
    )
    out = merged
    if threshold is not None:
        out = out.where(F.col("est_count") >= threshold)
    if top_k is not None:
        out = out.orderBy(F.desc("est_count"), "key").limit(top_k)
    return out


def build_cms_state(
    df: DataFrame,
    key_col: str,
    eps: float = 0.0001,
    delta: float = 0.001,
    tree_fanin: int | None = 64,
) -> bytes:
    """Distributed CMS build over a key column; returns final state bytes
    on the driver (for broadcast probing with :func:`cms_probe`)."""
    from probabilistic_rs_spark.operators.sketch_agg import SketchSpec, sketch_aggregate

    spec = SketchSpec("cms", "cms", key_col, {"eps": eps, "delta": delta})
    if tree_fanin is not None and df.rdd.getNumPartitions() <= 2 * tree_fanin:
        tree_fanin = None
    merged = sketch_aggregate(df, [], [spec], tree_fanin=tree_fanin)
    return bytes(merged.select("cms_state").head()["cms_state"])


def cms_probe(
    probe_df: DataFrame,
    key_col: str,
    state: bytes,
    out_col: str = "est_count",
) -> DataFrame:
    """Adds a bigint point-estimate column: the CMS frequency estimate for
    each row's key (min over d rows; overestimate ≤ εN with prob ≥ 1−δ).
    The counting analog of the Bloom ``contains_bulk`` probe: broadcast the
    final state once, estimate whole Arrow batches map-side — zero
    exchanges in the probe plan. Keys are hashed JVM-side with the same
    ``xxhash64(cast string)`` the build path uses, so probe and build
    agree byte-for-byte."""
    from pyspark.sql.functions import pandas_udf

    sc = probe_df.sparkSession.sparkContext
    bc = sc.broadcast(state)

    @pandas_udf(LongType())
    def est(hashes: pd.Series) -> pd.Series:
        cms = CountMinSketch.from_bytes(bc.value)
        h = hashes.to_numpy(dtype="int64").view(np.uint64)
        return pd.Series(cms.estimate_hashes(h).astype(np.int64))

    return probe_df.withColumn(
        out_col, est(F.xxhash64(F.col(key_col).cast("string")))
    )


def salted_group_count(
    df: DataFrame, key_col: str, n_salts: int = 16
) -> DataFrame:
    """Exact skew-safe counting: two-stage aggregation
    ``groupBy(key, salt) → groupBy(key)``. The salt splits a hot key's rows
    across ``n_salts`` reducers before the final (tiny) re-aggregation.
    Returns (key, cnt)."""
    salted = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).alias("__salt"),
    )
    stage1 = salted.groupBy("key", "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return stage1.groupBy("key").agg(F.sum("__c").cast("long").alias("cnt"))
