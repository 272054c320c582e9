"""Distributed quotient filter — membership with deletion AND a true
associative merge.

This closes the reference's planned-structures list
(``/root/reference/specs/overview.md:20-24``). Unlike the cuckoo filter
(shard-parallel because displacement chains don't merge), the quotient
filter's sorted-run union IS an associative/commutative fold, so the
build rides the generic ``sketch_aggregate`` partial/merge machinery —
grouped or global — with bit-identical states under any shuffle order.

Plan shapes:

* build: scan → [JVM xxhash64, codegen] → mapInArrow partial (one sorted
  run per partition) → partial-state shuffle/driver fold. Shuffled bytes
  = ``n_rows × fp_width`` (4 B for p ≤ 32), row-count-bounded like every
  other sketch partial.
* probe: broadcast state + map-side vectorized ``searchsorted`` — zero
  exchanges.
* delete: the delete feed is PRE-FILTERED map-side against the broadcast
  state (only fingerprints actually present survive — bounding what ever
  leaves the mappers by the filter's own content size), deduped to
  distinct p-bit fingerprints with a distributed ``distinct()``, then
  applied to the driver-held state in one vectorized multiset subtract.
  Raw delete keys never travel to the driver (the cuckoo-delete lesson,
  VERDICT r2 #1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from probabilistic_rs_spark.common import state_key
from probabilistic_rs_spark.operators.sketch_agg import (
    SketchSpec,
    build_global_state,
)
from probabilistic_rs_spark.sketches.quotient import QuotientFilter

# executor-side cache: deserialize a broadcast filter once per worker
_QF_CACHE: dict[str, QuotientFilter] = {}


def build_quotient_state(
    df: DataFrame,
    item_col: str,
    capacity: int,
    false_positive_rate: float = 0.01,
    tree_fanin: int | str | None = "auto",
) -> bytes:
    """Distributed build over a key column; returns merged state bytes.
    Note the filter is a MULTISET: duplicate rows insert duplicate
    fingerprints (use :func:`quotient_delete`'s remove-all semantics, or
    pre-distinct the input, when set semantics are wanted)."""
    spec = SketchSpec(
        "qf",
        "quotient",
        item_col,
        {"capacity": capacity, "false_positive_rate": false_positive_rate},
    )
    return build_global_state(df, spec, tree_fanin)


def _get_qf(key: str, blob: bytes) -> QuotientFilter:
    from probabilistic_rs_spark.common import lru_evict

    sk = _QF_CACHE.get(key)
    if sk is None:
        sk = QuotientFilter.from_bytes(blob)
        _QF_CACHE[key] = sk
        lru_evict(_QF_CACHE, 8)
    return sk


def quotient_probe(
    probe_df: DataFrame,
    item_col: str,
    state: bytes,
    out_col: str = "is_member",
) -> DataFrame:
    """Adds a boolean membership column: keys are hashed JVM-side
    (xxhash64 inside codegen); the kernel is one ``searchsorted`` gather
    per Arrow batch against the broadcast sorted run. Map-side, zero
    exchanges; zero false negatives, FPR ≤ n·2^-p."""
    sc = probe_df.sparkSession.sparkContext
    bc = sc.broadcast(state)
    key = state_key(state)

    @pandas_udf(BooleanType())
    def probe(hashes: pd.Series) -> pd.Series:
        sk = _get_qf(key, bc.value)
        h = hashes.to_numpy(dtype="int64").view(np.uint64)
        return pd.Series(sk.contains_hashes(h))

    return probe_df.withColumn(
        out_col, probe(F.xxhash64(F.col(item_col).cast("string")))
    )


# driver-side cache of the bucketized one-row relation per (session,
# state digest, bucket width) — same idiom as membership._WORDS_DF_CACHE
_BUCKETS_DF_CACHE: dict[tuple[str, str, int], DataFrame] = {}


def _quotient_buckets_df(spark, state: bytes, sk: QuotientFilter, bucket_bits: int):
    """One-row ``array<array<bigint>>`` relation: the filter's sorted
    fingerprint run split into 2^b buckets by the top b fingerprint bits.
    The run is already sorted, so the split is one bincount + cumsum."""
    app_id = spark.sparkContext.applicationId
    b = min(bucket_bits, sk.p)
    key = (app_id, state_key(state), b)
    df = _BUCKETS_DF_CACHE.get(key)
    if df is None:
        for old_key in [k for k in _BUCKETS_DF_CACHE if k[0] != app_id]:
            try:
                _BUCKETS_DF_CACHE.pop(old_key).unpersist()
            except Exception:
                pass
        fps = sk.fps
        buckets = (fps.astype(np.uint64) >> np.uint64(sk.p - b)).astype(np.int64)
        counts = np.bincount(buckets, minlength=1 << b)
        ends = np.cumsum(counts)
        starts = ends - counts
        # int64 BIT PATTERNS: for p = 64 the top fingerprints read as
        # negative longs on both sides — equality still matches because
        # the JVM probe expression produces the identical bit pattern
        vals = fps.astype(np.int64, copy=False) if fps.dtype == np.uint64 else fps.astype(np.int64)
        nested = [vals[s:e].tolist() for s, e in zip(starts.tolist(), ends.tolist())]
        df = spark.createDataFrame([(nested,)], "__qf_buckets array<array<bigint>>").cache()
        _BUCKETS_DF_CACHE[key] = df
        from probabilistic_rs_spark.common import lru_evict

        lru_evict(_BUCKETS_DF_CACHE, 8, lambda d: d.unpersist())
    return df, b


def _quotient_member_expr(item_col: str, barr, p: int, b: int):
    """JVM membership predicate: bucket lookup + ``array_contains`` scan
    of the ~n/2^b-element bucket — fp and bucket come from the same
    xxhash64 the build used, so zero false negatives hold."""
    fp = F.call_function(
        "shiftrightunsigned",
        F.xxhash64(F.col(item_col).cast("string")),
        F.lit(64 - p),
    )
    if p > b:
        bucket = F.call_function("shiftrightunsigned", fp, F.lit(p - b)).cast("int")
    else:
        bucket = fp.cast("int")
    return F.coalesce(
        F.array_contains(F.element_at(barr, bucket + F.lit(1)), fp), F.lit(False)
    )


def native_quotient_probe(
    probe_df: DataFrame,
    item_col: str,
    state: bytes,
    out_col: str = "is_member",
    bucket_bits: int = 14,
) -> DataFrame:
    """``quotient_probe`` with ZERO Python in the per-row path (VERDICT
    r3 #6 spike, shipped): the sorted run rides a broadcast one-row
    nested-array relation; each probe row computes its fingerprint with
    JVM ``xxhash64``, indexes its top-``bucket_bits`` bucket with
    ``element_at`` and scans the ~n/2^b remaining candidates with
    ``array_contains`` — whole-stage codegen end to end, the same shape
    as ``native_bloom_probe``. Identical verdicts to the ``searchsorted``
    kernel (both test p-bit fingerprint equality of the same hash).

    Trade-off vs the pandas kernel: the bucket scan is O(n/2^b) per row
    against searchsorted's O(log n), but it runs JVM-side with no Arrow
    boundary; measured faster at probe scale for filters up to ~10M
    fingerprints with the default 2^14 buckets (see BASELINE.md round-4
    notes). For larger runs raise ``bucket_bits``."""
    sk = QuotientFilter.from_bytes(state)
    bdf, b = _quotient_buckets_df(probe_df.sparkSession, state, sk, bucket_bits)
    joined = probe_df.crossJoin(F.broadcast(bdf))
    member = _quotient_member_expr(item_col, F.col("__qf_buckets"), sk.p, b)
    return joined.withColumn(out_col, member).drop("__qf_buckets")


def native_quotient_semi_filter(
    probe_df: DataFrame, item_col: str, state: bytes, bucket_bits: int = 14
) -> DataFrame:
    """Semi-join form: the membership predicate sits in the join
    condition (single evaluation), like ``native_bloom_semi_filter``."""
    sk = QuotientFilter.from_bytes(state)
    bdf, b = _quotient_buckets_df(probe_df.sparkSession, state, sk, bucket_bits)
    member = _quotient_member_expr(item_col, F.col("__qf_buckets"), sk.p, b)
    return (
        probe_df.crossJoin(F.broadcast(bdf)).where(member).drop("__qf_buckets")
    )


def quotient_delete(
    state: bytes,
    delete_df: DataFrame,
    item_col: str,
) -> tuple[bytes, int]:
    """Remove every occurrence of each delete key's fingerprint from the
    filter (set-style deletion: a key deleted is GONE even if the build
    saw it on many rows). Returns (new state bytes, fingerprints removed
    — occurrence count).

    Distributed shape: probe-prefilter map-side (broadcast state) so only
    fingerprints actually present leave the mappers — the collected
    distinct fingerprint set is therefore bounded by the filter's own
    content, which the driver already holds. Deleting a never-inserted
    key is a no-op except for the ≤FPR chance of a colliding fingerprint
    (the documented QF deletion hazard, same as cuckoo)."""
    sk = QuotientFilter.from_bytes(state)
    p = sk.p
    # map-side prefilter: only keys whose fingerprint is present survive
    hits = quotient_probe(delete_df, item_col, state).where(F.col("is_member"))
    # JVM-side fingerprint: top p bits of the same xxhash64
    fp_expr = F.call_function(
        "shiftrightunsigned",
        F.xxhash64(F.col(item_col).cast("string")),
        F.lit(64 - p),
    ).alias("__fp")
    fp_rows = hits.select(fp_expr).distinct().toPandas()
    if fp_rows.empty:
        return state, 0
    fps = np.sort(fp_rows["__fp"].to_numpy(dtype="int64").view(np.uint64)).astype(
        sk.fps.dtype, copy=False
    )
    removed = sk.remove_all(fps)
    return sk.to_bytes(), removed
