"""Frequency-moment operators over the count sketch (sketches/countsketch.py).

The missing planner inputs at 100 TB: before committing a shuffle join on
a possibly-skewed key you want (a) UNBIASED per-key frequency estimates
(CMS only overestimates — adversarially so under the exact Zipf skew that
makes the question matter) and (b) the SELF-JOIN SIZE ``F2 = Σ count(x)²``
— the expected output rows of the key's self-equi-join and the standard
skew statistic (F2/N ≫ average count ⇒ salt or broadcast). Both come out
of ONE count-sketch state built in one scan through the generic
partial/merge pipeline (``operators/sketch_agg.py``): the shuffle carries
state-sized partials, never rows, and the probe paths mirror the CMS
family exactly — a broadcast pandas kernel and a zero-Python whole-stage
codegen probe with identical estimates by construction.

Published guarantees (Charikar–Chen–Farach-Colton 2002; Alon–Matias–
Szegedy 1996): ``|est − true| ≤ ε·√F2`` and ``|F2_est − F2| ≤ ε'·F2``
each w.p. ≥ 1−δ at ``w = O(1/ε²)``, ``d = O(log 1/δ)`` — gated in
``tests/test_countsketch.py`` and generatively (bit-equality merge
family) in ``tests/test_properties.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

from probabilistic_rs_spark.sketches.countsketch import CountSketch

# driver-side broadcast reuse + executor-side deserialized-state cache —
# same pattern as heavy_hitters._PROBE_BROADCASTS/_CMS_CACHE
_PROBE_BROADCASTS: dict[tuple, object] = {}
_CS_CACHE: dict[str, CountSketch] = {}
_CS_TABLE_DF_CACHE: dict[tuple[str, str], DataFrame] = {}


def build_cs_state(
    df: DataFrame,
    key_col: str,
    eps: float = 0.02,
    delta: float = 0.001,
    tree_fanin: int | str | None = "auto",
) -> bytes:
    """Distributed count-sketch build over a key column; returns the merged
    state bytes on the driver (the thing callers broadcast / probe).

    Plan: scan → JVM KM base-hash pair (whole-stage codegen) → mapInArrow
    bucket/sign scatter (one partial row per partition) → single state
    shuffle → matrix-add fold. Shuffled volume = partials × state bytes,
    independent of row count."""
    from probabilistic_rs_spark.operators.sketch_agg import SketchSpec, build_global_state

    spec = SketchSpec("cs", "cs", key_col, {"eps": eps, "delta": delta})
    return build_global_state(df, spec, tree_fanin=tree_fanin)


def _cs_broadcast(sc, state: bytes):
    import hashlib

    key = hashlib.sha1(state).hexdigest()
    memo_key = (sc.applicationId, key)
    bc = _PROBE_BROADCASTS.get(memo_key)
    if bc is None:
        from probabilistic_rs_spark.common import lru_evict

        bc = sc.broadcast(state)
        _PROBE_BROADCASTS[memo_key] = (key, bc)
        lru_evict(_PROBE_BROADCASTS, 16)
        return key, bc
    return bc


def cs_probe(
    probe_df: DataFrame,
    key_col: str,
    state: bytes,
    out_col: str = "est_count",
) -> DataFrame:
    """Adds a bigint UNBIASED point-estimate column (median over the d
    signed cell reads; ``|est − true| ≤ ε·√F2`` w.p. ≥ 1−δ). Broadcast
    state, whole-Arrow-batch kernel, zero exchanges in the probe plan.
    The probe derives buckets and signs from the SAME JVM KM base-hash
    pair the build projected (``native_bloom_base_hash_exprs``), so probe
    and build agree byte-for-byte."""
    from pyspark.sql.functions import pandas_udf

    from probabilistic_rs_spark.operators.sketch_agg import native_bloom_base_hash_exprs

    sc = probe_df.sparkSession.sparkContext
    key, bc = _cs_broadcast(sc, state)

    @pandas_udf(LongType())
    def est(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        from probabilistic_rs_spark.common import lru_evict

        cs = _CS_CACHE.get(key)
        if cs is None:
            cs = CountSketch.from_bytes(bc.value)
            _CS_CACHE[key] = cs
            lru_evict(_CS_CACHE, 8)
        base = np.stack(
            [h1s.to_numpy(dtype="int64"), h2s.to_numpy(dtype="int64")], axis=1
        )
        return pd.Series(cs.estimate_base_hashes(base))

    h1, h2 = native_bloom_base_hash_exprs(F.col(key_col))
    return probe_df.withColumn(out_col, est(h1, h2))


def _cs_table_df(spark, state: bytes, cs: CountSketch) -> DataFrame:
    from probabilistic_rs_spark.common import lru_evict, state_key

    app_id = spark.sparkContext.applicationId
    key = (app_id, state_key(state))
    df = _CS_TABLE_DF_CACHE.get(key)
    if df is None:
        for old_key in [k for k in _CS_TABLE_DF_CACHE if k[0] != app_id]:
            try:
                _CS_TABLE_DF_CACHE.pop(old_key).unpersist()
            except Exception:
                pass
        df = spark.createDataFrame(
            [(cs.table.tolist(),)], "__cs_rows array<array<bigint>>"
        ).cache()
        _CS_TABLE_DF_CACHE[key] = df
        lru_evict(_CS_TABLE_DF_CACHE, 8, lambda d: d.unpersist())
    return df


def native_cs_probe(
    probe_df: DataFrame,
    key_col: str,
    state: bytes,
    out_col: str = "est_count",
) -> DataFrame:
    """``cs_probe`` with ZERO Python in the per-row path — the signed
    member of the native-probe family (native Bloom / quotient / cuckoo /
    CMS probes).

    Every kernel step is an exact JVM long expression (derivation in
    ``sketches/countsketch.py``: bucket chain ``(h1 + j·h2) & (w−1)`` with
    ``j·h2 < 31·2^56``, sign chain ``(h2 + j·(h1≫7)) ≫ 20 & 1`` below
    2^61 — ANSI arithmetic cannot overflow and signed math equals the
    kernel's uint64 math). The d×w matrix rides a broadcast one-row
    ``array<array<bigint>>`` relation; the estimate is the MEDIAN of the d
    signed lookups — d is odd, so ``element_at(array_sort(reads),
    (d+1)/2)`` is exact — evaluated inside whole-stage codegen. Identical
    estimates to :func:`cs_probe` by construction."""
    from probabilistic_rs_spark.operators.sketch_agg import native_bloom_base_hash_exprs

    cs = CountSketch.from_bytes(state)
    tdf = _cs_table_df(probe_df.sparkSession, state, cs)
    h1, h2 = native_bloom_base_hash_exprs(F.col(key_col))
    mask = F.lit(int(cs.w - 1))
    reads = []
    for j in range(cs.d):
        bucket = (h1 + F.lit(int(j)) * h2).bitwiseAND(mask)
        sign_bit = (
            F.call_function(
                "shiftrightunsigned",
                h2 + F.lit(int(j)) * F.call_function("shiftrightunsigned", h1, F.lit(7)),
                F.lit(20),
            )
        ).bitwiseAND(F.lit(1))
        sign = F.lit(1) - F.lit(2) * sign_bit
        row = F.element_at(F.col("__cs_rows"), F.lit(int(j) + 1))
        reads.append(sign * F.element_at(row, bucket.cast("int") + F.lit(1)))
    if cs.d == 1:
        est = reads[0]
    else:
        est = F.element_at(F.array_sort(F.array(*reads)), F.lit((cs.d + 1) // 2))
    return (
        probe_df.crossJoin(F.broadcast(tdf))
        .withColumn(out_col, est)
        .drop("__cs_rows")
    )


def f2_from_state(state: bytes) -> float:
    """AMS second-moment / self-join-size estimate from a built state
    (driver-side, O(d·w)): ``F2 = Σ_x count(x)²`` within ``ε'·F2``
    w.p. ≥ 1−δ. The skew statistic: F2/N is the hot-key-weighted mean
    frequency — compare against N/distinct before picking a join plan."""
    return CountSketch.from_bytes(state).f2_estimate()


def self_join_size(
    df: DataFrame,
    key_col: str,
    eps: float = 0.02,
    delta: float = 0.001,
    tree_fanin: int | str | None = "auto",
) -> float:
    """One-scan self-join-size estimate of ``df ⋈ df`` on ``key_col``:
    build + F2 read. The exact answer is ``SELECT SUM(c*c) FROM (GROUP BY
    key)`` — a full shuffle of every distinct key; this is a state-sized
    shuffle instead."""
    return f2_from_state(build_cs_state(df, key_col, eps=eps, delta=delta, tree_fanin=tree_fanin))
