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

from probabilistic_rs_spark.common import (
    check_shard_modulus as _check_shard_modulus,
    op_masks as _op_masks,
    shard_cogroup_cols as _shard_cogroup_cols,
    state_key,
)
from probabilistic_rs_spark.errors import SketchConfigError
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
    from probabilistic_rs_spark.operators.sketch_agg import pushdown_barrier

    # pushdown_barrier (round 8): keep a downstream .where(is_member)
    # from inlining the fingerprint derivation + bucket scan into the
    # join condition (evaluated without codegen subexpression
    # elimination — the xxhash64 chain re-evaluates per reference)
    member = pushdown_barrier(
        _quotient_member_expr(item_col, F.col("__qf_buckets"), sk.p, b),
        boolean=True,
    )
    return joined.withColumn(out_col, member).drop("__qf_buckets")


def native_quotient_semi_filter(
    probe_df: DataFrame, item_col: str, state: bytes, bucket_bits: int = 14
) -> DataFrame:
    """Semi-join form, like ``native_bloom_semi_filter``: the predicate
    is evaluated once in a barriered ProjectExec (round 8 — in the join
    condition it would be evaluated without codegen CSE) and the filter
    reads the materialized bit."""
    from probabilistic_rs_spark.operators.sketch_agg import pushdown_barrier

    sk = QuotientFilter.from_bytes(state)
    bdf, b = _quotient_buckets_df(probe_df.sparkSession, state, sk, bucket_bits)
    member = pushdown_barrier(
        _quotient_member_expr(item_col, F.col("__qf_buckets"), sk.p, b),
        boolean=True,
    )
    return (
        probe_df.crossJoin(F.broadcast(bdf))
        .withColumn("__nqf_member", member)
        .where(F.col("__nqf_member"))
        .drop("__qf_buckets", "__nqf_member")
    )


# ---------------------------------------------------------------------------
# Partitioned (non-broadcast) family — round 5, the cuckoo-partitioned
# idiom applied to the second O(n)-state structure. The quotient shard
# function is special: shard id = the TOP shard_bits OF THE HASH, which
# are also the top bits of the fingerprint — so each shard holds a
# CONTIGUOUS range of the global sorted run, and folding the shard
# states back together reproduces the global state BIT-IDENTICALLY
# (disjoint sorted-run union; asserted in tests). The broadcast and
# partitioned families are therefore two physical layouts of one
# logical filter, not two filters.
# ---------------------------------------------------------------------------

from pyspark.sql.types import (  # noqa: E402
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_QSHARD_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("state", BinaryType(), False),
        StructField("n_items", LongType(), False),
    ]
)


def _qhashed(df: DataFrame, item_col: str, shard_bits: int) -> DataFrame:
    """(__h, __shard): shard id = top ``shard_bits`` of the hash — the
    fingerprint's own prefix (fp = top p bits of h, so
    ``fp >> (p - s) == h >> (64 - s)``), computable without knowing p."""
    h = F.xxhash64(F.col(item_col).cast("string"))
    shard = F.call_function("shiftrightunsigned", h, F.lit(64 - shard_bits)).cast("int")
    return df.select(h.alias("__h"), shard.alias("__shard"))


def build_quotient_shards_df(
    df: DataFrame,
    item_col: str,
    capacity: int,
    false_positive_rate: float = 0.01,
    shard_bits: int = 5,
) -> DataFrame:
    """The NON-BROADCAST quotient build: one filter per fingerprint-prefix
    shard, returned as a distributed ``(shard, state, n_items, n_shards)``
    table — no driver collect, so no ``max_state_bytes`` budget applies
    (no single process ever holds more than one shard's run). Every shard
    uses the GLOBAL ``(capacity, fpr)`` config, so (q, r) — and hence
    fingerprints — are identical across shards and to the broadcast
    family; merging all shard states reproduces ``build_quotient_state``'s
    bytes exactly. Probe with :func:`quotient_partitioned_probe`, delete
    with :func:`quotient_delete_df`; persist or write the result before
    reusing it (it is a lazy plan).

    Pick ``shard_bits`` so one shard's run (~``fp_bytes · n /
    2^shard_bits``) fits executor memory; shards also parallelize the
    sort/consolidate work."""
    if not (1 <= int(shard_bits) <= 20):
        raise SketchConfigError("shard_bits must be in 1..=20")
    s = int(shard_bits)
    cap, fpr = int(capacity), float(false_positive_rate)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        # the budget is a broadcast guard; a shard's state is a slice
        sk = QuotientFilter(cap, fpr, max_state_bytes=None)
        sk.update_hashes(pdf["__h"].to_numpy(dtype="int64").view(np.uint64))
        return pd.DataFrame(
            {"shard": [shard], "state": [sk.to_bytes()], "n_items": [sk.n_items]}
        )

    out = (
        _qhashed(df, item_col, s)
        .groupBy("__shard")
        .applyInPandas(build, _QSHARD_SCHEMA)
    )
    return out.withColumn("n_shards", F.lit(1 << s))


def _qstates_shard_bits(states_df: DataFrame, n_shards: int | None) -> int:
    """Prefix width for a quotient shard table. When the caller omits
    ``n_shards`` the self-describing column is read (one tiny agg); an
    explicitly passed value short-circuits WITHOUT a scan (probe/delete
    inputs are often unpersisted build plans an eager verification agg
    would re-execute) and is instead verified INSIDE the cogrouped
    kernel against each shard row's ``n_shards`` value
    (``common.check_shard_modulus``) — zero extra jobs, still a loud
    failure instead of silent misrouting."""
    if n_shards is None:
        if "n_shards" not in states_df.columns:
            raise SketchConfigError(
                "states_df carries no n_shards column — pass n_shards explicitly"
            )
        row = states_df.select(
            F.max("n_shards").alias("hi"), F.min("n_shards").alias("lo")
        ).head()
        if row is None or row["hi"] is None:
            raise SketchConfigError("empty states_df: build produced no shards")
        if int(row["hi"]) != int(row["lo"]):
            raise SketchConfigError(
                f"states_df mixes shard moduli ({row['lo']} vs {row['hi']})"
            )
        n_shards = int(row["hi"])
    s = int(n_shards).bit_length() - 1
    if (1 << s) != int(n_shards):
        raise SketchConfigError(f"quotient n_shards must be a power of two, got {n_shards}")
    return s


def quotient_partitioned_probe(
    probe_df: DataFrame,
    item_col: str,
    states_df: DataFrame,
    n_shards: int | None = None,
    out_col: str = "is_member",
) -> DataFrame:
    """Membership probe against the DISTRIBUTED shard table: probe rows
    shuffle by their fingerprint prefix and are cogrouped with their
    shard's single state row — one ``searchsorted`` per (shard, slice),
    per-task memory = one shard run + one probe slice however large the
    filter. Verdict-identical to :func:`quotient_probe` on the merged
    state (same hash, same fingerprints, same kernel). Keys routed to a
    shard with no state row (no keys at build) are not members.

    Probe rows ride the cogroup inline — one full-width exchange — for
    the same reason :func:`~probabilistic_rs_spark.operators.cuckoo.
    cuckoo_partitioned_probe` does (see its docstring): one shard holds
    an item's entire verdict, so no regroup/rejoin stage exists to
    optimize, unlike the windowed-Bloom/CMS block probes."""
    s = _qstates_shard_bits(states_df, n_shards)
    probe_cols = list(probe_df.columns)
    if out_col in probe_cols:
        raise SketchConfigError(f"probe_df already has a column {out_col!r}")
    probed = probe_df.withColumn(
        "__h", F.xxhash64(F.col(item_col).cast("string"))
    ).withColumn(
        "__shard",
        F.call_function("shiftrightunsigned", F.col("__h"), F.lit(64 - s)).cast("int"),
    )
    out_schema = StructType(
        list(probed.schema.fields)[: len(probe_cols)]
        + [StructField(out_col, BooleanType(), False)]
    )

    def probe_fn(state_pdf: pd.DataFrame, probe_pdf: pd.DataFrame) -> pd.DataFrame:
        _check_shard_modulus(state_pdf, 1 << s)
        if probe_pdf.empty:
            return probe_pdf.reindex(columns=[f.name for f in out_schema.fields])
        out = probe_pdf.drop(columns=["__h", "__shard"])
        if state_pdf.empty:
            out[out_col] = False
            return out
        sk = QuotientFilter.from_bytes(bytes(state_pdf["state"].iloc[0]))
        h = probe_pdf["__h"].to_numpy(dtype="int64").view(np.uint64)
        out[out_col] = sk.contains_hashes(h)
        return out

    return (
        states_df.select(*_shard_cogroup_cols(states_df))
        .groupby("shard")
        .cogroup(probed.groupby("__shard"))
        .applyInPandas(probe_fn, out_schema)
    )


def quotient_delete_df(
    states_df: DataFrame,
    delete_df: DataFrame,
    item_col: str,
    n_shards: int | None = None,
) -> DataFrame:
    """Set-style deletion against the DISTRIBUTED shard table (the
    partitioned analog of :func:`quotient_delete`): delete keys shuffle
    to their fingerprint-prefix shard (8 bytes/key) and every occurrence
    of each present fingerprint is removed shard-locally — state bytes
    never visit the driver. Returns ``(shard, state, n_removed,
    n_shards)``; aggregate ``n_removed`` for the occurrence count.
    Deleting a never-inserted key is a no-op except for the ≤FPR
    fingerprint-collision hazard shared by every deletable filter."""
    s = _qstates_shard_bits(states_df, n_shards)
    deletes = _qhashed(delete_df, item_col, s)
    out_schema = StructType(
        [
            StructField("shard", IntegerType(), False),
            StructField("state", BinaryType(), False),
            StructField("n_removed", LongType(), False),
        ]
    )

    def apply_deletes(state_pdf: pd.DataFrame, del_pdf: pd.DataFrame) -> pd.DataFrame:
        _check_shard_modulus(state_pdf, 1 << s)
        if state_pdf.empty:
            return pd.DataFrame(
                {
                    "shard": pd.Series([], dtype="int32"),
                    "state": pd.Series([], dtype=object),
                    "n_removed": pd.Series([], dtype="int64"),
                }
            )
        shard = int(state_pdf["shard"].iloc[0])
        sk = QuotientFilter.from_bytes(bytes(state_pdf["state"].iloc[0]))
        removed = 0
        if not del_pdf.empty:
            h = np.unique(del_pdf["__h"].to_numpy(dtype="int64").view(np.uint64))
            fps = np.unique(sk._fingerprints(h))
            removed = sk.remove_all(fps)
        return pd.DataFrame(
            {"shard": [shard], "state": [sk.to_bytes()], "n_removed": [removed]}
        )

    out = (
        states_df.select(*_shard_cogroup_cols(states_df))
        .groupby("shard")
        .cogroup(deletes.groupby("__shard"))
        .applyInPandas(apply_deletes, out_schema)
    )
    return out.withColumn("n_shards", F.lit(1 << s))


def quotient_apply_ops_df(
    states_df: DataFrame | None,
    ops_df: DataFrame,
    item_col: str,
    op_col: str = "op",
    capacity: int = 1_000_000,
    false_positive_rate: float = 0.01,
    shard_bits: int | None = None,
) -> DataFrame:
    """Fold one generation of an insert/delete ops log into the
    distributed quotient shard table — ``cuckoo_apply_ops_df``'s sibling
    for the prefix-sharded family. Ops shuffle to their fingerprint-
    prefix shard; per shard, distinct inserts apply first, then set-style
    remove-all deletes (a key both inserted and deleted in one
    generation nets to absent). Inserts are idempotent ACROSS generations
    as well — hashes whose fingerprint the shard already holds are
    dropped, so re-inserts never grow the sorted run (matching the cuckoo
    fold's semantics). Shards are created on first insert, so
    the fold starts from ``states_df=None``; every shard uses the global
    ``(capacity, fpr)`` so the bit-identical-fold property of
    :func:`build_quotient_shards_df` is preserved across generations.
    Returns the same ``(shard, state, n_items, n_shards)`` shape —
    materialize each generation before feeding it to the next.

    ``shard_bits``: read from the states' self-describing ``n_shards``
    column when ``states_df`` is given (an explicitly-passed conflicting
    value raises — a mismatched prefix width would silently misroute
    ops); only consulted as a geometry choice when starting from
    ``states_df=None`` (default 5). Op tags other than exactly
    ``'insert'``/``'delete'`` raise ``SketchConfigError``."""
    if states_df is not None:
        s = _qstates_shard_bits(states_df, None)
        if shard_bits is not None and int(shard_bits) != s:
            raise SketchConfigError(
                f"shard_bits={int(shard_bits)} conflicts with the states_df "
                f"n_shards column (2^{s} shards) — omit the parameter (the "
                "states are self-describing) or pass the matching value"
            )
    else:
        s = 5 if shard_bits is None else int(shard_bits)
        if not (1 <= s <= 20):
            raise SketchConfigError("shard_bits must be in 1..=20")
    cap, fpr = int(capacity), float(false_positive_rate)
    spark = ops_df.sparkSession
    if states_df is None:
        states_df = spark.createDataFrame([], _QSHARD_SCHEMA)
    h = F.xxhash64(F.col(item_col).cast("string"))
    ops = ops_df.select(
        h.alias("__h"),
        F.call_function("shiftrightunsigned", h, F.lit(64 - s)).cast("int").alias("__shard"),
        F.col(op_col).alias("__op"),
    )

    def apply_ops(state_pdf: pd.DataFrame, ops_pdf: pd.DataFrame) -> pd.DataFrame:
        _check_shard_modulus(state_pdf, 1 << s)
        if state_pdf.empty and ops_pdf.empty:
            return pd.DataFrame(
                {
                    "shard": pd.Series([], dtype="int32"),
                    "state": pd.Series([], dtype=object),
                    "n_items": pd.Series([], dtype="int64"),
                }
            )
        if state_pdf.empty:
            shard = int(ops_pdf["__shard"].iloc[0])
            sk = QuotientFilter(cap, fpr, max_state_bytes=None)
        else:
            shard = int(state_pdf["shard"].iloc[0])
            sk = QuotientFilter.from_bytes(bytes(state_pdf["state"].iloc[0]))
        if not ops_pdf.empty:
            hs = ops_pdf["__h"].to_numpy(dtype="int64").view(np.uint64)
            is_ins, is_del = _op_masks(ops_pdf["__op"])
            ins = np.unique(hs[is_ins])
            if len(ins):
                # cross-generation idempotency (matches the cuckoo fold):
                # re-inserted keys don't grow the sorted run
                ins = ins[~sk.contains_hashes(ins)]
            dels = np.unique(hs[is_del])
            if len(ins):
                sk.update_hashes(ins)
            if len(dels):
                sk.remove_all(np.unique(sk._fingerprints(dels)))
        return pd.DataFrame(
            {"shard": [shard], "state": [sk.to_bytes()], "n_items": [int(sk.n_items)]}
        )

    out = (
        states_df.select(*_shard_cogroup_cols(states_df))
        .groupby("shard")
        .cogroup(ops.groupby("__shard"))
        .applyInPandas(apply_ops, _QSHARD_SCHEMA)
    )
    return out.withColumn("n_shards", F.lit(1 << s))


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
