"""Event-time windowed Bloom — the Spark analog of the reference's
time-decaying (expiring) multi-level Bloom filter.

Reference semantics (``src/ebloom/filter.rs``, SURVEY.md §2.4): N
equal-size Bloom levels; inserts go to the *current* level; a query
returns true if all k bits are set **in any single level** (per-level
AND, cross-level OR — ``src/ebloom/filter.rs:602-638``); levels rotate on
a processing-time clock and expired data vanishes.

Spark restatement (SURVEY.md §2.10): one Bloom state per event-time
tumbling window of ``level_duration`` — ``groupBy(window(ts, D))``.
Rotation, level zeroing, and on-disk deletion all disappear into window
semantics; "expiry" = restricting probes to the ``num_levels`` most
recent windows. Event time is a deliberate improvement over the
reference's processing-time rotation (reference inserts carry no
timestamps, so late data is mis-filed into the current level —
``SURVEY.md §2.10`` documents the divergence).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from probabilistic_rs_spark.errors import SketchConfigError
from probabilistic_rs_spark.operators.sketch_agg import SketchSpec, sketch_aggregate
from probabilistic_rs_spark.sketches.bloom import BloomSketch


DEFAULT_MAX_LEVEL_BROADCAST_BYTES = 256 * 1024 * 1024


def _check_level_budget(
    level_bytes: int, num_levels: int, max_broadcast_bytes: int | None
) -> None:
    """Driver-side broadcast-budget guard for the level stack (VERDICT r4
    advice #3, mirroring the quotient/cuckoo ``max_state_bytes`` idiom
    and the reference's config-validation-at-construction pattern,
    ``src/bloom/config.rs:31-44``): every probe broadcasts all
    ``num_levels`` level states to every executor, so the product is
    validated BEFORE any build or probe job launches."""
    if max_broadcast_bytes is None:
        return
    total = level_bytes * num_levels
    if total > max_broadcast_bytes:
        raise SketchConfigError(
            f"windowed-Bloom level stack would broadcast {total} bytes "
            f"({num_levels} levels x {level_bytes} bytes/level) > "
            f"max_broadcast_bytes={max_broadcast_bytes}; lower "
            "capacity_per_level / raise target_fpr / reduce num_levels, "
            "or raise max_broadcast_bytes explicitly"
        )


def windowed_bloom_states(
    df: DataFrame,
    ts_col: str,
    item_col: str,
    level_duration: str = "1 hour",
    capacity_per_level: int = 1_000_000,
    target_fpr: float = 0.01,
    engine: str = "parity",
    num_levels_hint: int = 3,
    max_broadcast_bytes: int | None = DEFAULT_MAX_LEVEL_BROADCAST_BYTES,
) -> DataFrame:
    """One Bloom state per tumbling event-time window.

    Returns (window_start, window_end, bloom_state, n_updates). Config
    defaults mirror the reference (capacity_per_level 1M, fpr 0.01,
    level_duration 1h — ``src/ebloom/config.rs:16-29``).

    ``engine='parity'`` (default) builds reference-parity murmur/fnv
    levels (probed by :func:`probe_recent`); ``engine='native'`` builds
    the JVM-xxhash64 KM family (probed Python-free by
    :func:`native_probe_recent`). The two families carry distinct wire
    tags and never mix silently.

    ``num_levels_hint × level_bytes`` is validated against
    ``max_broadcast_bytes`` at construction (pass the ``num_levels`` you
    intend to probe with; the probes re-validate against the ACTUAL
    level count they are handed).
    """
    if engine not in ("parity", "native"):
        raise SketchConfigError(f"unknown windowed-bloom engine {engine!r}")
    # derived m bits from the (capacity, fpr) config — arithmetic only,
    # BEFORE SketchSpec validation/allocation, so an over-budget config is
    # rejected without first allocating it
    from probabilistic_rs_spark.functions.hashing import optimal_bit_vector_size

    m_bits = optimal_bit_vector_size(capacity_per_level, target_fpr)
    _check_level_budget(m_bits // 8, num_levels_hint, max_broadcast_bytes)
    spec = SketchSpec(
        "bloom",
        "bloom" if engine == "parity" else "nbloom",
        item_col,
        {"capacity": capacity_per_level, "false_positive_rate": target_fpr},
    )
    windowed = df.withColumn("__w", F.window(F.col(ts_col), level_duration)).withColumn(
        "window_start", F.col("__w.start")
    ).withColumn("window_end", F.col("__w.end"))
    states = sketch_aggregate(windowed, ["window_start", "window_end"], [spec])
    return states.select("window_start", "window_end", "bloom_state", "n_updates")


def recent_level_states(
    states_df: DataFrame,
    num_levels: int = 3,
    as_of=None,
) -> list[tuple]:
    """The ``num_levels`` most recent windows at/before ``as_of`` — the
    batch analog of the reference's active level set (levels beyond
    ``num_levels`` are 'expired', ``src/ebloom/filter.rs:249-266``).
    Collects only tiny (ts, state) rows to the driver."""
    if not (0 < num_levels <= 255):
        # reference cap: levels must fit one byte (src/ebloom/config.rs:53-57)
        raise SketchConfigError("num_levels must be in 1..=255")
    cur = states_df
    if as_of is not None:
        cur = cur.where(F.col("window_start") <= F.lit(as_of))
    rows = cur.orderBy(F.desc("window_start")).limit(num_levels).collect()
    return [(r["window_start"], r["window_end"], bytes(r["bloom_state"])) for r in rows]


def active_window_states(
    states_df: DataFrame, num_levels: int = 3, as_of=None
) -> DataFrame:
    """The active level set as a DataFrame: rows of the ``num_levels``
    most recent DISTINCT windows at/before ``as_of`` (``dense_rank``, so
    duplicate rows for one window — e.g. a per-microbatch append sink —
    never consume level slots). Callers aggregating over the result
    should hold one row per window (dedupe appended generations first).
    Uninitialized windows don't exist as rows here (the batch analog of
    ``created_at == 0`` levels being excluded,
    ``src/ebloom/filter.rs:249-266``)."""
    from pyspark.sql import Window as W

    if not (0 < num_levels <= 255):
        raise SketchConfigError("num_levels must be in 1..=255")
    cur = states_df
    if as_of is not None:
        cur = cur.where(F.col("window_start") <= F.lit(as_of))
    ranked = cur.withColumn(
        "__rk", F.dense_rank().over(W.orderBy(F.desc("window_start")))
    )
    return ranked.where(F.col("__rk") <= num_levels).drop("__rk")


def expiring_stats(
    states_df: DataFrame, num_levels: int = 3, as_of=None
) -> DataFrame:
    """Stats parity with the reference's expiring filter
    (``src/ebloom/filter.rs:747-768``): ``total_insert_count`` = sum of
    per-level insert counts over the ACTIVE levels only (uninitialized /
    expired windows excluded, exactly as the reference sums initialized
    level metadata), ``active_levels`` = number of live windows (≤
    num_levels), plus the total/expired window counts the reference's
    storage would hold. One-row DataFrame."""
    active = active_window_states(states_df, num_levels, as_of)
    act = active.agg(
        F.coalesce(F.sum("n_updates"), F.lit(0)).cast("long").alias("total_insert_count"),
        F.count(F.lit(1)).cast("int").alias("active_levels"),
    )
    total = states_df.agg(F.count(F.lit(1)).cast("int").alias("total_windows"))
    return act.crossJoin(total).select(
        "total_insert_count",
        "active_levels",
        "total_windows",
        (F.col("total_windows") - F.col("active_levels")).cast("int").alias("expired_windows"),
    )


def prune_expired_windows(
    states_df: DataFrame, num_levels: int = 3, as_of=None
) -> DataFrame:
    """Retention enforcement — the ``delete_level`` analog
    (``src/ebloom/storage.rs`` trait): drop every window-state row older
    than the ``num_levels`` most recent. Probes over the active set are
    unchanged by construction (they never look past ``num_levels``); this
    bounds the persisted states table instead of letting dead windows
    accumulate forever."""
    return active_window_states(states_df, num_levels, as_of)


def prune_states_table(spark, path: str, num_levels: int = 3, as_of=None) -> int:
    """Rewrite a persisted window-states Parquet table (LOCAL filesystem
    path) keeping only the active windows. Returns the retained row count.

    Crash-safety contract: the swap is two renames, so a crash between
    them leaves the data intact at ``<path>__old`` (recover by renaming
    it back); the new data is always fully written and fsync-visible at
    ``<path>__pruning`` before the first rename. This helper is
    local-FS-only — for object stores, write the pruned set to a new
    versioned directory and flip a pointer instead."""
    import os
    import shutil

    if "://" in path:
        raise SketchConfigError(
            "prune_states_table operates on local paths only; for remote "
            "stores write a new versioned directory and flip a pointer"
        )
    states = spark.read.parquet(path)
    kept = prune_expired_windows(states, num_levels, as_of)
    tmp = path.rstrip("/") + "__pruning"
    kept.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    old = path.rstrip("/") + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n


# executor-side cache of deserialized level lists, keyed by a driver-side
# content digest — one deserialize per worker lifetime, not one per Arrow
# batch (the same cache idiom as membership._FILTER_CACHE /
# heavy_hitters._CMS_CACHE / cuckoo._SHARDS_CACHE; VERDICT r2 item 4)
_LEVELS_CACHE: dict[str, list[BloomSketch]] = {}


def probe_recent(
    probe_df: DataFrame,
    item_col: str,
    level_states: list[tuple],
    out_col: str = "is_member",
    max_broadcast_bytes: int | None = DEFAULT_MAX_LEVEL_BROADCAST_BYTES,
) -> DataFrame:
    """Membership over the active level set: per-level AND, cross-level OR
    — exactly the reference's ``contains`` (``src/ebloom/filter.rs:602-638``),
    vectorized over a whole Arrow batch and all levels."""
    import hashlib

    sc = probe_df.sparkSession.sparkContext
    blobs = [blob for _, _, blob in level_states]
    if max_broadcast_bytes is not None:
        _check_level_budget(sum(len(b) for b in blobs), 1, max_broadcast_bytes)
    bc = sc.broadcast(blobs)
    h = hashlib.sha1()
    for b in blobs:
        h.update(len(b).to_bytes(8, "little"))
        h.update(b)  # full-blob digest: rotated levels can share head/tail
    key = h.hexdigest()

    @pandas_udf(BooleanType())
    def probe(items: pd.Series) -> pd.Series:
        import pyarrow as pa

        from probabilistic_rs_spark.functions.hashing import pad_batch_arrow

        from probabilistic_rs_spark.common import lru_evict

        levels = _LEVELS_CACHE.get(key)
        if levels is None:
            levels = [BloomSketch.from_bytes(b) for b in bc.value]
            _LEVELS_CACHE[key] = levels
            lru_evict(_LEVELS_CACHE, 8)
        buf, lens = pad_batch_arrow(
            pa.Array.from_pandas(items, type=pa.string()), scratch_key="wb_probe"
        )
        res = np.zeros(len(lens), dtype=bool)
        for lv in levels:
            res |= lv.contains_padded(buf, lens)
        return pd.Series(res)

    return probe_df.withColumn(out_col, probe(F.col(item_col).cast("string")))


# driver-side cache of the stacked level-words relation, keyed by
# (applicationId, combined full-blob digest) — membership._WORDS_DF_CACHE
# idiom
_LEVEL_WORDS_DF_CACHE: dict[tuple[str, str], DataFrame] = {}


def native_probe_recent(
    probe_df: DataFrame,
    item_col: str,
    level_states: list[tuple],
    out_col: str = "is_member",
    max_broadcast_bytes: int | None = DEFAULT_MAX_LEVEL_BROADCAST_BYTES,
) -> DataFrame:
    """:func:`probe_recent` for levels built with ``engine='native'``,
    with ZERO Python in the per-row path: every active level's bit words
    ride ONE broadcast ``array<array<bigint>>`` row, and the probe
    evaluates per-level AND over the k KM bit tests, OR across levels —
    the reference's expiring ``contains`` semantics
    (``src/ebloom/filter.rs:602-638``) entirely inside whole-stage
    codegen. All levels must share one (m, k) config (they do by
    construction — one spec builds every window)."""
    import hashlib

    from probabilistic_rs_spark.common import state_key
    from probabilistic_rs_spark.operators.membership import _native_member_expr
    from probabilistic_rs_spark.sketches.native_bloom import NativeBloomSketch

    if not level_states:
        return probe_df.withColumn(out_col, F.lit(False))
    sketches = [NativeBloomSketch.from_bytes(blob) for _, _, blob in level_states]
    if max_broadcast_bytes is not None:
        # the broadcast payload is the DENSE stacked words (m/8 bytes per
        # level) regardless of how sparsely a blob serialized — budget on
        # the dense size
        _check_level_budget(sketches[0].m // 8, len(sketches), max_broadcast_bytes)
    mk = {(sk.m, sk.k) for sk in sketches}
    if len(mk) != 1:
        raise SketchConfigError(
            f"native_probe_recent needs one shared (m, k) across levels, got {mk}"
        )
    m, k = mk.pop()
    spark = probe_df.sparkSession
    app_id = spark.sparkContext.applicationId
    h = hashlib.sha1()
    for _, _, blob in level_states:
        h.update(len(blob).to_bytes(8, "little"))
        h.update(blob)
    key = (app_id, h.hexdigest())
    ldf = _LEVEL_WORDS_DF_CACHE.get(key)
    if ldf is None:
        for old_key in [kk for kk in _LEVEL_WORDS_DF_CACHE if kk[0] != app_id]:
            try:
                _LEVEL_WORDS_DF_CACHE.pop(old_key).unpersist()
            except Exception:
                pass
        ldf = spark.createDataFrame(
            [([sk.words().tolist() for sk in sketches],)],
            "__wbl_words array<array<bigint>>",
        ).cache()
        _LEVEL_WORDS_DF_CACHE[key] = ldf
        from probabilistic_rs_spark.common import lru_evict

        lru_evict(_LEVEL_WORDS_DF_CACHE, 8, lambda d: d.unpersist())
    member = None
    for lv in range(len(sketches)):
        warr = F.element_at(F.col("__wbl_words"), F.lit(lv + 1))
        term = _native_member_expr(item_col, warr, m, k)
        member = term if member is None else (member | term)
    return (
        probe_df.crossJoin(F.broadcast(ldf))
        .withColumn(out_col, member)
        .drop("__wbl_words")
    )
