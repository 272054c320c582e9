"""Structured Streaming expiring Bloom / windowed sketch states.

The streaming analog of the reference's time-decaying multi-level Bloom
filter (``src/ebloom/filter.rs``, SURVEY.md §2.4/§2.10): one sketch state
per event-time tumbling window, maintained incrementally across
micro-batches with ``applyInPandasWithState``.

Mapping of the reference's moving parts onto streaming primitives:

* level rotation (``rotate_levels``, ``src/ebloom/filter.rs:270-330``)
  → nothing: a new event-time window simply gets fresh state.
* level zeroing + on-disk delete of the recycled level → event-time
  timeout: when the watermark passes ``window_end + grace``, the state is
  emitted one final time (``expired=true``) and dropped by Spark.
* lazy ``cleanup_expired_levels`` (``:333-341``) → the watermark clock,
  advanced per micro-batch.
* processing-time semantics → **event time** (deliberate improvement:
  the reference mis-files late items into the current level because
  inserts carry no timestamps; here each row lands in its own window,
  and rows later than the watermark are dropped — SURVEY.md §2.10).

The per-group state is the sketch's serialized bytes — the same
versioned format the batch path and checkpoints use, so a state row can
be probed with ``operators.windowed_bloom.probe_recent`` directly.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from probabilistic_rs_spark.operators.sketch_agg import SketchSpec

_OUT_SCHEMA = StructType(
    [
        StructField("window_start", TimestampType(), False),
        StructField("window_end", TimestampType(), False),
        StructField("state", BinaryType(), True),
        StructField("n_updates", LongType(), False),
        StructField("expired", BooleanType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("blob", BinaryType(), True), StructField("n", LongType(), True)]
)


def streaming_windowed_sketch(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    spec: SketchSpec,
    level_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Maintain one sketch state per event-time tumbling window of a
    STREAMING DataFrame. Emits ``(window_start, window_end, state,
    n_updates, expired)`` rows in update mode: a row per window per
    micro-batch that touched it, plus a final ``expired=true`` row when
    the watermark passes the window (state is then dropped — the
    reference's level expiry).

    The value column must already be what the sketch kind consumes
    (bloom: string/binary item; hll/cms/theta: a 64-bit hash — compute
    with ``F.xxhash64`` upstream; tdigest/kll: double).

    With ``spec.kind == 'theta'`` the emitted per-window states compose
    with :mod:`probabilistic_rs_spark.operators.set_ops`: week-over-week
    retention is ``theta_a_not_b(this_week, last_week)`` on two emitted
    states — no rescan, no second pipeline.
    """
    make = spec.make
    kind = spec.kind
    cls = type(spec.make())

    def update_fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        ws, we = key
        if state.hasTimedOut:
            blob, n = state.get if state.exists else (None, 0)
            state.remove()
            yield pd.DataFrame(
                [{"window_start": ws, "window_end": we, "state": blob,
                  "n_updates": int(n or 0), "expired": True}]
            )
            return
        sk = cls.from_bytes(bytes(state.get[0])) if state.exists else make()
        n = int(state.get[1]) if state.exists else 0
        for pdf in pdfs:
            vals = pdf["__v"]
            n += len(vals)
            if kind in ("hll", "cms", "theta"):
                import numpy as np

                sk.update_hashes(vals.to_numpy(dtype="int64").view("uint64"))
            elif kind in ("nbloom", "cs"):
                # (h1, h2) KM base hashes computed JVM-side in the
                # streaming projection — the stateful kernel is a bare
                # position/sign-derive + scatter, mirroring the batch build
                import numpy as np

                sk.update_base_hashes(np.array(vals.tolist(), dtype=np.int64))
            elif kind in ("tdigest", "kll"):
                sk.update_values(vals.to_numpy(dtype="float64"))
            else:  # bloom: utf-8/binary items
                import pyarrow as pa

                from probabilistic_rs_spark.functions.hashing import pad_batch_arrow

                buf, lens = pad_batch_arrow(
                    pa.Array.from_pandas(vals, type=pa.string()),
                    scratch_key="stream_bloom",
                )
                sk.update_padded(buf, lens)
        blob = sk.to_bytes()
        state.update((blob, n))
        # expire once the event-time watermark passes the window end
        state.setTimeoutTimestamp(int(we.timestamp() * 1000))
        yield pd.DataFrame(
            [{"window_start": ws, "window_end": we, "state": blob,
              "n_updates": n, "expired": False}]
        )

    prepared = (
        df.withColumn("__ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("__ts", watermark_delay)
        .withColumn("__w", F.window(F.col("__ts"), level_duration))
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            _value_expr(spec, value_col),
            "__ts",  # keep the watermarked column visible to the stateful op
        )
    )
    return prepared.groupBy("window_start", "window_end").applyInPandasWithState(
        update_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _value_expr(spec: SketchSpec, value_col: str):
    c = F.col(value_col)
    if spec.kind in ("hll", "cms", "theta"):
        return F.xxhash64(c.cast("string")).alias("__v")
    if spec.kind in ("nbloom", "cs"):
        from probabilistic_rs_spark.operators.sketch_agg import (
            native_bloom_base_hash_exprs,
        )

        h1, h2 = native_bloom_base_hash_exprs(c)
        return F.array(h1, h2).alias("__v")
    if spec.kind in ("tdigest", "kll"):
        return c.cast("double").alias("__v")
    return c.cast("string").alias("__v")


def streaming_windowed_bloom(
    df: DataFrame,
    ts_col: str,
    item_col: str,
    level_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    capacity_per_level: int = 1_000_000,
    target_fpr: float = 0.01,
    engine: str = "parity",
) -> DataFrame:
    """The reference's expiring Bloom filter as a streaming query.
    Defaults mirror ``src/ebloom/config.rs:16-29`` (capacity_per_level 1M,
    fpr 0.01, 1h levels). Query the emitted state rows with
    ``operators.windowed_bloom.probe_recent`` over the N most recent
    non-expired windows.

    ``engine='native'`` maintains JVM-xxhash64 KM levels instead: the KM
    base-hash pair is computed in the streaming projection (whole-stage
    codegen), the stateful kernel is a bare scatter, and the emitted
    states are probeable Python-free with
    ``operators.windowed_bloom.native_probe_recent`` — the codegen probe
    family composes with ``applyInPandasWithState`` output because both
    speak the same versioned wire format."""
    from probabilistic_rs_spark.errors import SketchConfigError

    if engine not in ("parity", "native"):
        raise SketchConfigError(f"unknown streaming windowed-bloom engine {engine!r}")
    spec = SketchSpec(
        "bloom",
        "bloom" if engine == "parity" else "nbloom",
        item_col,
        {"capacity": capacity_per_level, "false_positive_rate": target_fpr},
    )
    return streaming_windowed_sketch(
        df, ts_col, item_col, spec, level_duration, watermark_delay
    )
