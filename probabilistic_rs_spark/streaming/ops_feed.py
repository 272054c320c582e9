"""Streaming ops-log feed — micro-batches as durable generations.

The batch-side :class:`~probabilistic_rs_spark.generations.GenerationLog`
folds one insert/delete generation at a time into the distributed
cuckoo/quotient shard tables (the GDPR-purge primitive). This module
attaches that fold to Structured Streaming: a ``foreachBatch`` sink where
EACH MICRO-BATCH IS ONE GENERATION, ``gen = batch_id + 1``.

Why this composition is crash-safe without any extra machinery:

* Spark assigns micro-batch ids contiguously per checkpoint and, with a
  replayable source, re-delivers the same rows for a replayed id.
* ``apply_generation`` is IDEMPOTENT on ``gen`` — a generation whose
  lineage record exists is skipped — so the replay of the last
  in-flight batch after a crash re-applies (if it never became durable)
  or no-ops (if it did). Within a batch the fold itself is a pure
  deterministic function of (previous states, ops), so a re-run produces
  bit-identical state bytes (asserted in ``tests/test_generations.py``).
* ``apply_generation`` REFUSES out-of-order generations, so pointing a
  pre-existing stream checkpoint (whose next batch id is far along) at a
  fresh generation log — or a fresh checkpoint at an advanced log —
  fails loudly instead of silently skipping or double-applying ops.
  The stream checkpoint and the generation directory are a PAIR: create
  and retire them together.

Ordering contract (deliberate, same as the batch API): ops apply in
micro-batch arrival order, and within one generation deduplicated
inserts apply before deduplicated deletes. Event-time ordering across
batches is the source's responsibility — an out-of-order feed that needs
event-time retraction semantics should window upstream first.

Scale shape: each micro-batch shuffles only its ops (8-byte hash + tag
per op) to their shards; state bytes move executor→parquet→executor,
never through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from probabilistic_rs_spark.generations import GenerationLog


def generation_ops_sink(log: GenerationLog, op_col: str = "op"):
    """A ``foreachBatch`` function folding each micro-batch of
    ``(op_col, item)`` rows into ``log`` as generation ``batch_id + 1``.

    Usage::

        q = (ops_stream.writeStream
                .option("checkpointLocation", ckpt)
                .foreachBatch(generation_ops_sink(log))
                .start())
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        log.apply_generation(
            batch_df.sparkSession, batch_df, int(batch_id) + 1, op_col=op_col
        )

    return sink


def start_generation_feed(
    ops_stream: DataFrame,
    log: GenerationLog,
    checkpoint_location: str,
    op_col: str = "op",
    available_now: bool = False,
):
    """Convenience: start the ops stream with the generation sink
    attached (one generation per micro-batch; pair ``max files / rows
    per trigger`` source options with your desired generation size).
    Returns the StreamingQuery."""
    writer = (
        ops_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_location)
        .foreachBatch(generation_ops_sink(log, op_col=op_col))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
