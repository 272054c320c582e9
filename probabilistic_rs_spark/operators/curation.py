"""Document curation — the composed keep/reject gate of a training-data
pipeline, built entirely from the library's JVM-side text functions plus
exact dedup. One scan, one dedup shuffle, no Python in the row path.

Gate order (first failing reason wins, the conventional curation
precedence: cheap structural filters before semantic ones, dedup last so
reasons are stable under re-partitioning):

    too_short → too_long → low_quality → wrong_lang → duplicate → kept

``duplicate`` keeps the minimum ``id_col`` per exact content group (same
canonical-representative convention as :func:`operators.dedup.exact_dedup`)
— and only among documents that SURVIVED the structural gates, so a
rejected doc never "shadows" a keepable twin.

Every predicate is a pure SQL expression, so the whole operator is
oracle-checkable end-to-end; at 100 TB the only shuffle is the dedup
``row_number`` over the 32-byte content digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from probabilistic_rs_spark.functions.text import (
    lang_id,
    quality_score,
    whitespace_token_count,
)


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.5,
    allowed_langs: list[str] | None = None,
) -> DataFrame:
    """Returns ``(id_col, keep boolean, reason string)`` for every input
    row. ``reason`` is ``'kept'`` for survivors, else the first failing
    gate (``too_short`` / ``too_long`` / ``low_quality`` / ``wrong_lang``
    / ``duplicate``)."""
    ntok = whitespace_token_count(text_col)
    q = quality_score(text_col)
    lang = lang_id(text_col)
    structural = (
        F.when(ntok < F.lit(min_tokens), F.lit("too_short"))
        .when(ntok > F.lit(max_tokens), F.lit("too_long"))
        .when(q < F.lit(min_quality), F.lit("low_quality"))
    )
    if allowed_langs is not None:
        structural = structural.when(
            ~lang.isin(*allowed_langs), F.lit("wrong_lang")
        )
    base = df.select(
        F.col(id_col),
        structural.alias("__reject"),
        F.sha2(F.col(text_col).cast("string"), 256).alias("__digest"),
    )
    # dedup only among structurally-kept docs: kept rows sort first in the
    # digest window, so a REJECTED doc can never shadow a keepable twin —
    # the minimum-id surviving doc always takes rank 1
    w = Window.partitionBy("__digest").orderBy(
        F.col("__reject").isNotNull().cast("int"), F.col(id_col)
    )
    ranked = base.withColumn(
        "__dup_rank",
        F.when(F.col("__reject").isNull(), F.row_number().over(w)),
    )
    reason = F.coalesce(
        F.col("__reject"),
        F.when(F.col("__dup_rank") > 1, F.lit("duplicate")),
        F.lit("kept"),
    )
    return ranked.select(
        F.col(id_col),
        (reason == F.lit("kept")).alias("keep"),
        reason.alias("reason"),
    )
