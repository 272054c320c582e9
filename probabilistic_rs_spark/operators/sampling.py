"""Deterministic uniform sampling — the training-data pipeline's
"give me k examples (per group)" primitive.

Classic reservoir sampling is a sequential algorithm; the distributed
restatement is *hash-ordered priority sampling*: give every row a
deterministic pseudo-random priority (here the low 60 bits of
``md5(seed # id)`` — md5 agrees byte-for-byte between Spark and DuckDB,
so results are exactly reproducible by the SQL oracle) and keep the k
smallest priorities. With distinct priorities this IS uniform sampling
without replacement, it is merge-friendly (the k smallest of a union are
among the k smallest of each part), and it needs no driver-side state:

* global sample → ``orderBy(priority).limit(k)``: Catalyst compiles this
  to ``TakeOrderedAndProject`` — each partition keeps a local k-heap and
  the driver merges P×k candidate rows, never a full sort. At 100 TB the
  shuffle is k rows per partition, independent of input size.
* per-group sample → ``row_number`` over a window partitioned by group:
  one shuffle on the group key; per-task memory is the window frame.

Determinism contract: same (seed, id) → same sample, across runs,
partitionings, and engines. Re-sampling with a different seed gives an
independent sample (md5 avalanche).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _priority(id_col: str, seed: str):
    """60-bit priority from md5 — identical in Spark and DuckDB:
    ``('0x' || substr(md5(seed || '#' || id), 1, 15))::UBIGINT``."""
    key = F.concat(F.lit(seed), F.lit("#"), F.col(id_col).cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def hash_reservoir_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    group_cols: list[str] | None = None,
    seed: str = "s42",
) -> DataFrame:
    """Deterministic uniform sample of ``k`` rows (per group).

    Returns the input columns plus ``sample_rank`` (1..k, by priority).
    Ties (md5 collisions) break on ``id_col`` so the result is total-order
    deterministic.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    pr = _priority(id_col, seed)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(pr, F.col(id_col))
        return (
            df.withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= k)
        )
    # global: TakeOrderedAndProject — distributed per-partition top-k,
    # never a single-task full sort
    ranked = df.withColumn("__pr", pr).orderBy(F.col("__pr"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("__pr"), F.col(id_col))
    return ranked.withColumn("sample_rank", F.row_number().over(w)).drop("__pr")


def hash_weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
    seed: str = "s42",
) -> DataFrame:
    """Deterministic WEIGHTED sample without replacement of ``k`` rows
    (per group): inclusion probability proportional to ``weight_col``
    (Efraimidis–Spirakis A-ES: keep the k largest ``u^(1/w)``, restated
    as the k smallest ``-ln(u)/w`` — an exponential race).

    The uniform ``u`` derives from md5 exactly as
    :func:`hash_reservoir_sample`, and ``(h+1)/2^60`` is an exact dyadic
    double in every engine. The race key is rounded to 9 decimals and
    tie-broken on ``id_col`` so last-ulp ``ln`` differences between
    engines/runtimes can never flip the selection — the sample is exactly
    reproducible by the SQL oracle. Rows with weight ≤ 0 are excluded
    (standard A-ES domain).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    h = _priority(id_col, seed)
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = F.round(-F.log(u) / F.col(weight_col).cast("double"), 9)
    base = df.where(F.col(weight_col).cast("double") > 0)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(key, F.col(id_col))
        return (
            base.withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= k)
        )
    ranked = base.withColumn("__k", key).orderBy(F.col("__k"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("__k"), F.col(id_col))
    return ranked.withColumn("sample_rank", F.row_number().over(w)).drop("__k")


def weighted_sample_sql(
    table: str,
    id_col: str,
    weight_expr: str,
    k: int,
    group_cols: list[str] | None = None,
    seed: str = "s42",
) -> str:
    """DuckDB oracle for :func:`hash_weighted_sample` (kept in sync)."""
    h = f"('0x' || substr(md5('{seed}' || '#' || CAST({id_col} AS VARCHAR)), 1, 15))::UBIGINT"
    key = f"round(-ln(({h} + 1)::DOUBLE / 1152921504606846976.0) / ({weight_expr}), 9)"
    src = f"(SELECT * FROM {table} WHERE ({weight_expr}) > 0)"
    if group_cols:
        part = ", ".join(group_cols)
        return (
            f"SELECT * EXCLUDE (__k) FROM ("
            f"SELECT *, {key} AS __k, row_number() OVER ("
            f"PARTITION BY {part} ORDER BY {key}, {id_col}) AS sample_rank "
            f"FROM {src}) WHERE sample_rank <= {k}"
        )
    return (
        f"SELECT * EXCLUDE (__k) FROM ("
        f"SELECT *, {key} AS __k, row_number() OVER (ORDER BY {key}, {id_col}) AS sample_rank "
        f"FROM {src}) WHERE sample_rank <= {k}"
    )


def priority_sample_sql(
    table: str, id_col: str, k: int, group_cols: list[str] | None = None, seed: str = "s42"
) -> str:
    """The exact DuckDB-dialect oracle for :func:`hash_reservoir_sample`
    (kept next to the operator so the two stay in sync)."""
    pr = f"('0x' || substr(md5('{seed}' || '#' || CAST({id_col} AS VARCHAR)), 1, 15))::UBIGINT"
    if group_cols:
        part = ", ".join(group_cols)
        return (
            f"SELECT * EXCLUDE (__pr) FROM ("
            f"SELECT *, {pr} AS __pr, row_number() OVER ("
            f"PARTITION BY {part} ORDER BY {pr}, {id_col}) AS sample_rank "
            f"FROM {table}) WHERE sample_rank <= {k}"
        )
    return (
        f"SELECT * EXCLUDE (__pr) FROM ("
        f"SELECT *, {pr} AS __pr, row_number() OVER (ORDER BY {pr}, {id_col}) AS sample_rank "
        f"FROM {table}) WHERE sample_rank <= {k}"
    )
