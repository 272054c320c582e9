"""Distributed connected components + canonical dedup selection.

The last mile of every near-duplicate pipeline: pair output (from
MinHash-LSH / SimHash / embedding near-dup) is an EDGE LIST; what the
pipeline needs is one canonical document per duplicate *cluster*, i.e.
connected components of the pair graph.

Algorithm: iterative min-label propagation (the "small-star/large-star"
family reduced to its simplest shuffle shape). Each vertex starts with
label = its own id; every round each vertex takes the minimum label in
its closed neighborhood; converged when no label changes. Rounds needed
≈ graph diameter for plain propagation — near-dup graphs are
overwhelmingly small dense clusters (diameter ≲ 3), so a handful of
rounds closes them. Every round is two hash-shuffles (join on vertex,
min-aggregate); state is one (vertex, label) row per vertex — no
driver-side graph, no per-row Python.

Scale notes (100 TB): the pair graph after a sane similarity threshold
is SPARSE (o(n) edges); each round shuffles O(V+E) small rows. The
driver loop runs a convergence check per round (a count — cheap) and
checkpoint-truncates lineage every few rounds so the plan doesn't grow
unboundedly across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from probabilistic_rs_spark.errors import SketchConfigError


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    localCheckpoint_every: int = 5,
) -> DataFrame:
    """Connected components of an undirected edge list.

    Returns ``(vertex, component)`` — ``component`` is the minimum vertex
    id of the component (a stable canonical representative). Vertices
    only ever appear if they occur in an edge; isolated rows should be
    handled by the caller (they are their own component trivially).

    Raises after ``max_iter`` rounds without convergence — near-dup
    graphs converge in a few rounds; hitting the cap means the input is
    not the sparse cluster graph this is meant for.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    numeric = (ByteType, ShortType, IntegerType, LongType)
    for c in (src_col, dst_col):
        if not isinstance(edges.schema[c].dataType, numeric):
            # a silent cast('long') would turn string ids into NULLs and
            # make dedup a no-op with no error — refuse instead
            raise SketchConfigError(
                f"connected_components requires integral vertex ids; "
                f"column {c!r} is {edges.schema[c].dataType.simpleString()} "
                "(hash or dictionary-encode string ids first)"
            )
    sym = edges.select(
        F.col(src_col).cast("long").alias("s"), F.col(dst_col).cast("long").alias("d")
    )
    sym = sym.union(sym.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    labels = (
        sym.select(F.col("s").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    for it in range(max_iter):
        # label of each vertex's neighbors
        nbr = (
            sym.join(labels.withColumnRenamed("vertex", "d2"), sym["d"] == F.col("d2"))
            .select(F.col("s").alias("vertex"), F.col("component").alias("nl"))
        )
        new_labels = (
            labels.join(nbr, "vertex", "left")
            .groupBy("vertex")
            .agg(
                F.least(
                    F.min("component"), F.coalesce(F.min("nl"), F.min("component"))
                ).alias("component")
            )
        )
        if localCheckpoint_every and (it + 1) % localCheckpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.cache()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        old = labels
        labels = new_labels
        if hasattr(old, "unpersist"):
            old.unpersist()
        if changed == 0:
            return labels.select("vertex", "component")
    raise SketchConfigError(
        f"connected_components did not converge in {max_iter} rounds — "
        "input is not a sparse near-dup cluster graph"
    )


def canonical_docs(
    df: DataFrame,
    id_col: str,
    pair_df: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Keep one canonical row per duplicate cluster: the minimum id of
    each connected component survives; every other member is dropped;
    rows never mentioned in a pair pass through untouched. Adds
    ``n_cluster`` (cluster size; 1 for singletons)."""
    comp = connected_components(pair_df, src_col, dst_col)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).cast("long").alias("n_cluster"))
    keep = comp.where(F.col("vertex") == F.col("component")).join(sizes, "component")
    tagged = df.join(
        comp.withColumnRenamed("vertex", id_col), id_col, "left"
    )
    survivors = tagged.where(
        F.col("component").isNull() | (F.col(id_col) == F.col("component"))
    )
    return (
        survivors.join(keep.select("component", "n_cluster"), "component", "left")
        .withColumn("n_cluster", F.coalesce(F.col("n_cluster"), F.lit(1).cast("long")))
        .drop("component")
    )
