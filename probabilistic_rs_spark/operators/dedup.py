"""Large-scale deduplication operators for training-data pipelines.

Four families, all Spark-first:

* **exact** — content-hash groupBy (one shuffle on a 256-bit digest).
* **n-gram Jaccard** — exact set-similarity via an inverted shingle index
  (explode → self-join on shingle → count), the scalable verify kernel.
* **MinHash + LSH** — signature via vectorized numpy over JVM-prehashed
  shingles, banding join for candidates, exact-Jaccard verification. The
  100 TB path: candidate generation touches only band-bucket collisions.
* **SimHash** — 64-bit sign-aggregated fingerprint over md5-derived word
  hashes (md5 keeps SQL parity so oracles can recompute it), Hamming-
  distance pairs via the pigeonhole block join (split 64 bits into d+1
  blocks; any pair within distance d collides on ≥1 block).

Design lineage: the reference is a membership/dedup engine at heart
(``src/bloom/filter.rs`` — "have I seen this item?"); these operators are
the set-similarity generalization a webtext pipeline needs. Hashing reuses
the library's splitmix64 mixer (functions/hashing.py).

Scale notes (100 TB):
* shingle inverted index: drop ultra-frequent shingles
  (``max_shingle_freq``) — they contribute quadratic join blowup and no
  discrimination (standard stop-shingle trick).
* MinHash bands: shuffle volume = num_bands rows per doc, independent of
  text size; exact verify runs only on candidate pairs.
* All per-doc kernels are Arrow-batched numpy; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

from probabilistic_rs_spark.functions.hashing import splitmix64

U64 = np.uint64

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, id_col: str, content_cols: list[str], keep: str = "min"
) -> DataFrame:
    """Exact content dedup: one representative ``id_col`` per distinct
    content (sha2-256 of the concatenated content columns).

    Returns ``(content_hash string, doc_id, n_dups long)``. Single shuffle
    on the digest; at 100 TB the digest (32 B) shuffles instead of the
    document bodies.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    h = F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]), 256)
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(agg.alias(id_col), F.count("*").alias("n_dups"))
    )


# ---------------------------------------------------------------------------
# shingling (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------


def with_shingles(
    df: DataFrame, text_col: str, n: int = 2, out_col: str = "shingles"
) -> DataFrame:
    """Adds a deduplicated array of word n-gram shingles (JVM-side only:
    split → transform/sequence → array_distinct, whole-stage codegen)."""
    words = F.split(F.col(text_col), r"\s+")
    if n == 1:
        sh = words
    else:
        sh = F.transform(
            F.sequence(F.lit(0), F.size(words) - F.lit(n)),
            lambda i: F.concat_ws(" ", *[F.element_at(words, i + F.lit(j + 1)) for j in range(n)]),
        )
    return df.withColumn(out_col, F.array_distinct(sh))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold via inverted shingle
    index. Returns ``(id_a, id_b, jaccard double)`` with id_a < id_b.

    Plan: explode shingles → self-join on shingle (co-partitioned hash
    join) → count common shingles per pair → Jaccard from per-doc set
    sizes. The pair table only materializes pairs sharing ≥1 shingle.
    """
    sh = with_shingles(df, text_col, n).select(
        F.col(id_col).alias("__id"), "shingles", F.size("shingles").alias("__sz")
    )
    inv = sh.select("__id", "__sz", F.explode("shingles").alias("__sh"))
    if max_shingle_freq is not None:
        freq = inv.groupBy("__sh").count().where(F.col("count") <= max_shingle_freq)
        inv = inv.join(F.broadcast(freq.select("__sh")), "__sh")
    a = inv.select(
        F.col("__id").alias("id_a"), F.col("__sz").alias("sz_a"), "__sh"
    )
    b = inv.select(
        F.col("__id").alias("id_b"), F.col("__sz").alias("sz_b"), "__sh"
    )
    pairs = (
        a.join(b, "__sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__common"), F.first("sz_a").alias("sz_a"), F.first("sz_b").alias("sz_b"))
        .withColumn(
            "jaccard",
            F.col("__common") / (F.col("sz_a") + F.col("sz_b") - F.col("__common")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    return pairs.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    num_perm: int = 128,
    seed: int = 42,
) -> DataFrame:
    """Adds ``sig: array<bigint>`` MinHash signature (length num_perm).

    Base shingle hashes are computed JVM-side (xxhash64); the per-
    permutation min is a vectorized numpy kernel over the whole Arrow
    batch (splitmix64 of base_hash ⊕ perm-constant) — one Python call per
    ~64k docs, never per row.
    """
    sh = with_shingles(df, text_col, n)
    base = sh.withColumn("__h", F.transform("shingles", lambda s: F.xxhash64(s))).drop(
        "shingles"
    )
    num_perm_, seed_ = int(num_perm), int(seed)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(hashes: pd.Series) -> pd.Series:
        perms = splitmix64(np.arange(num_perm_, dtype=U64) + U64(seed_ * 0x9E3779B9))
        out = []
        for hs in hashes:
            if hs is None or len(hs) == 0:
                out.append([0] * num_perm_)
                continue
            h = np.asarray(hs, dtype=np.int64).view(U64)
            with np.errstate(over="ignore"):
                m = splitmix64(h[:, None] ^ perms[None, :]).min(axis=0)
            out.append(m.view(np.int64).tolist())
        return pd.Series(out)

    return base.withColumn("sig", sig_udf("__h")).drop("__h")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.5,
    num_perm: int = 128,
    bands: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Returns ``(id_a, id_b, jaccard double)`` — candidates come from LSH
    band-bucket collisions (cheap at scale), the reported Jaccard is the
    exact n-gram Jaccard of the candidate pair (verify step), filtered by
    ``threshold``. With r = num_perm/bands rows per band the collision
    probability at similarity s is 1-(1-s^r)^bands (r=4, b=32: s=0.5 →
    ~0.88 per band set; near 1.0 for s≥0.7).
    """
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    r = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_perm, seed).select(
        F.col(id_col).alias("__id"), "sig"
    )
    banded = sigs.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice("sig", b * r + 1, r).cast("array<string>"))
                ),
            )
        ).alias("__band", "__bh"),
    )
    left = banded.select(F.col("__id").alias("id_a"), "__band", "__bh")
    right = banded.select(F.col("__id").alias("id_b"), "__band", "__bh")
    cand = (
        left.join(right, ["__band", "__bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verify: join candidate ids back to their shingle sets
    sh = with_shingles(df, text_col, n).select(F.col(id_col).alias("__id"), "shingles")
    verified = (
        cand.join(sh.select(F.col("__id").alias("id_a"), F.col("shingles").alias("__sa")), "id_a")
        .join(sh.select(F.col("__id").alias("id_b"), F.col("shingles").alias("__sb")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sa", "__sb"))
            / F.size(F.array_union("__sa", "__sb")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    return verified.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # low 60 bits of md5 → fits a signed BIGINT in both engines


def with_simhash(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "simhash"
) -> DataFrame:
    """Returns ``(id_col, out_col)``: a 60-bit SimHash fingerprint over
    whitespace word features.

    Per-word hash = low 15 hex digits of md5(word) (SQL-reproducible:
    DuckDB/Spark md5 agree byte-for-byte); the fingerprint bit b is 1 iff
    the count-weighted sum of (2·bit_b(word_hash)−1) over words is > 0.
    Entirely JVM-side: explode → conv(md5) → per-bit aggregation. Shuffles
    only (id, 60 small ints) — text never crosses the exchange.
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("__w")
    ).withColumn("__wh", F.conv(F.substring(F.md5("__w"), 1, 15), 16, 10).cast("long"))
    bit_sums = [
        F.sum(
            (F.shiftright(F.col("__wh"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"__b{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = words.groupBy(id_col).agg(*bit_sums)
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"__b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return agg.withColumn(out_col, fp).select(id_col, out_col)


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Pairs of docs whose SimHash Hamming distance ≤ max_hamming, via the
    pigeonhole block join: split the fingerprint into max_hamming+1 blocks;
    any pair within distance d must agree exactly on ≥1 block, so the
    candidate join is an equi-join on (block_idx, block_value) — no cross
    join at any scale. Returns ``(id_a, id_b, hamming int)``.
    """
    nblocks = max_hamming + 1
    width = SIMHASH_BITS // nblocks + (1 if SIMHASH_BITS % nblocks else 0)
    sh = with_simhash(df, id_col, text_col).select(
        F.col(id_col).alias("__id"), "simhash"
    )
    blocks = sh.select(
        "__id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1).cast("long")
                    )
                    for i in range(nblocks)
                ]
            )
        ).alias("__blk", "__bv"),
    )
    a = blocks.select(F.col("__id").alias("id_a"), F.col("simhash").alias("__fa"), "__blk", "__bv")
    b = blocks.select(F.col("__id").alias("id_b"), F.col("simhash").alias("__fb"), "__blk", "__bv")
    cand = (
        a.join(b, ["__blk", "__bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__fa", "__fb")
        .distinct()
    )
    hamming = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= F.lit(max_hamming))
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    planes: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Pairs of rows with cosine similarity ≥ threshold.

    ``planes=None``: exact all-pairs (self-join + JVM dot product) — the
    verify kernel, fine up to ~10⁵ rows per group. With ``planes=p``:
    random-hyperplane LSH prefilter — rows are bucketed by the p-bit sign
    pattern of projections (collision prob (1-θ/π)^p), candidates verified
    exactly; the scale path. Returns ``(id_a, id_b, cosine double)``.
    """
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    base = df.select(
        F.col(id_col).alias("__id"),
        F.transform(vec_col, lambda x: x / norm).alias("__v"),
    )
    if planes:
        base = _with_hyperplane_bucket(base, "__v", planes, seed)
        a = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"), "__bkt")
        b = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), "__bkt")
        cand = a.join(b, "__bkt").where(F.col("id_a") < F.col("id_b"))
    else:
        a = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
        b = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    cos = F.aggregate(
        F.zip_with("__va", "__vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        cand.withColumn("cosine", cos)
        .where(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


def _with_hyperplane_bucket(df: DataFrame, vec_col: str, planes: int, seed: int) -> DataFrame:
    """Adds ``__bkt``: sign-pattern bucket of ``planes`` random hyperplane
    projections (vectorized numpy, one matmul per Arrow batch)."""
    planes_, seed_ = int(planes), int(seed)

    @F.pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        dim = len(vecs.iloc[0])
        rng = np.random.default_rng(seed_)
        H = rng.standard_normal((dim, planes_))
        M = np.stack(vecs.map(np.asarray).to_numpy())
        signs = (M @ H) > 0
        weights = (1 << np.arange(planes_, dtype=np.int64))
        return pd.Series(signs @ weights)

    return df.withColumn("__bkt", bucket(F.col(vec_col)))
