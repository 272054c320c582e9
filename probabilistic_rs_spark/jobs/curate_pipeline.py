"""Training-data curation pipeline: the LLM-data operators composed
end-to-end, packaged for ``spark-submit --py-files``.

    spark-submit --py-files probabilistic_rs_spark.zip \
        curate_pipeline.py --input /path/to/documents_parquet \
        --output /path/to/out [--sample-k 1000] [--langs en de]

Stages (each writes its own parquet under ``--output`` and is SKIPPED on
re-run if its ``_SUCCESS`` marker exists — per-stage resume, the same
crash-window contract as the sketch checkpoint layer but at stage
granularity, since every stage here is one deterministic job):

  1. annotate   — lang-ID, quality score, token counts, fingerprint
                  (pure JVM expressions; one scan)
  2. curate     — structural gates + exact-duplicate rejection with
                  per-document reject reasons (auditable, not silent)
  3. exact      — one representative per sha2-identical content
  4. neardup    — MinHash-LSH candidate pairs (verified exact Jaccard)
                  → connected components → one canonical doc per cluster
  5. sample     — deterministic uniform k-per-language sample of the
                  surviving corpus
  6. metrics.json — per-stage counts + wall time

Scale shape: stages 1–2 are single scans in codegen; stage 3 shuffles
32-byte digests, not bodies; stage 4's pair generation is band-bucketed
(never all-pairs) and components run large-star/small-star with
per-round localCheckpoint; stage 5 is a distributed per-group top-k.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

try:
    import probabilistic_rs_spark  # noqa: F401  (zip or installed copy wins)
except ImportError:  # plain-script fallback: repo layout
    _REPO_ROOT = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.path.insert(0, _REPO_ROOT)
    os.environ["PYTHONPATH"] = (
        _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    )


def parse_args(argv):
    p = argparse.ArgumentParser(description="training-data curation pipeline")
    p.add_argument("--input", required=True, help="documents table (parquet dir)")
    p.add_argument("--output", required=True, help="output dir (stage subdirs)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--langs", nargs="*", default=None, help="allowed lang-IDs")
    p.add_argument("--jaccard", type=float, default=0.8, help="near-dup threshold")
    p.add_argument("--num-perm", type=int, default=128)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--sample-k", type=int, default=1000, help="rows per language")
    return p.parse_args(argv)


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("prs-curate-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from probabilistic_rs_spark.functions.text import (
        bpe_ish_token_count,
        doc_fingerprint,
        lang_id,
        quality_score,
        whitespace_token_count,
    )
    from probabilistic_rs_spark.operators.components import canonical_docs
    from probabilistic_rs_spark.operators.curation import curate_documents
    from probabilistic_rs_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from probabilistic_rs_spark.operators.sampling import hash_reservoir_sample

    idc, txt = args.id_col, args.text_col
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    metrics = {"input": args.input, "n_input": docs.count(), "stages": {}}

    def stage(name: str, build):
        """Run (or resume past) one stage; returns its DataFrame."""
        out = os.path.join(args.output, name)
        ts = time.time()
        resumed = _done(out)
        if not resumed:
            build().write.mode("overwrite").parquet(out)
        df = spark.read.parquet(out)
        metrics["stages"][name] = {
            "rows": df.count(),
            "wall_s": round(time.time() - ts, 3),
            "resumed": resumed,
        }
        return df

    # 1. annotate: one codegen scan adds every text-analysis column
    annotated = stage(
        "annotated",
        lambda: docs.select(
            "*",
            lang_id(txt).alias("lang_id"),
            quality_score(txt).alias("quality"),
            whitespace_token_count(txt).alias("n_tokens"),
            bpe_ish_token_count(txt).alias("n_bpe_tokens"),
            doc_fingerprint(txt).alias("fingerprint"),
        ),
    )

    # 2. curate: auditable keep/reject verdicts (duplicates rejected here
    # keep their reasons; survivors flow on)
    verdicts = stage(
        "verdicts",
        lambda: curate_documents(
            docs,
            id_col=idc,
            text_col=txt,
            min_tokens=args.min_tokens,
            min_quality=args.min_quality,
            allowed_langs=args.langs,
        ),
    )
    kept = annotated.join(
        verdicts.where(F.col("keep")).select(idc), idc
    )

    # 3. exact dedup: digests shuffle, bodies don't
    reps = stage(
        "exact_reps",
        lambda: exact_dedup(kept, idc, [txt]),
    )
    exact_kept = kept.join(reps.select(idc), idc)

    # 4. near-dup: banded candidates → verified Jaccard → components →
    # one canonical doc per cluster
    def build_canonical():
        pairs = minhash_lsh_pairs(
            exact_kept,
            idc,
            txt,
            threshold=args.jaccard,
            num_perm=args.num_perm,
            bands=args.bands,
        )
        return canonical_docs(exact_kept, idc, pairs)

    corpus = stage("corpus", build_canonical)

    # 5. per-language deterministic sample
    stage(
        "sample",
        lambda: hash_reservoir_sample(
            corpus, idc, args.sample_k, group_cols=["lang_id"]
        ),
    )

    metrics["wall_s"] = round(time.time() - t0, 3)
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
