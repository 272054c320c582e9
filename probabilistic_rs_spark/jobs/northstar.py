"""North-star job: the four flagship sketch queries over a webtext table,
packaged for ``spark-submit --py-files``.

    spark-submit --py-files probabilistic_rs_spark.zip \
        northstar.py --input /path/to/pages_parquet \
        --output /path/to/out --checkpoint /path/to/ckpt

(Build the zip with ``python tools/package_pyfiles.py``. On a cluster,
``--input`` would be an Iceberg table identifier; any
``spark.read.format(...)``-readable source works — this sandbox uses
Parquet directories per TESTDATA.md.)

Queries (BASELINE.json north_star):
  1. distinct urls per (lang, day)        — HLL
  2. heavy-hitter hostnames               — salted CMS + candidates
  3. quantiles of length(text) / warc_ts  — t-digest + KLL
  4. url membership filter state          — Bloom (saved for probing)

The whole run is resumable: partial states checkpoint per input file with
lineage (``--checkpoint``); a restarted job skips completed units.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# spark-submit --py-files ships the package zip; when run as a plain
# script (smoke tests, local debugging) fall back to the repo layout —
# PYTHONPATH must be set BEFORE the session starts so forked python
# workers (which unpickle module-referencing closures) inherit it too.
# Fallback ONLY when the package is not already importable (ADVICE r2):
# under --py-files the zip must win — unconditionally prepending the
# repo root would let a stale working-tree copy shadow the shipped
# package and leak the env mutation into every subprocess.
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
    p = argparse.ArgumentParser(description="north-star sketch queries")
    p.add_argument("--input", required=True, help="pages table path (parquet dir)")
    p.add_argument("--output", required=True, help="output dir for results")
    p.add_argument("--checkpoint", default=None, help="lineage checkpoint dir (enables resume)")
    p.add_argument("--hll-p", type=int, default=14)
    p.add_argument("--cms-eps", type=float, default=0.0001)
    p.add_argument("--cms-delta", type=float, default=0.001)
    p.add_argument("--bloom-capacity", type=int, default=0, help="0 = 2x row count")
    p.add_argument("--top-k", type=int, default=100)
    p.add_argument("--salt", type=int, default=16, help="salt fan-out for skewed hosts")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("prs-northstar").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from probabilistic_rs_spark.operators.heavy_hitters import cms_heavy_hitters
    from probabilistic_rs_spark.operators.membership import build_bloom_state
    from probabilistic_rs_spark.operators.sketch_agg import (
        SketchSpec,
        sketch_aggregate,
        with_hll_estimate,
        with_quantiles,
    )

    t0 = time.time()
    pages = spark.read.parquet(args.input)
    n_rows = pages.count()
    metrics = {"input": args.input, "n_rows": n_rows}

    # 1. distinct urls per (lang, day) — resumable via checkpoint when given
    slim = pages.select("lang", F.to_date("warc_ts").alias("day"), "url")
    hll_spec = SketchSpec("urls", "hll", "url", {"p": args.hll_p})
    if args.checkpoint:
        import glob
        import os

        from probabilistic_rs_spark.checkpoint import resumable_sketch_aggregate

        units = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        states = resumable_sketch_aggregate(
            spark,
            units,
            args.checkpoint,
            ["lang", "day"],
            [hll_spec],
            reader=lambda s, u: s.read.parquet(u).select(
                "lang", F.to_date("warc_ts").alias("day"), "url"
            ),
        )
    else:
        states = sketch_aggregate(slim, ["lang", "day"], [hll_spec])
    q1 = with_hll_estimate(states, "urls_state", "n_distinct_urls").select(
        "lang", "day", "n_distinct_urls", "n_updates"
    )
    q1.write.mode("overwrite").parquet(f"{args.output}/distinct_urls_lang_day")

    # 2. heavy-hitter hostnames (salted pre-agg inside the operator)
    hosts = pages.select(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"))
    hh = cms_heavy_hitters(
        hosts, "host", eps=args.cms_eps, delta=args.cms_delta,
        threshold=max(1, int(n_rows * 0.001)),
    ).orderBy(F.desc("est_count")).limit(args.top_k)
    hh.write.mode("overwrite").parquet(f"{args.output}/heavy_hosts")

    # 3. quantiles of text length and warc_ts
    metricsdf = pages.select(
        F.length("text").cast("double").alias("text_len"),
        F.unix_micros(F.col("warc_ts").cast("timestamp")).cast("double").alias("ts_us"),
    )
    qspecs = [
        SketchSpec("len_td", "tdigest", "text_len", {"delta": 200.0}),
        SketchSpec("ts_kll", "kll", "ts_us", {"k": 200}),
    ]
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    qagg = sketch_aggregate(metricsdf, [], qspecs, tree_fanin=16)
    qagg = with_quantiles(qagg, "len_td_state", "tdigest", qs, "len_q")
    qagg = with_quantiles(qagg, "ts_kll_state", "kll", qs, "ts_q")
    qagg.select("len_q", "ts_q", "n_updates").write.mode("overwrite").parquet(
        f"{args.output}/quantiles"
    )

    # 4. Bloom membership state over urls (persisted for later probe jobs)
    cap = args.bloom_capacity or 2 * n_rows
    state = build_bloom_state(pages, "url", capacity=cap, false_positive_rate=0.01)
    spark.createDataFrame([(cap, bytearray(state))], "capacity long, state binary").write.mode(
        "overwrite"
    ).parquet(f"{args.output}/bloom_urls")

    metrics["wall_s"] = round(time.time() - t0, 2)
    metrics["sketch_updates"] = 4 * n_rows
    metrics["updates_per_sec"] = round(4 * n_rows / metrics["wall_s"], 1)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
