"""Skew-report job: the one-scan join-plan advisor, packaged for
``spark-submit --py-files``.

    spark-submit --py-files probabilistic_rs_spark.zip \
        skew_report.py --input /path/to/pages_parquet \
        --key host --derive-host-from url \
        --output /path/to/report.json

Composes the round-7 families (theta + count sketch + Misra–Gries) in a
single pass over the candidate join key
(``operators/moments.py:join_skew_advisor``) and writes the auditable
report — n, distinct, F2 / self-join size, skew ratio, hottest keys with
certificates, and a broadcast / salt / shuffle recommendation — as one
JSON file. The intended place in a 100 TB pipeline: run this BEFORE
committing a shuffle join on the key, attach the report to the job's
plan review, and pick the physical strategy from the numbers instead of
folklore. The scan shuffles state-sized partials only.
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
    p = argparse.ArgumentParser(description="one-scan join-skew report")
    p.add_argument("--input", required=True, help="table path (parquet dir)")
    p.add_argument("--key", required=True, help="candidate join key column")
    p.add_argument(
        "--derive-host-from",
        default=None,
        help="derive --key as the hostname of this url column first",
    )
    p.add_argument("--output", required=True, help="path for the JSON report")
    p.add_argument("--eps", type=float, default=0.02)
    p.add_argument("--delta", type=float, default=0.001)
    p.add_argument("--theta-k", type=int, default=16384)
    p.add_argument("--mg-k", type=int, default=2048)
    p.add_argument("--top", type=int, default=10)
    p.add_argument("--broadcast-threshold-rows", type=int, default=1_000_000)
    p.add_argument("--skew-ratio-threshold", type=float, default=16.0)
    return p.parse_args(argv)


def run(spark, args) -> dict:
    from pyspark.sql import functions as F

    from probabilistic_rs_spark.operators.moments import join_skew_advisor

    df = spark.read.parquet(args.input)
    if args.derive_host_from:
        df = df.select(
            F.regexp_extract(args.derive_host_from, r"https://([^/]+)/", 1).alias(
                args.key
            )
        )
    t0 = time.perf_counter()
    report = join_skew_advisor(
        df,
        args.key,
        eps=args.eps,
        delta=args.delta,
        theta_k=args.theta_k,
        mg_k=args.mg_k,
        top=args.top,
        broadcast_threshold_rows=args.broadcast_threshold_rows,
        skew_ratio_threshold=args.skew_ratio_threshold,
    )
    report["key"] = args.key
    report["input"] = args.input
    report["wall_s"] = round(time.perf_counter() - t0, 3)
    return report


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("skew-report").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    report = run(spark, args)
    out_dir = os.path.dirname(os.path.abspath(args.output))
    os.makedirs(out_dir, exist_ok=True)
    tmp = args.output + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=2)
    os.replace(tmp, args.output)
    print(json.dumps({"recommendation": report["recommendation"],
                      "skew_ratio": round(report["skew_ratio"], 2),
                      "n_distinct": int(report["n_distinct"]),
                      "output": args.output}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
