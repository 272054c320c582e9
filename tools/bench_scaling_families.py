"""N→4N scaling evidence for the round-7 families (theta + count sketch
+ Misra–Gries) — the advisor's one-scan composition, measured at two
taskset-enforced CPU budgets on the same input, interleaved rounds,
paired efficiencies (the same protocol as ``bench_scaling.py``, which
carries the north-rule gate on the 5-sketch flagship; this script is the
sibling evidence that the NEW families' kernels scale the same way).

Usage: python tools/bench_scaling_families.py [n_rows]
Prints one JSON line per pair.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ROWS = int(next((a for a in sys.argv[1:] if a.isdigit()), 8_000_000))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1]); pages = sys.argv[2]
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
    .appName(f"scaling-families-{{cpus}}")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.files.maxPartitionBytes", "32m")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from probabilistic_rs_spark.operators.sketch_agg import SketchSpec, sketch_aggregate

def job():
    df = spark.read.parquet(pages).select(
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host")
    )
    specs = [
        SketchSpec("adv_theta", "theta", "host", {{"k": 16384}}),
        SketchSpec("adv_cs", "cs", "host", {{"eps": 0.01, "delta": 0.001}}),
        SketchSpec("adv_mg", "mg", "host", {{"k": 2048}}),
    ]
    g = sketch_aggregate(df, [], specs, tree_fanin=8)
    row = g.select("n_updates", "adv_theta_state", "adv_cs_state").head()
    import hashlib
    # theta + cs are bit-equality families: state hashes must match at
    # every parallelism level (MG is bound-invariance, reported only)
    digest = (int(row["n_updates"]),
              hashlib.sha1(bytes(row["adv_theta_state"])).hexdigest(),
              hashlib.sha1(bytes(row["adv_cs_state"])).hexdigest())
    return 3 * int(row["n_updates"]), digest

job()  # warm: JIT + page cache (untimed)
t0 = time.time(); updates, digest = job(); wall = time.time() - t0
print(json.dumps({{"cpus": cpus, "wall_s": round(wall, 3),
    "updates_per_s": round(updates / wall, 1), "digest": list(digest)}}))
spark.stop()
"""


def ensure_pages(path: str) -> None:
    if os.path.exists(path):
        return
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    from probabilistic_rs_spark.datagen import pages_df

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    pages_df(spark, N_ROWS).write.mode("overwrite").parquet(path)
    spark.stop()


def run_level(cpus: int, pages: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_CHILD.format(repo=REPO))
        script = f.name
    cmd = [sys.executable, script, str(cpus), pages]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    os.unlink(script)
    return json.loads(line)


def main() -> None:
    pages = f"/tmp/prs_pages_scaling_{N_ROWS}.parquet"
    ensure_pages(pages)
    pairs = [(2, 8)]
    rounds = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3")))
    levels = sorted({c for p in pairs for c in p})
    samples = []
    for _ in range(rounds):
        snap = {}
        for cpus in levels:  # interleaved: N and 4N share ambient conditions
            snap[cpus] = run_level(cpus, pages)
        samples.append(snap)
    for n, n4 in pairs:
        paired = sorted(s[n]["wall_s"] / s[n4]["wall_s"] / 4.0 for s in samples)
        eff = statistics.median(paired)
        best_n = min(s[n]["wall_s"] for s in samples)
        best_n4 = min(s[n4]["wall_s"] for s in samples)
        identical = all(
            s[n]["digest"] == s[n4]["digest"] for s in samples
        )
        print(
            json.dumps(
                {
                    "pair": f"{n}->{n4}",
                    "n_rows": N_ROWS,
                    "eff_paired_median": round(eff, 3),
                    "eff_min_wall": round(best_n / best_n4 / 4.0, 3),
                    "wall_n_best": best_n,
                    "wall_4n_best": best_n4,
                    "updates_per_s_4n_best": max(
                        s[n4]["updates_per_s"] for s in samples
                    ),
                    "identical_states": identical,
                    "pass": eff >= 0.8,
                }
            )
        )


if __name__ == "__main__":
    main()
