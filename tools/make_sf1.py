#!/usr/bin/env python
"""Synthesize the sf1 (10x sf0.1) bench inputs — VERDICT r6 next-round #1
(the missing data decade).

The driver ships parquet only up to sf0.1; this generates, DETERMINISTICALLY
and from public inputs only:

* ``/tmp/sf1/lineitem.parquet`` / ``/tmp/sf1/events.parquet`` — 10 key-shifted
  copies of the sf0.1 tables (copy c offsets every key/id column by
  ``c * OFFSET`` and every timestamp by ``c`` microseconds, so distinct
  counts, group cardinalities, and join selectivities scale 10x while
  value distributions are preserved exactly);
* the 10M-row pages table — ``bench.py``'s own ``ensure_pages`` at
  ``SPARK_GRAFT_SF_DIR=/tmp/sf1`` (datagen.pages_df is already
  row-count-parameterized and deterministic).

Usage: python tools/make_sf1.py [out_dir]    (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
KEY_OFFSET = 1_000_000_000  # far above any sf0.1 key range

# key/id columns to shift per copy (value columns stay untouched so the
# sketch-input distributions are identical across copies)
SHIFT_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}


def replicate(spark, table: str, out_dir: str, copies: int = 10) -> None:
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{SRC}/{table}.parquet")
    parts = []
    for c in range(copies):
        df = src
        for col in SHIFT_COLS[table]:
            df = df.withColumn(col, F.col(col) + F.lit(c * KEY_OFFSET))
        parts.append(df)
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    path = os.path.join(out_dir, f"{table}.parquet")
    out.repartition(64).write.mode("overwrite").parquet(path)
    print(f"{table}: {spark.read.parquet(path).count()} rows -> {path}")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    os.environ["SPARK_GRAFT_SF_DIR"] = out_dir
    import bench

    spark = bench.get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "events"):
        replicate(spark, t, out_dir)
    print(f"pages: generating {bench.PAGES_ROWS} rows -> {bench.PAGES_PATH}")
    bench.ensure_pages(spark)
    print("pages: done")
    spark.stop()


if __name__ == "__main__":
    main()
