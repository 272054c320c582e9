"""Fixture-generator invariants (FIXTURES.md): determinism, the per-row
``sha256(text)``-stable-per-url invariant, skew, and duplicates."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from probabilistic_rs_spark.datagen import gen_batch, pages_df


def test_pure_function_of_row_id():
    a = gen_batch(np.arange(0, 2000))
    b = gen_batch(np.arange(1000, 2000))
    for col in ("url", "text", "lang"):
        assert all(a[col][1000 + i] == b[col][i] for i in range(1000))


def test_text_byte_identical_per_url():
    """The input_hint per-row invariant: text is a pure function of url."""
    batch = gen_batch(np.arange(50_000))
    by_url: dict[str, str] = {}
    for url, text in zip(batch["url"], batch["text"]):
        h = hashlib.sha256(text.encode()).hexdigest()
        assert by_url.setdefault(url, h) == h


def test_duplicate_fraction():
    batch = gen_batch(np.arange(100_000))
    distinct = len(set(batch["url"]))
    assert 0.93 < distinct / 100_000 < 0.99


def test_host_zipf_skew():
    batch = gen_batch(np.arange(50_000))
    hosts = {}
    for u in batch["url"]:
        h = u.split("/")[2]
        hosts[h] = hosts.get(h, 0) + 1
    top = max(hosts.values())
    assert top / 50_000 > 0.01  # the head host is a real heavy hitter
    assert len(hosts) > 1000  # and there is a long tail


def test_spark_generation_matches_local(spark):
    df = pages_df(spark, 5_000, partitions=7)
    rows = df.orderBy("url").collect()
    local = gen_batch(np.arange(5_000))
    order = np.argsort(local["url"])
    assert len(rows) == 5_000
    for i in (0, 1, 999, 4999):
        assert rows[i]["url"] == local["url"][order[i]]
        assert rows[i]["text"] == local["text"][order[i]]


def test_spark_partitioning_invariance(spark):
    """Same content regardless of parallelism — required for the
    local[8]-vs-local[32] identical-estimates check."""
    a = pages_df(spark, 3_000, partitions=2).orderBy("url").select("url", "text")
    b = pages_df(spark, 3_000, partitions=13).orderBy("url").select("url", "text")
    assert [r.asDict() for r in a.collect()] == [r.asDict() for r in b.collect()]
