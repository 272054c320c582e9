"""Tests for training-data pipeline operators: dedup, similarity search,
text analysis, multimodal plumbing. Exact oracles computed in-process
(pure Python / numpy) at sf0.001–0.01 scale."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_correct):
    return spark.read.parquet(f"{sf_correct}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_correct):
    return spark.read.parquet(f"{sf_correct}/embeddings.parquet").cache()


def _bigram_sets(rows):
    out = {}
    for doc_id, text in rows:
        w = text.split(" ")
        out[doc_id] = {f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)}
    return out


def _true_pairs(shingle_sets, threshold):
    ids = sorted(shingle_sets)
    pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = shingle_sets[a], shingle_sets[b]
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                pairs.add((a, b))
    return pairs


class TestDedup:
    def test_exact_dedup_counts(self, spark):
        from probabilistic_rs_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa"), (5, "cc")], "id long, t string"
        )
        rows = {r["id"]: r["n_dups"] for r in exact_dedup(df, "id", ["t"]).collect()}
        assert rows == {1: 3, 2: 1, 5: 1}  # min id kept per content group

    def test_ngram_jaccard_matches_bruteforce(self, docs):
        from probabilistic_rs_spark.operators.dedup import ngram_jaccard_pairs

        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, "doc_id", "text", 2, 0.5).collect()
        }
        sets = _bigram_sets([(r["doc_id"], r["text"]) for r in docs.collect()])
        want = _true_pairs(sets, 0.5)
        assert set(got) == want
        for (a, b), j in got.items():
            exact = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            assert abs(j - exact) < 1e-12

    def test_minhash_lsh_full_recall_at_operating_point(self, docs):
        from probabilistic_rs_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        exact = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(docs, "doc_id", "text", 2, 0.5).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                docs, "doc_id", "text", n=2, threshold=0.5, num_perm=128, bands=32
            ).collect()
        }
        # exact-verify step makes precision 1.0 by construction; the LSH
        # band config must reach full recall on this distribution
        assert lsh == exact and len(lsh) > 0

    def test_minhash_signature_determinism(self, docs):
        from probabilistic_rs_spark.operators.dedup import minhash_signatures

        a = minhash_signatures(docs.limit(50), "doc_id", "text").orderBy("doc_id")
        b = minhash_signatures(
            docs.limit(50).repartition(7), "doc_id", "text"
        ).orderBy("doc_id")
        assert [r["sig"] for r in a.collect()] == [r["sig"] for r in b.collect()]

    def test_simhash_close_for_similar_texts(self, spark):
        from probabilistic_rs_spark.operators.dedup import simhash_pairs, with_simhash

        base = "the quick brown fox jumps over the lazy dog " * 8
        near = base.replace("lazy", "sleepy", 1)
        far = "completely different words entirely unrelated content here " * 8
        df = spark.createDataFrame(
            [(1, base), (2, near), (3, far)], "doc_id long, text string"
        )
        fp = {r["doc_id"]: r["simhash"] for r in with_simhash(df, "doc_id", "text").collect()}
        d12 = bin(fp[1] ^ fp[2]).count("1")
        d13 = bin(fp[1] ^ fp[3]).count("1")
        assert d12 < d13 and d12 <= 6
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_pairs(df, "doc_id", "text", max_hamming=6).collect()
        }
        assert (1, 2) in pairs and (1, 3) not in pairs

    def test_simhash_pigeonhole_join_is_exact(self, docs):
        """Block-join candidate generation must find EVERY pair within the
        Hamming budget (pigeonhole guarantee), not just most."""
        from probabilistic_rs_spark.operators.dedup import simhash_pairs, with_simhash

        sub = docs.limit(120)
        fps = {r["doc_id"]: r["simhash"] for r in with_simhash(sub, "doc_id", "text").collect()}
        ids = sorted(fps)
        want = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin(fps[a] ^ fps[b]).count("1") <= 8
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_pairs(sub, "doc_id", "text", max_hamming=8).collect()
        }
        assert got == want

    def _numpy_cosine_pairs(self, emb, threshold):
        rows = emb.collect()
        V = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        ids = np.array([r["vec_id"] for r in rows])
        S = V @ V.T
        return {
            (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
            if S[i, j] >= threshold
        }

    def test_embedding_cosine_default_lsh_full_recall(self, emb):
        """The DEFAULT (LSH + verify) path must equal brute force at the
        operating point — recall 1.0 empirically, precision 1.0 by the
        verify construction."""
        from probabilistic_rs_spark.operators.dedup import embedding_cosine_pairs

        got = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in embedding_cosine_pairs(emb, "vec_id", "embedding", 0.4).collect()
        }
        assert set(got) == self._numpy_cosine_pairs(emb, 0.4)
        assert all(abs(v) <= 1.0 + 1e-9 for v in got.values())

    def test_embedding_cosine_exact_optin_matches(self, emb):
        from probabilistic_rs_spark.operators.dedup import embedding_cosine_pairs

        got = {
            (r["id_a"], r["id_b"])
            for r in embedding_cosine_pairs(
                emb, "vec_id", "embedding", 0.4, exact=True
            ).collect()
        }
        assert got == self._numpy_cosine_pairs(emb, 0.4)

    def test_embedding_cosine_default_plan_has_no_cartesian_product(self, emb):
        """The exercised default plan must be equi-join only — no
        CartesianProduct / BroadcastNestedLoopJoin anywhere (VERDICT.md
        round-1 item #1)."""
        from probabilistic_rs_spark.operators.dedup import embedding_cosine_pairs

        df = embedding_cosine_pairs(emb, "vec_id", "embedding", 0.4)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_explicit_planes_is_subset_of_exact(self, emb):
        from probabilistic_rs_spark.operators.dedup import embedding_cosine_pairs

        exact = {
            (r["id_a"], r["id_b"])
            for r in embedding_cosine_pairs(
                emb, "vec_id", "embedding", 0.4, exact=True
            ).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in embedding_cosine_pairs(
                emb, "vec_id", "embedding", 0.4, planes=4, tables=4
            ).collect()
        }
        assert lsh <= exact  # verify step guarantees precision 1.0

    def test_cosine_lsh_params_scale_with_threshold(self):
        """Higher thresholds must get finer buckets (more planes) without
        exceeding the table budget; all regimes keep tables bounded."""
        from probabilistic_rs_spark.operators.dedup import cosine_lsh_params

        p_lo, t_lo = cosine_lsh_params(0.4)
        p_hi, t_hi = cosine_lsh_params(0.9)
        assert p_hi > p_lo
        assert 1 <= t_lo <= 16 and 1 <= t_hi <= 16

    def test_jaccard_prefix_filter_bounds_skewed_index(self, spark):
        """A stop-shingle present in EVERY doc must not blow up the
        candidate join: the prefix filter excludes globally-frequent
        shingles from almost every doc's prefix, keeping the inverted
        index (and thus candidate pairs) linear — while the output stays
        exactly equal to brute force."""
        from probabilistic_rs_spark.operators.dedup import (
            jaccard_candidate_index,
            ngram_jaccard_pairs,
        )

        n_docs = 200
        rows = [
            # "common stop" bigram in every doc + unique tail per doc
            (i, "common stop " + " ".join(f"w{i}x{j}" for j in range(8)))
            for i in range(n_docs)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        idx = jaccard_candidate_index(df, "doc_id", "text", 2, 0.5)
        per_shingle = idx.groupBy("__sh").count()
        max_freq = per_shingle.agg(F.max("count")).head()[0]
        # without the prefix filter the "common stop" shingle indexes all
        # 200 docs -> ~19,900 candidate pairs; with it, no shingle may
        # index more than a handful of docs
        assert max_freq <= 4
        pairs = ngram_jaccard_pairs(df, "doc_id", "text", 2, 0.5).collect()
        assert pairs == []  # no pair shares more than the stop bigram

    def test_jaccard_prefix_vs_unfiltered_equal(self, docs):
        from probabilistic_rs_spark.operators.dedup import ngram_jaccard_pairs

        sub = docs.limit(150)
        with_pf = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 12)
            for r in ngram_jaccard_pairs(sub, "doc_id", "text", 2, 0.5).collect()
        }
        without = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 12)
            for r in ngram_jaccard_pairs(
                sub, "doc_id", "text", 2, 0.5, prefix_filter=False
            ).collect()
        }
        assert with_pf == without


class TestHeavyHitterTree:
    def test_tree_fanin_matches_flat_merge(self, spark, sf_correct):
        from probabilistic_rs_spark.operators.heavy_hitters import cms_heavy_hitters

        li = spark.read.parquet(f"{sf_correct}/lineitem.parquet").repartition(24)
        flat = {
            (r["key"], r["est_count"])
            for r in cms_heavy_hitters(li, "l_partkey", threshold=45).collect()
        }
        tree = {
            (r["key"], r["est_count"])
            for r in cms_heavy_hitters(
                li, "l_partkey", threshold=45, tree_fanin=4
            ).collect()
        }
        assert flat == tree and len(flat) > 0


class TestSimilarity:
    def test_cosine_topk_matches_numpy(self, emb):
        from probabilistic_rs_spark.operators.similarity import cosine_topk

        q = emb.where(F.col("vec_id") < 5)
        got = cosine_topk(emb, q, "vec_id", "embedding", k=3).collect()
        rows = emb.collect()
        ids = np.array([r["vec_id"] for r in rows])
        V = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        S = V @ V.T
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
        assert set(by_q) == {0, 1, 2, 3, 4}
        for qid, neigh in by_q.items():
            qi = int(np.where(ids == qid)[0][0])
            sims = S[qi].copy()
            sims[ids == qid] = -np.inf
            order = np.lexsort((ids, -sims))[:3]
            want = [(int(ids[j]), sims[j]) for j in order]
            got_sorted = sorted(neigh)
            assert [n for _, n, _ in got_sorted] == [n for n, _ in want]
            for (_, _, c), (_, s) in zip(got_sorted, want):
                assert abs(c - s) < 1e-9

    def test_topk_partition_invariance(self, emb):
        from probabilistic_rs_spark.operators.similarity import cosine_topk

        q = emb.where(F.col("vec_id") < 3)
        a = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in cosine_topk(emb, q, "vec_id", "embedding", k=4).collect()
        )
        b = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in cosine_topk(emb.repartition(13), q, "vec_id", "embedding", k=4).collect()
        )
        assert a == b

    def test_lsh_ann_plumbing_and_recall(self, emb):
        from probabilistic_rs_spark.operators.similarity import cosine_topk, lsh_ann_topk

        q = emb.where(F.col("vec_id") < 10)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, q, "vec_id", "embedding", k=5).collect()
        }
        ann = lsh_ann_topk(emb, q, "vec_id", "embedding", k=5, planes=6, tables=8)
        rows = ann.collect()
        assert len(rows) == 50  # k results per query even approximately
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        # random embeddings are LSH's worst case; just require real signal
        assert len(exact & got) / len(exact) > 0.15

    def test_ivf_ann_recall_determinism_no_cross_join(self, emb):
        from probabilistic_rs_spark.operators.similarity import (
            cosine_topk,
            ivf_ann_topk,
        )

        q = emb.where(F.col("vec_id") < 10)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, q, "vec_id", "embedding", k=5).collect()
        }
        ivf = ivf_ann_topk(emb, q, "vec_id", "embedding", k=5, n_lists=16, n_probe=10)
        plan = ivf._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
        rows_a = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"]) for r in ivf.collect()
        )
        got = {(qid, n) for qid, _, n in rows_a}
        # near-uniform synthetic embeddings: generous probe fraction
        # (10/16) still recalls >= 80% overall, deterministic per seed
        assert len(exact & got) / len(exact) >= 0.8
        # determinism under a different input partitioning
        rows_b = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in ivf_ann_topk(
                emb.repartition(13), q, "vec_id", "embedding",
                k=5, n_lists=16, n_probe=10,
            ).collect()
        )
        assert rows_a == rows_b


class TestText:
    def test_token_counts_and_quality(self, spark):
        from probabilistic_rs_spark.functions.text import (
            bpe_ish_token_count,
            quality_score,
            whitespace_token_count,
        )

        df = spark.createDataFrame(
            [("hello world foo",), ("a1b2, c3!",)], "t string"
        ).select(
            whitespace_token_count("t").alias("nt"),
            bpe_ish_token_count("t").alias("nb"),
            quality_score("t").alias("q"),
        )
        r = df.collect()
        assert r[0]["nt"] == 3 and r[0]["nb"] == 3
        # a1b2, c3! -> [a,1,b,2,',',c,3,'!'] = 8 bpe-ish tokens, 2 ws tokens
        assert r[1]["nt"] == 2 and r[1]["nb"] == 8
        assert 0.0 <= r[0]["q"] <= 1.0 and 0.0 <= r[1]["q"] <= 1.0

    def test_lang_id_profiles(self, spark):
        from probabilistic_rs_spark.functions.text import lang_id

        df = spark.createDataFrame(
            [
                ("the cat is in the house and it is big",),
                ("der hund ist nicht ein tier und das haus",),
                ("le chat et les maisons est un une des",),
                ("xyzzy plugh quux",),
            ],
            "t string",
        ).select(lang_id("t").alias("lang"))
        assert [r["lang"] for r in df.collect()] == ["en", "de", "fr", "und"]

    def test_fingerprint_locality(self, spark):
        """Same text → same fp; a large edit far from the minimizing
        window usually preserves fp only if min window untouched — we
        just assert determinism + difference for disjoint texts."""
        from probabilistic_rs_spark.functions.text import doc_fingerprint

        df = spark.createDataFrame(
            [("abcdefghijklmnopqrstuvwxyz0123456789",), ("abcdefghijklmnopqrstuvwxyz0123456789",), ("totally different content here with words",)],
            "t string",
        ).select(doc_fingerprint("t").alias("fp"))
        fps = [r["fp"] for r in df.collect()]
        assert fps[0] == fps[1] != fps[2]


class TestMultimodal:
    def test_sniff_and_metadata(self, spark):
        from probabilistic_rs_spark.operators.multimodal import media_metadata

        df = spark.createDataFrame(
            [
                (1, bytearray(b"\x89PNG\r\n\x1a\nrest")),
                (2, bytearray(b"\xff\xd8\xff\xe0jpegdata")),
                (3, bytearray(b"GIF89a...")),
                (4, bytearray(b"RIFF....WAVE")),
                (5, bytearray(b"<html><body>x</body></html>")),
                (6, bytearray(b"plain bytes")),
            ],
            "id long, payload binary",
        )
        got = {
            r["id"]: (r["media_type"], r["n_bytes"])
            for r in media_metadata(df, "payload").collect()
        }
        assert got[1][0] == "png" and got[2][0] == "jpeg" and got[3][0] == "gif"
        assert got[4][0] == "riff" and got[5][0] == "html" and got[6][0] == "unknown"
        assert got[6][1] == len(b"plain bytes")

    def test_featurize_batch_shape_and_determinism(self, spark):
        from probabilistic_rs_spark.operators.multimodal import (
            FEATURE_DIM,
            decode_and_featurize,
        )

        df = spark.createDataFrame(
            [(i, bytearray(bytes([i % 256]) * (10 + i))) for i in range(100)]
            + [(100, None)],
            "id long, payload binary",
        )
        out = decode_and_featurize(df, "payload", ["id"])
        rows = {r["id"]: r for r in out.collect()}
        assert len(rows) == 101
        assert rows[100]["features"] is None and rows[100]["n_bytes"] is None
        assert len(rows[0]["features"]) == FEATURE_DIM
        assert abs(sum(rows[7]["features"]) - 1.0) < 1e-3
        rows2 = {r["id"]: r for r in decode_and_featurize(df.repartition(9), "payload", ["id"]).collect()}
        assert rows2[7]["features"] == rows[7]["features"]

    def test_real_decoder_is_explicit_stub(self, spark):
        from probabilistic_rs_spark.operators.multimodal import decode_and_featurize

        df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, payload binary")
        with pytest.raises(NotImplementedError):
            decode_and_featurize(df, "payload", ["id"], decoder="real")

    def test_injected_decoder(self, spark):
        from probabilistic_rs_spark.operators.multimodal import (
            FEATURE_DIM,
            decode_and_featurize,
        )

        def decoder(payloads):
            return np.full((len(payloads), FEATURE_DIM), 0.5, dtype=np.float32)

        df = spark.createDataFrame([(1, bytearray(b"abc"))], "id long, payload binary")
        r = decode_and_featurize(df, "payload", ["id"], decoder=decoder).collect()[0]
        assert r["features"] == [0.5] * FEATURE_DIM


class TestConnectedComponents:
    def _union_find(self, pairs):
        parent = {}
        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    def test_components_match_union_find(self, spark):
        from probabilistic_rs_spark.operators.components import connected_components

        # chain + triangle + isolated pair + a larger star
        pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
                 (20, 21), (30, 31), (30, 32), (30, 33), (30, 34)]
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = {
            r["vertex"]: r["component"]
            for r in connected_components(df).collect()
        }
        want = self._union_find(pairs)
        assert got == want

    def test_components_on_simhash_pairs(self, docs):
        from probabilistic_rs_spark.operators.components import connected_components
        from probabilistic_rs_spark.operators.dedup import simhash_pairs

        pairs_df = simhash_pairs(docs, "doc_id", "text", max_hamming=8)
        pairs = [(r["id_a"], r["id_b"]) for r in pairs_df.collect()]
        got = {
            r["vertex"]: r["component"]
            for r in connected_components(pairs_df).collect()
        }
        assert got == self._union_find(pairs)

    def test_star_matches_union_find_all_shapes(self, spark):
        from probabilistic_rs_spark.operators.components import connected_components

        pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
                 (20, 21), (30, 31), (30, 32), (30, 33), (30, 34)]
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = {
            r["vertex"]: r["component"]
            for r in connected_components(df, algorithm="star").collect()
        }
        assert got == self._union_find(pairs)

    def test_chain_graph_converges_via_star_fallback(self, spark):
        """VERDICT r2 #9: a 120-vertex chain has diameter 119 — plain
        min-label propagation cannot close it within its round cap (the
        old code raised here); auto mode switches to large-star/small-
        star, which closes any graph in O(log n) rounds."""
        from probabilistic_rs_spark.errors import SketchConfigError
        from probabilistic_rs_spark.operators.components import connected_components

        chain = [(i, i + 1) for i in range(120)]
        df = spark.createDataFrame(chain, "id_a long, id_b long")
        # propagation alone must still refuse (documented contract)
        with pytest.raises(SketchConfigError, match="did not converge"):
            connected_components(df, algorithm="propagation", max_iter=10)
        got = {
            r["vertex"]: r["component"]
            for r in connected_components(df, max_iter=25).collect()  # auto
        }
        assert got == {i: 0 for i in range(121)}

    def test_star_random_graph_matches_propagation(self, spark):
        import random

        from probabilistic_rs_spark.operators.components import connected_components

        rng = random.Random(7)
        pairs = [(rng.randrange(300), rng.randrange(300)) for _ in range(250)]
        pairs = [(a, b) for a, b in pairs if a != b]
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        a = {
            r["vertex"]: r["component"]
            for r in connected_components(df, algorithm="star").collect()
        }
        assert a == self._union_find(pairs)

    def test_canonical_docs_keeps_min_and_singletons(self, spark):
        from probabilistic_rs_spark.operators.components import canonical_docs

        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(8)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame([(1, 2), (2, 5), (6, 7)], "id_a long, id_b long")
        out = {r["doc_id"]: r["n_cluster"] for r in canonical_docs(docs, "doc_id", pairs).collect()}
        # clusters {1,2,5} -> keep 1 (size 3); {6,7} -> keep 6 (size 2);
        # singletons 0,3,4 pass through with n_cluster 1
        assert out == {0: 1, 1: 3, 3: 1, 4: 1, 6: 2}


class TestCuration:
    def test_gate_precedence_and_dedup_no_shadowing(self, spark):
        from probabilistic_rs_spark.operators.curation import curate_documents

        good = "the quick brown fox jumps over the lazy dog and runs far away " * 2
        rows = [
            (1, good),                       # kept
            (2, good),                       # duplicate of 1
            (3, "short text"),               # too_short
            (4, good + " filler" * 300),     # too_long
            (5, "el la de que los es un una " * 4),  # wrong_lang (es)
            (6, "short text"),               # too_short (NOT duplicate: 3 was rejected)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: (r["keep"], r["reason"])
            for r in curate_documents(
                df, min_tokens=12, max_tokens=200, min_quality=0.3, allowed_langs=["en"]
            ).collect()
        }
        assert out[1] == (True, "kept")
        assert out[2] == (False, "duplicate")
        assert out[3] == (False, "too_short")
        assert out[4] == (False, "too_long")
        assert out[5] == (False, "wrong_lang")
        # same content as a rejected doc, itself rejected structurally —
        # never labeled duplicate (rejected docs don't shadow or count)
        assert out[6] == (False, "too_short")

    def test_rejected_doc_does_not_shadow_keepable_twin(self, spark):
        from probabilistic_rs_spark.operators.curation import curate_documents

        # doc 1 is structurally rejected (wrong lang), doc 2 has the SAME
        # text... that can't happen (same text => same gates). Instead:
        # two kept twins where the LOWER id must survive, regardless of
        # input order / partitioning.
        good = "the quick brown fox jumps over the lazy dog and runs far away " * 2
        df = spark.createDataFrame(
            [(9, good), (7, good), (8, good)], "doc_id long, text string"
        ).repartition(3)
        out = {
            r["doc_id"]: r["reason"]
            for r in curate_documents(
                df, min_tokens=5, max_tokens=500, min_quality=0.1
            ).collect()
        }
        assert out == {7: "kept", 8: "duplicate", 9: "duplicate"}


class TestSimhashArrowEngine:
    """hash_fn='xxhash64' routes to the mapInArrow bit-vote kernel; its
    fingerprints must behave like SimHash (close texts → small Hamming)
    and the kernel must agree with a direct numpy recomputation."""

    def test_kernel_matches_direct_recompute(self, spark):
        import numpy as np

        from probabilistic_rs_spark.operators.dedup import (
            SIMHASH_BITS,
            with_simhash,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(i, f"alpha beta gamma delta epsilon w{i} w{i*7%5}") for i in range(50)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["simhash"]
            for r in with_simhash(df, "doc_id", "text", hash_fn="xxhash64").collect()
        }
        # recompute from the SAME JVM hashes, independent python vote
        rows = df.select(
            "doc_id",
            F.transform(
                F.split("text", r"\s+"),
                lambda w: F.call_function(
                    "shiftrightunsigned", F.xxhash64(w), F.lit(4)
                ),
            ).alias("h"),
        ).collect()
        for r in rows:
            hs = np.array(r["h"], dtype=np.int64).view(np.uint64)
            want = 0
            for b in range(SIMHASH_BITS):
                ones = int(((hs >> np.uint64(b)) & np.uint64(1)).sum())
                if 2 * ones > len(hs):
                    want |= 1 << b
            assert got[r["doc_id"]] == np.int64(np.uint64(want)).item()

    def test_close_texts_small_hamming_and_pairs(self, spark):
        from probabilistic_rs_spark.operators.dedup import simhash_pairs

        base = "the quick brown fox jumps over the lazy dog " * 8
        df = spark.createDataFrame(
            [(1, base), (2, base.replace("lazy", "sleepy", 1)),
             (3, "совершенно другой текст о чём-то ещё " * 10)],
            "doc_id long, text string",
        )
        pairs = {
            (r["id_a"], r["id_b"])
            for r in simhash_pairs(
                df, "doc_id", "text", max_hamming=6, hash_fn="xxhash64"
            ).collect()
        }
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_partitioning_invariance(self, spark):
        from probabilistic_rs_spark.operators.dedup import with_simhash

        df = spark.createDataFrame(
            [(i, f"w{i%11} w{i%7} w{i%5} filler words here") for i in range(200)],
            "doc_id long, text string",
        )
        a = {r["doc_id"]: r["simhash"]
             for r in with_simhash(df.coalesce(1), "doc_id", "text", hash_fn="xxhash64").collect()}
        b = {r["doc_id"]: r["simhash"]
             for r in with_simhash(df.repartition(13), "doc_id", "text", hash_fn="xxhash64").collect()}
        assert a == b


class TestCuratePipelineJob:
    """The spark-submit curation-pipeline entry (jobs/curate_pipeline.py):
    stages compose, write under --output, and resume past completed
    stages on re-run."""

    def test_end_to_end_and_resume(self, spark, tmp_path):
        import json

        from probabilistic_rs_spark.jobs import curate_pipeline

        out = str(tmp_path / "pipe")
        argv = [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out, "--sample-k", "5",
        ]
        assert curate_pipeline.main(argv) == 0
        with open(f"{out}/metrics.json") as f:
            m1 = json.load(f)
        assert m1["n_input"] == 500
        st = m1["stages"]
        assert st["annotated"]["rows"] == 500
        assert st["corpus"]["rows"] <= st["exact_reps"]["rows"]
        assert st["sample"]["rows"] <= 5 * 5  # k per language
        assert not any(v["resumed"] for v in st.values())
        # second run: every stage resumes from its _SUCCESS marker
        assert curate_pipeline.main(argv) == 0
        with open(f"{out}/metrics.json") as f:
            m2 = json.load(f)
        assert all(v["resumed"] for v in m2["stages"].values())
        assert {k: v["rows"] for k, v in m2["stages"].items()} == {
            k: v["rows"] for k, v in m1["stages"].items()
        }
        # the sampled corpus carries the annotation + cluster columns
        sample = spark.read.parquet(f"{out}/sample")
        for c in ("lang_id", "quality", "fingerprint", "n_cluster", "sample_rank"):
            assert c in sample.columns


class TestNorthstarJob:
    """The spark-submit north-star entry (jobs/northstar.py) driven as a
    REAL subprocess — its own SparkSession, the plain-script package
    fallback, the resumable per-unit checkpoint path, and the printed
    metrics contract."""

    def test_script_end_to_end_with_resume(self, spark, tmp_path):
        import json
        import os
        import subprocess
        import sys

        from probabilistic_rs_spark.datagen import pages_df

        src = str(tmp_path / "pages")
        pages_df(spark, 2000, partitions=4).write.parquet(src)
        out = str(tmp_path / "out")
        ck = str(tmp_path / "ck")
        cmd = [
            sys.executable, "probabilistic_rs_spark/jobs/northstar.py",
            "--input", src, "--output", out, "--checkpoint", ck,
            "--bloom-capacity", "10000",
        ]
        env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=900,
            cwd="/root/repo", env=env,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        m = json.loads(r.stdout.strip().splitlines()[-1])
        assert m["n_rows"] == 2000
        assert m["updates_per_sec"] > 0
        # all four outputs landed and are readable
        for sub in ("distinct_urls_lang_day", "heavy_hosts", "quantiles", "bloom_urls"):
            assert spark.read.parquet(f"{out}/{sub}").count() > 0
        # per-unit lineage exists (4 parquet units)
        ldir = os.path.join(ck, "lineage")
        recs1 = {fn: os.path.getmtime(os.path.join(ldir, fn))
                 for fn in os.listdir(ldir) if fn.endswith(".json")}
        assert len(recs1) == 4
        # re-run with the same checkpoint: every unit resumes (lineage
        # files untouched), job still succeeds end to end
        r2 = subprocess.run(
            cmd, capture_output=True, text=True, timeout=900,
            cwd="/root/repo", env=env,
        )
        assert r2.returncode == 0, r2.stderr[-3000:]
        recs2 = {fn: os.path.getmtime(os.path.join(ldir, fn))
                 for fn in os.listdir(ldir) if fn.endswith(".json")}
        assert recs2 == recs1


class TestSkewReportJob:
    """The spark-submit skew-report entry (jobs/skew_report.py) driven as
    a REAL subprocess: one scan composing theta + count sketch + MG into
    the auditable join-plan report (round 7)."""

    def test_script_writes_report(self, spark, tmp_path):
        import json
        import os
        import subprocess
        import sys

        from probabilistic_rs_spark.datagen import pages_df

        src = str(tmp_path / "pages")
        pages_df(spark, 2000, partitions=4).write.parquet(src)
        report_path = str(tmp_path / "report.json")
        cmd = [
            sys.executable, "probabilistic_rs_spark/jobs/skew_report.py",
            "--input", src, "--key", "host", "--derive-host-from", "url",
            "--output", report_path,
        ]
        env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=900,
            cwd="/root/repo", env=env,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        line = json.loads(r.stdout.strip().splitlines()[-1])
        assert line["recommendation"] in ("broadcast", "salt", "shuffle")
        with open(report_path) as f:
            rep = json.load(f)
        assert rep["n"] == 2000
        assert 0 < rep["n_distinct"] <= 2000
        assert rep["f2"] >= rep["n"]  # F2 >= N always (counts >= 1)
        assert rep["skew_ratio"] >= 1.0 - 1e-6
        assert rep["top_keys"] and all(
            t["est_count"] >= 1 for t in rep["top_keys"]
        )
        assert rep["recommendation"] == line["recommendation"]
        # atomic write: no .tmp remnant
        assert not os.path.exists(report_path + ".tmp")
