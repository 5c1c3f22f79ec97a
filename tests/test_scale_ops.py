"""Corpus-curation operators: dedup, similarity search, text stats,
multimodal plumbing, streaming ingest."""

import math

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import dedup, multimodal, similarity, textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


class TestDedup:
    def test_exact_dedup_planted(self, spark):
        rows = [(0, "The quick brown fox"), (1, "the  quick   BROWN fox"),
                (2, "something else"), (3, "The quick brown fox")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["survivor_id"]: r["dup_count"]
               for r in dedup.exact_dedup(df).collect()}
        # 0,1,3 normalize identically -> one group, survivor 0.
        assert out == {0: 3, 2: 1}

    @pytest.mark.parametrize("mode", ["xxhash64", "md5", "poly"])
    def test_minhash_lsh_pairs(self, spark, mode):
        base = ("spark shuffles data between stages when wide dependencies "
                "require repartitioning across the cluster nodes")
        near = base.replace("cluster", "compute")
        far = "completely different content about cooking pasta at home"
        df = spark.createDataFrame(
            [(0, base), (1, near), (2, far)], ["doc_id", "text"])
        pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in dedup.minhash_lsh_pairs(
                     df, threshold=0.5, hash_mode=mode).collect()}
        assert (0, 1) in pairs
        # The verify stage is hash-independent: jaccard is exact in
        # every mode.
        assert pairs[(0, 1)] > 0.6
        assert (0, 2) not in pairs and (1, 2) not in pairs

    def test_simhash_pairs(self, spark):
        base = ("spark shuffles data between stages when wide dependencies "
                "require repartitioning across the cluster nodes and tasks")
        near = base.replace("tasks", "executors")
        far = "totally unrelated short string"
        df = spark.createDataFrame(
            [(0, base), (1, near), (2, far)], ["doc_id", "text"])
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in dedup.simhash_pairs(df, max_hamming=6).collect()}
        assert (0, 1) in pairs
        assert (0, 2) not in pairs

    def test_ngram_jaccard_on_documents(self, docs):
        # Self-check: exact dup of a real doc must surface with jaccard 1.
        two = docs.limit(1).select("doc_id", "text")
        clone = two.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        pairs = dedup.ngram_jaccard_pairs(two.union(clone), threshold=0.99).collect()
        assert len(pairs) == 1
        assert pairs[0]["jaccard"] == 1.0

    def test_ngram_duplicate_ids_emit_no_self_pairs(self, spark):
        """A duplicated input id (non-unique id_col) lands twice in one
        bucket; the generator's i<j combination would pair the copies
        with themselves — the output contract stays id_a < id_b, never
        id_a == id_b (a self-loop would corrupt dedup_resolve)."""
        t = "the quick brown fox jumps over the lazy dog " * 4
        df = spark.createDataFrame(
            [(0, t), (0, t), (1, t), (2, "something else entirely here")],
            ["doc_id", "text"])
        pairs = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
        assert all(r["id_a"] < r["id_b"] for r in pairs)
        # Exactly ONE output row — not just the right set: a duplicated
        # id must not fan the pair out through the verify joins either.
        assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]

    def test_ngram_default_recall_floor(self, spark):
        """The DEFAULT configuration must recover >= 0.9 of planted
        pairs sitting AT its own advertised threshold (r4 ask: the r3
        fixed p=6 silently dropped ~18% of J=0.5 pairs). anchor_perms
        is now derived from the threshold for >= 0.95 design recall."""
        import hashlib

        from ocr_spark.operators.dedup import (_py_ngram_jaccard,
                                               derive_anchor_perms)

        assert derive_anchor_perms(0.5, 2) == 11
        assert derive_anchor_perms(0.7, 2) == 5
        assert derive_anchor_perms(0.9, 2) == 2
        # Degenerate thresholds neither crash nor explode (r4 review):
        # the derivation caps at 64 anchors.
        assert derive_anchor_perms(0.0, 2) == 64
        assert derive_anchor_perms(0.05, 2) == 64
        assert derive_anchor_perms(1.0, 2) == 1
        assert derive_anchor_perms(0.5, 2, target_recall=1.0) <= 64

        def hx(seed: str, n: int) -> str:
            out = ""
            i = 0
            while len(out) < n:
                out += hashlib.md5(f"{seed}:{i}".encode()).hexdigest() + " "
                i += 1
            return out[:n].strip()

        jac = _py_ngram_jaccard(8)
        rows, truth = [], []
        for i in range(150):
            base = hx(f"base{i}", 240)
            # Shared 164-char prefix, fresh tail -> J ~ 0.507 in
            # 8-gram space: threshold-level, not comfortably above it.
            var = (base[:164] + hx(f"tail{i}", 240 - 164))[:240]
            j = jac(base, var)
            rows += [(2 * i, base), (2 * i + 1, var)]
            if j >= 0.5:
                truth.append((2 * i, 2 * i + 1))
        assert len(truth) >= 100  # the construction plants J>=0.5 pairs
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {(r["id_a"], r["id_b"]) for r in
               dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()}
        recall = sum(1 for p in truth if p in got) / len(truth)
        assert recall >= 0.9, f"default-config recall {recall:.3f}"

    def test_exact_dedup_scales_on_documents(self, docs):
        out = dedup.exact_dedup(docs)
        assert out.agg(F.sum("dup_count")).first()[0] == docs.count()

    def test_minhash_hot_bucket_cap(self, spark):
        """A degenerate cluster (thousands of identical docs -> every
        band bucket hot) must NOT produce a quadratic candidate set; a
        planted near-pair outside the cluster must still surface."""
        base = ("spark shuffles data between stages when wide dependencies "
                "require repartitioning across the cluster nodes")
        near = base.replace("cluster", "compute")
        boiler = "lorem ipsum boilerplate footer text appears everywhere"
        rows = [(0, base), (1, near)] + [(100 + i, boiler) for i in range(4000)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        pairs = dedup.minhash_lsh_pairs(df, threshold=0.5, max_bucket=100).collect()
        ids = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 1) in ids
        # The 4000-doc clique would be ~8M pairs; the cap drops it
        # (exact_dedup owns identical docs).
        assert len(ids) == 1
        # Drop counters are observable, not silent.
        rep = dedup.bucket_report(
            df.select("doc_id",
                      dedup.shingles(F.col("text"), 8).alias("sh")).select(
                "doc_id",
                dedup.minhash_signature_from_hashes(
                    dedup.shingle_hashes(F.col("sh")), 32).alias("mh")
            ).select("doc_id", F.xxhash64(F.concat_ws(
                ",", F.slice("mh", 1, 4))).alias("band_hash")),
            ["band_hash"], 100).first()
        assert rep["n_hot_buckets"] >= 1
        assert rep["rows_dropped"] >= 4000

    def test_ngram_popular_band_bounded_without_dropping_pair(self, spark):
        """r3 blocking rework: a popular length band (hundreds of
        same-length docs with DIFFERENT content) must not go all-pairs —
        the anchor key (min permuted shingle hash) splits it — and must
        not drop the planted near-pair that lives inside the band."""
        import hashlib

        def hx(s):
            return hashlib.md5(s.encode()).hexdigest()

        # All docs are EXACTLY 98 normalized chars -> one length band;
        # filler content is hash-derived so shingle sets (and thus
        # anchors) are distinct doc to doc.
        base = " ".join(hx(f"b{j}") for j in range(3))
        near = base[:-6] + "zzzzzz"  # same band, jaccard ~0.75
        filler = [(100 + i, " ".join(hx(f"f{i}{j}") for j in range(3)))
                  for i in range(600)]
        df = spark.createDataFrame([(0, base), (1, near)] + filler,
                                   ["doc_id", "text"])
        pairs, rep = dedup.ngram_jaccard_pairs(df, threshold=0.5,
                                               max_bucket=50,
                                               return_report=True)
        ids = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (0, 1) in ids  # anchor blocking kept the true pair
        r = rep.first()
        # Distinct content -> no composite bucket goes hot even with a
        # tiny cap: the band alone would be one 600+-doc bucket.
        assert r["max_bucket_size"] <= 50
        assert r["rows_dropped"] == 0

    def test_ngram_degenerate_clique_capped_with_report(self, spark):
        """Identical docs share band AND anchors -> one hot composite
        bucket; the cap drops it (exact_dedup owns identical docs) and
        the report says so."""
        boiler = "lorem ipsum boilerplate footer text appears everywhere"
        rows = [(i, boiler) for i in range(2000)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        pairs, rep = dedup.ngram_jaccard_pairs(df, threshold=0.5,
                                               max_bucket=100,
                                               return_report=True)
        assert pairs.count() == 0
        r = rep.first()
        assert r["n_hot_buckets"] >= 1
        assert r["rows_dropped"] >= 2000

    def test_minhash_return_report(self, spark):
        boiler = "identical boilerplate body repeated across the corpus"
        df = spark.createDataFrame([(i, boiler) for i in range(500)],
                                   ["doc_id", "text"])
        pairs, rep = dedup.minhash_lsh_pairs(df, max_bucket=50,
                                             return_report=True)
        assert pairs.count() == 0
        r = rep.first()
        assert r["n_hot_buckets"] >= 1 and r["rows_dropped"] >= 500

    def test_simhash_packed_equals_unpacked(self, docs):
        """The 4-lane-packed vote accumulation must produce the exact
        fingerprint of the one-aggregate-per-bit form on real docs."""
        from pyspark.sql import functions as F
        both = docs.limit(64).select(
            dedup._simhash_packed(dedup.token_hashes(F.col("text"))).alias("p"),
            dedup._simhash_unpacked(dedup.token_hashes(F.col("text"))).alias("u"))
        assert both.filter(F.col("p") != F.col("u")).count() == 0

    def test_simhash_hot_bucket_cap(self, spark):
        base = ("spark shuffles data between stages when wide dependencies "
                "require repartitioning across the cluster nodes and tasks")
        near = base.replace("tasks", "executors")
        boiler = "identical boilerplate body"
        rows = [(0, base), (1, near)] + [(100 + i, boiler) for i in range(4000)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        pairs = {(r["id_a"], r["id_b"])
                 for r in dedup.simhash_pairs(df, max_hamming=6,
                                              max_bucket=100).collect()}
        assert (0, 1) in pairs
        assert len(pairs) == 1


class TestDedupResolve:
    """pairs -> connected components -> survivor -> filtered corpus."""

    def _pairs(self, spark, edges):
        return spark.createDataFrame(edges, ["id_a", "id_b"])

    def test_planted_three_components(self, spark):
        # {0,1,2} triangle, {10,11} edge, {20,21,22,23} via a path.
        edges = [(0, 1), (1, 2), (0, 2), (10, 11),
                 (20, 21), (21, 22), (22, 23)]
        out, stats = dedup.dedup_resolve(self._pairs(spark, edges),
                                         return_stats=True)
        rows = {r["doc_id"]: (r["cluster"], r["keep"])
                for r in out.collect()}
        assert rows == {0: (0, True), 1: (0, False), 2: (0, False),
                        10: (10, True), 11: (10, False),
                        20: (20, True), 21: (20, False),
                        22: (20, False), 23: (20, False)}
        assert stats["converged"]
        assert stats["iterations"] <= 4

    def test_chain_converges_logarithmically(self, spark):
        # A 64-vertex path is the worst diameter shape: pointer
        # jumping must resolve it in O(log n) rounds, not 64.
        edges = [(i, i + 1) for i in range(63)]
        out, stats = dedup.dedup_resolve(self._pairs(spark, edges),
                                         return_stats=True)
        rows = out.collect()
        assert all(r["cluster"] == 0 for r in rows)
        assert sum(r["keep"] for r in rows) == 1
        assert stats["converged"]
        assert stats["iterations"] <= 8, stats

    def test_long_chain_resolves_logarithmically(self, spark):
        """64x the chain test above: a 4,096-vertex path (diameter
        4,095) still converges in ~log2(n) rounds (13 measured; naive
        propagation would need 4,095). Pins the pointer-jumping
        guarantee at a pair count where O(diameter) behavior would be
        unmissable — a 50k-vertex/120k-edge random graph resolves in
        8 rounds under the same mechanism (probe burned 2026-08-18)."""
        edges = [(i, i + 1) for i in range(4095)]
        out, stats = dedup.dedup_resolve(
            self._pairs(spark, edges).repartition(8), return_stats=True)
        assert stats["converged"]
        assert stats["iterations"] <= 15, stats
        rows = out.collect()
        assert len(rows) == 4096
        assert all(r["cluster"] == 0 for r in rows)
        assert sum(r["keep"] for r in rows) == 1

    def test_quality_survivor_and_singletons(self, spark):
        docs = spark.createDataFrame(
            [(0, 0.2), (1, 0.9), (2, 0.5), (7, 0.1)],
            ["doc_id", "quality"])
        out = dedup.dedup_resolve(self._pairs(spark, [(0, 1), (1, 2)]),
                                  docs=docs, quality_col="quality")
        rows = {r["doc_id"]: (r["cluster"], r["keep"])
                for r in out.collect()}
        # Max quality wins inside the cluster; 7 is untouched ->
        # singleton keep.
        assert rows == {0: (0, False), 1: (0, True), 2: (0, False),
                        7: (7, True)}

    def test_apply_shrinks_corpus(self, spark):
        docs = spark.createDataFrame(
            [(i, f"text {i}") for i in range(6)], ["doc_id", "text"])
        resolved = dedup.dedup_resolve(
            self._pairs(spark, [(0, 1), (3, 4)]), docs=docs)
        kept = dedup.dedup_apply(docs, resolved)
        assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2, 3, 5]

    def test_resolve_empty_pairs_all_singletons(self, spark):
        docs = spark.createDataFrame([(i, f"t{i}") for i in range(4)],
                                     ["doc_id", "text"])
        empty = spark.createDataFrame([], "id_a long, id_b long")
        out = dedup.dedup_resolve(empty, docs=docs).collect()
        assert {(r["doc_id"], r["cluster"], r["keep"]) for r in out} \
            == {(i, i, True) for i in range(4)}
        assert dedup.dedup_apply(docs, dedup.dedup_resolve(
            empty, docs=docs)).count() == 4

    def test_resolve_invariants_on_random_graph(self, spark):
        """Structural invariants on a seeded random graph: the output
        covers exactly the vertex set (plus singletons from docs),
        every cluster label is the min id of its members, and exactly
        one keeper exists per cluster."""
        import random
        rng = random.Random(20260818)
        edges = [(rng.randrange(60), rng.randrange(60))
                 for _ in range(80)]
        edges = [(a, b) for a, b in edges if a != b]
        out = dedup.dedup_resolve(self._pairs(spark, edges)).collect()
        vertices = {v for e in edges for v in e}
        assert {r["doc_id"] for r in out} == vertices
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r["cluster"], []).append(r)
        # Python union-find ground truth.
        parent = {v: v for v in vertices}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        truth = {}
        for v in vertices:
            truth.setdefault(find(v), set()).add(v)
        expect = {min(members): members for members in truth.values()}
        for cluster, rows in by_cluster.items():
            assert cluster == min(r["doc_id"] for r in rows)
            assert {r["doc_id"] for r in rows} == expect[cluster]
            assert sum(r["keep"] for r in rows) == 1

    def test_line_dedup_reconstructs_when_nothing_hot(self, spark):
        """With no hot lines the operator is the identity on text —
        including empty lines, trailing newlines, in-doc duplicates,
        and whitespace-only lines (the ordered-reassembly round trip)."""
        docs = [
            (0, "first unique line zero\n\nsecond after an empty line"),
            (1, "trailing newline doc ends here\n"),
            (2, "same line twice in one doc\nsame line twice in one doc"),
            (3, "   \nonly whitespace above and tabs\t\nbelow"),
            (4, ""),
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {r["doc_id"]: (r["text"], r["n_lines_removed"])
               for r in textstats.line_dedup(df).collect()}
        for i, text in docs:
            assert got[i] == (text, 0)

    def test_line_dedup_idempotent(self, spark):
        """Applying line_dedup to its own output changes nothing: the
        hot lines are gone, so no remaining line exceeds the doc-freq
        threshold."""
        boiler = "corpus boilerplate line appearing everywhere"
        rows = [(i, f"{boiler}\nkeep line number {i}\n{boiler}")
                for i in range(8)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        once = textstats.line_dedup(df, max_doc_freq=5)\
            .select("doc_id", "text")
        twice = textstats.line_dedup(once, max_doc_freq=5)\
            .select("doc_id", "text")
        assert once.exceptAll(twice).count() == 0
        assert twice.exceptAll(once).count() == 0

    def test_end_to_end_minhash_resolve_apply(self, spark):
        """The REAL pipeline: near-identical variants -> minhash pairs
        -> resolve -> apply leaves exactly one survivor per clique."""
        import hashlib
        rows = []
        for g in range(5):
            # Hash-derived group bodies: cross-group Jaccard ~ 0,
            # within-group ~ 0.93 (a short per-variant suffix).
            body = " ".join(hashlib.md5(f"g{g}:{j}".encode()).hexdigest()
                            for j in range(6))
            for v in range(3):
                rows.append((g * 10 + v, body + f" variant {v}"))
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
        resolved = dedup.dedup_resolve(pairs, docs=docs)
        kept = sorted(r["doc_id"]
                      for r in dedup.dedup_apply(docs, resolved).collect())
        assert kept == [0, 10, 20, 30, 40]
        clusters = {r["doc_id"]: r["cluster"] for r in resolved.collect()}
        assert all(clusters[g * 10 + v] == g * 10
                   for g in range(5) for v in range(3))


class TestSimilarity:
    def test_cosine_topk_vs_numpy(self, spark, embeddings):
        import numpy as np
        queries = embeddings.filter(F.col("vec_id") < 3)
        got = similarity.cosine_topk(queries, embeddings, k=5).collect()
        rows = embeddings.collect()
        mat = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
               for r in rows}
        for qid in range(3):
            mine = sorted([r for r in got if r["query_id"] == qid],
                          key=lambda r: r["rank"])
            assert len(mine) == 5
            q = mat[qid]
            sims = {}
            for cid, v in mat.items():
                if cid == qid:
                    continue
                sims[cid] = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
            expect = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
            for m, (cid, s) in zip(mine, expect):
                assert m["corpus_id"] == cid
                assert abs(m["cos_sim"] - s) < 1e-9

    def test_pruned_topk_equals_unpruned(self, spark, embeddings):
        """The BLAS prune changes the plan (candidates-only shuffle),
        never the result: pruned and pure-expression plans agree
        row-for-row, including ranks."""
        queries = embeddings.filter(F.col("vec_id") < 8)
        a = similarity.cosine_topk(queries, embeddings, k=7, prune=True)
        b = similarity.cosine_topk(queries, embeddings, k=7, prune=False)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_pruned_topk_tie_break_on_massive_ties(self, spark):
        """A corpus of identical vectors ties every cosine: the prune's
        per-batch (-cos, corpus_id) ordering must deliver the same
        min-id winners as the exact window, not an arbitrary subset."""
        v = [0.3, -0.4, 0.5, 0.1]
        rows = [(i, v) for i in range(200)] + [(1000, [0.3, -0.4, 0.5, 0.1])]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        q = spark.createDataFrame([(1000, v)], ["vec_id", "embedding"])
        got = similarity.cosine_topk(q, df, k=5).orderBy("rank").collect()
        assert [r["corpus_id"] for r in got] == [0, 1, 2, 3, 4]

    def test_pruned_topk_string_ids_fall_back(self, spark):
        """Non-integer ids can't ride the prune's long schema: the
        operator silently uses the pure-expression plan and still
        answers correctly."""
        rows = [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        q = spark.createDataFrame([("q", [1.0, 0.05])],
                                  ["vec_id", "embedding"])
        got = similarity.cosine_topk(q, df, k=2).orderBy("rank").collect()
        assert [r["corpus_id"] for r in got] == ["a", "b"]

    def test_lsh_topk_is_subset_of_bruteforce_scores(self, spark, embeddings):
        queries = embeddings.filter(F.col("vec_id") < 5)
        ann = similarity.lsh_cosine_topk(queries, embeddings, k=3, planes=6)
        rows = ann.collect()
        assert rows, "LSH buckets should not all be singletons at 6 planes"
        # Every ANN score must equal the exact cosine for that pair.
        brute = similarity.cosine_topk(queries, embeddings, k=10**6)
        exact = {(r["query_id"], r["corpus_id"]): r["cos_sim"]
                 for r in brute.collect()}
        for r in rows:
            assert abs(exact[(r["query_id"], r["corpus_id"])] - r["cos_sim"]) < 1e-9

    def test_embedding_near_dup(self, spark):
        v = [0.5, 0.1, -0.2, 0.8]
        v2 = [x * 1.0001 for x in v]  # same direction -> cos ~ 1
        w = [-0.5, 0.9, 0.0, -0.1]
        df = spark.createDataFrame(
            [(0, v), (1, v2), (2, w)], ["vec_id", "embedding"])
        pairs = similarity.embedding_near_dup_pairs(df, threshold=0.99).collect()
        assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]

    def test_embedding_hot_bucket_cap(self, spark):
        """Thousands of identical vectors share every table's bucket; the
        cap must drop that clique while a distinct planted near-pair in
        quiet buckets survives."""
        v = [0.5, 0.1, -0.2, 0.8]
        v2 = [x * 1.0001 for x in v]
        boiler = [-0.3, 0.7, 0.4, -0.6]
        rows = [(0, v), (1, v2)] + [(100 + i, boiler) for i in range(2000)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        pairs = {(p["id_a"], p["id_b"])
                 for p in similarity.embedding_near_dup_pairs(
                     df, threshold=0.99, max_bucket=100).collect()}
        assert pairs == {(0, 1)}

    def test_multiprobe_buckets_shape(self, spark, embeddings):
        """probes=p emits 1+p buckets per (row, table): slot 0 is the
        base signature, each probe differs from it by exactly one bit
        (both hash-mode paths)."""
        base = embeddings.limit(20).select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("v"))
        for mode in ("md5", "xxhash64"):
            plain = {(r["id"], r["table"]): r["bucket"] for r in
                     similarity._bucket_rows(base, "id", "v", 6, 3,
                                             mode).collect()}
            probed = similarity._bucket_rows(base, "id", "v", 6, 3,
                                             mode, probes=2).collect()
            per_key = {}
            for r in probed:
                per_key.setdefault((r["id"], r["table"]), []).append(
                    r["bucket"])
            assert all(len(v) == 3 for v in per_key.values())
            for key, buckets in per_key.items():
                assert plain[key] in buckets
                for b in buckets:
                    d = bin(b ^ plain[key]).count("1")
                    assert d <= 1

    def test_multiprobe_clamps_to_planes(self, spark, embeddings):
        """probes > planes clamps (only `planes` distinct 1-bit flips
        exist): both hash modes return planes+1 buckets per table
        instead of faulting (md5) or emitting dead buckets (xxhash64)."""
        base = embeddings.limit(5).select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("v"))
        for mode in ("md5", "xxhash64"):
            rows = similarity._bucket_rows(base, "id", "v", 4, 2, mode,
                                           probes=99).collect()
            assert len(rows) == 5 * 2 * (1 + 4)

    def test_multiprobe_recall_never_below_baseline(self, spark,
                                                    embeddings):
        """Query-side multi-probe only ADDS candidate buckets, so the
        top-k result set can only gain recall vs probes=0 (same planes/
        tables); corpus bucket rows stay one per table."""
        queries = embeddings.filter(F.col("vec_id") < 20)
        base = {(r["query_id"], r["corpus_id"]) for r in
                similarity.lsh_cosine_topk(
                    queries, embeddings, k=5, planes=8, tables=2)
                .collect()}
        probed = {(r["query_id"], r["corpus_id"]) for r in
                  similarity.lsh_cosine_topk(
                      queries, embeddings, k=5, planes=8, tables=2,
                      probes=8).collect()}
        exact = {(r["query_id"], r["corpus_id"]) for r in
                 similarity.cosine_topk(queries, embeddings, k=5)
                 .collect()}
        assert len(probed & exact) >= len(base & exact)
        assert len(probed) >= len(base)

    def test_pandas_buckets_equal_expression_buckets(self, spark, embeddings):
        """The BLAS fast path must produce bit-identical md5-family
        buckets to the Catalyst expression form."""
        base = embeddings.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("v"))
        fast = similarity._bucket_rows(base, "id", "v", 6, 3, "md5")
        slow = base.select(
            "id", F.explode(similarity._lsh_tables(
                F.col("v"), 6, 3, "md5")).alias("tb")
        ).select("id", "tb.table", "tb.bucket")
        assert fast.exceptAll(slow).count() == 0
        assert slow.exceptAll(fast).count() == 0

    def test_multi_table_lsh_recall_at_least_single_table(self, spark, embeddings):
        """Multi-table candidate union can only grow recall vs one table."""
        queries = embeddings.filter(F.col("vec_id") < 5)
        one = similarity.lsh_cosine_topk(queries, embeddings, k=3,
                                         planes=6, tables=1)
        four = similarity.lsh_cosine_topk(queries, embeddings, k=3,
                                          planes=6, tables=4)
        assert four.count() >= one.count()

    def test_lsh_ann_planted_recall_floor(self, spark, embeddings):
        """The tuned config (planes=8, tables=8) must hit >=0.9 recall@1
        on planted cos~0.95 neighbors — the near-dup regime sign-LSH
        serves. (The natural synthetic corpus has NO neighbor gap —
        top-10 cos ~0.32 vs bulk ~0 — where >=0.9 recall@10 requires
        candidate fraction >= 1 for ANY sign-LSH config: 1-(1-(1-θ/π)^p)^T
        with θ/π~0.40. bench.py reports that number for transparency;
        the operator's contract is high-cos retrieval.)"""
        import numpy as np
        from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                       StructField, StructType)
        rows = embeddings.select("vec_id", "embedding").collect()
        ids = np.array([r["vec_id"] for r in rows])
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        rng = np.random.default_rng(12345)  # deterministic planted set
        noise = rng.standard_normal(mat.shape)
        noise /= np.linalg.norm(noise, axis=1, keepdims=True)
        q = mat + 0.33 * noise  # cos(q_i, v_i) ~ 0.95
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        n_q = 200
        qdf = spark.createDataFrame(
            [(int(ids[i]) + 100000, q[i].tolist()) for i in range(n_q)],
            StructType([StructField("vec_id", LongType()),
                        StructField("embedding", ArrayType(DoubleType()))]))
        ann = similarity.lsh_cosine_topk(qdf, embeddings, k=1,
                                         planes=8, tables=8)
        got = {(r["query_id"], r["corpus_id"])
               for r in ann.select("query_id", "corpus_id").collect()}
        hits = sum(1 for i in range(n_q)
                   if (int(ids[i]) + 100000, int(ids[i])) in got)
        recall = hits / n_q
        assert recall >= 0.9, f"planted recall@1 {recall:.3f} below floor"

    def test_lsh_ann_return_report(self, spark, embeddings):
        out, rep = similarity.lsh_cosine_topk(
            embeddings.filter(F.col("vec_id") < 3), embeddings, k=3,
            planes=6, tables=2, return_report=True)
        assert out.count() > 0
        r = rep.first()
        assert r["n_buckets"] > 0 and r["rows_dropped"] == 0


class TestTextStats:
    def test_stats_vs_python_oracle(self, spark):
        text = "The quick brown fox, jumps over the lazy dog. The end!"
        df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
        r = textstats.document_stats(df).collect()[0]
        toks = text.lower().split()
        assert r["n_tokens"] == len(toks)
        sw = set(textstats.LANG_STOPWORDS["en"])
        # normalized text strips nothing but case/whitespace; punctuation
        # stays attached to tokens, as in the expression form.
        expected_ratio = sum(1 for t in toks if t in sw) / len(toks)
        assert abs(r["stopword_ratio"] - round(expected_ratio, 6)) < 1e-9
        assert r["lang_guess"] == "en"
        assert 0.0 <= r["quality"] <= 1.0
        import re as _re
        assert r["n_bpe_tokens"] == len(_re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", text))

    def test_lang_id_votes(self, spark):
        df = spark.createDataFrame(
            [(0, "el perro y la casa de un los del por"),
             (1, "the cat and the dog of a in is for"),
             (2, "zzz qqq xxx"),
             (3, "il gatto che sono del non questo anche più ha"),
             (4, "o gato do da em um não os mais foi"),
             (5, "het een van ik je niet op zijn maar ook")],
            ["doc_id", "text"])
        out = {r["doc_id"]: r["lang_guess"]
               for r in textstats.document_stats(df).collect()}
        assert out == {0: "es", 1: "en", 2: "und",
                       3: "it", 4: "pt", 5: "nl"}

    def test_lang_id_script_vote(self, spark):
        """Non-Latin scripts are identified by unicode script ranges
        BEFORE the Latin stopword vote: Japanese wins on kana share
        even though its text is majority Han; a Latin page with CJK
        sprinkles below threshold stays with the stopword vote."""
        df = spark.createDataFrame(
            [(0, "日本語のページ本文はここにあります"),          # kana+han
             (1, "这是一个完全中文的网页正文内容"),               # han only
             (2, "이 문서는 한국어로 작성되었습니다"),
             (3, "это страница на русском языке для теста"),
             (4, "هذه صفحة باللغة العربية للاختبار"),
             (5, "यह पृष्ठ हिंदी में लिखा गया है"),
             (6, "the quick brown fox 漢字 and the lazy dog of it")],
            ["doc_id", "text"])
        out = {r["doc_id"]: r["lang_guess"]
               for r in df.select("doc_id", textstats.lang_id(
                   F.col("text")).alias("lang_guess")).collect()}
        assert out == {0: "ja", 1: "zh", 2: "ko", 3: "ru",
                       4: "ar", 5: "hi", 6: "en"}

    def test_with_lang_guess_equals_lang_id(self, spark):
        """The column-landed fast path must agree with the Column form
        verdict-for-verdict: every script fixture, every Latin vote,
        ties, empties, and adversarial mixes."""
        rows = [(i, t) for i, t in enumerate([
            "el perro y la casa de un los del por",
            "the cat and the dog of a in is for",
            "zzz qqq xxx", "", "   ", None,
            "il gatto che sono del non questo anche piu ha",
            "het een van ik je niet op zijn maar ook",
            "日本語のページ本文はここにあります",
            "这是一个完全中文的网页正文内容",
            "이 문서는 한국어로 작성되었습니다",
            "это страница на русском языке для теста",
            "هذه صفحة باللغة العربية للاختبار",
            "यह पृष्ठ हिंदी में लिखा गया है",
            "the quick brown fox 漢字 and the lazy dog of it",
            "the la the la the la",          # cross-language tie text
            "de de de",                      # 'de' is a stopword in many
            "a \t b\n\nc  d",
        ])]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        slow = {r["doc_id"]: r["g"] for r in df.select(
            "doc_id", textstats.lang_id(F.col("text")).alias("g"))
            .collect()}
        fast = {r["doc_id"]: r["lang_guess"] for r in
                textstats.with_lang_guess(df, "text").collect()}
        assert fast == slow

    def test_repetition_stats_gopher_gates(self, spark):
        """Gopher repetition signals: duplicate-line spam fails the
        0.30 line gate, a bigram loop fails the 0.18 top-2-gram mass
        gate, clean prose passes both."""
        spam = "intro line 7" + "\nrepeated boiler line" * 3
        loop = "click here " * 10 + "unique 7"
        prose = ("the quick brown fox jumps over the lazy dog while "
                 "a calm river flows past the old stone bridge")
        df = spark.createDataFrame(
            [(0, spam), (1, loop), (2, prose)], ["doc_id", "text"])
        out = {r["doc_id"]: r
               for r in textstats.repetition_stats(df).collect()}
        assert out[0]["dup_line_frac"] == 0.5 and not out[0]["keep"]
        assert out[1]["top_bigram"] == "click here"
        assert out[1]["top_bigram_frac"] > 0.18 and not out[1]["keep"]
        assert out[2]["keep"]
        kept = textstats.gopher_quality_filter(df).collect()
        assert [r["doc_id"] for r in kept] == [2]

    def test_repetition_stats_edge_shapes(self, spark):
        """Empty and single-token docs produce zero signals, not
        nulls/crashes (the explode side is empty for them)."""
        df = spark.createDataFrame(
            [(0, ""), (1, "word"), (2, "a b")], ["doc_id", "text"])
        out = {r["doc_id"]: r
               for r in textstats.repetition_stats(df).collect()}
        assert out[0]["dup_line_frac"] == 0.0
        assert out[0]["top_bigram"] == "" and out[0]["top_bigram_frac"] == 0.0
        assert out[1]["top_bigram"] == ""
        assert out[2]["top_bigram"] == "a b"
        assert all(out[i]["keep"] for i in range(3))

    def test_repetition_full_gates_and_values(self, spark):
        """The FULL Gopher Table A1 suite: each planted pathology
        fails exactly its own gate family, with hand-computed
        fractions; clean prose and short ordinary docs pass."""
        line_spam = "a line\na line\na line\nunique tail"
        para_dup = "para one x\n\npara one x\n\nother paragraph"
        gram_loop = ("one two three four five six seven eight " * 4).strip()
        prose = ("the quick brown fox jumps over the lazy dog while "
                 "a calm river flows past the old stone bridge and "
                 "birds sing in bright morning air above green fields")
        # 25 varied tokens: a SINGLETON 4-gram here is ~0.17 of the
        # chars — must not trip the 0.16 gate (cnt >= 2 floor).
        short_ok = ("this is a perfectly ordinary document with varied "
                    "words and no repetition at all spanning enough "
                    "tokens to reach the gate floor")
        df = spark.createDataFrame(
            [(0, line_spam), (1, para_dup), (2, gram_loop), (3, prose),
             (4, short_ok), (5, ""), (6, None)],
            "doc_id long, text string")
        out = {r["doc_id"]: r
               for r in textstats.repetition_stats_full(df).collect()}
        # lines: 'a line'(6) x3 + 'unique tail'(11): dup chars 12/29.
        assert out[0]["dup_line_frac"] == 0.5
        assert out[0]["dup_line_char_frac"] == round(12 / 29, 6)
        assert not out[0]["keep"]
        # paragraphs: 'para one x'(10) x2 + 'other paragraph'(15).
        assert out[1]["dup_para_frac"] == round(1 / 3, 6)
        assert out[1]["dup_para_char_frac"] == round(10 / 35, 6)
        assert not out[1]["keep"]
        # 32-token loop of an 8-word phrase: every token is covered by
        # a duplicated n-gram for all n in 5..10.
        for n in range(5, 11):
            assert out[2][f"dup_{n}gram_char_frac"] == 1.0
        assert out[2]["top_2gram_frac"] > 0.20 and not out[2]["keep"]
        assert out[3]["keep"]
        assert out[4]["top_4gram_frac"] == 0.0 and out[4]["keep"]
        assert out[5]["keep"] and out[6]["keep"]  # empty/null: totality
        kept = textstats.gopher_repetition_filter_full(df).collect()
        assert sorted(r["doc_id"] for r in kept) == [3, 4, 5, 6]

    def test_repetition_full_overlap_union_coverage(self, spark):
        """Duplicate-n-gram coverage is the UNION of covered token
        positions — overlapping duplicate occurrences never count a
        character twice, and partial coverage is exact."""
        # 'alpha beta gamma delta epsilon' repeated twice with a
        # unique tail: the 5-gram dup covers tokens 1..10 only.
        txt = ("alpha beta gamma delta epsilon "
               "alpha beta gamma delta epsilon zulu")
        df = spark.createDataFrame([(0, txt)], "doc_id long, text string")
        r = textstats.repetition_stats_full(df).collect()[0]
        covered = len("alphabetagammadeltaepsilon") * 2
        total = covered + len("zulu")
        assert r["dup_5gram_char_frac"] == round(covered / total, 6)
        # No 6-gram repeats (the tail breaks the second window).
        assert r["dup_6gram_char_frac"] == 0.0

    def test_dedup_lines_in_doc(self, spark):
        """In-document repeats collapse to the first occurrence; blank
        structure and sub-floor short lines are exempt; cross-document
        sharing is NOT touched (that's line_dedup's job)."""
        boiler = "subscribe to our newsletter for updates"
        d0 = f"{boiler}\nunique first body line\n\n{boiler}\n--\n--"
        d1 = f"{boiler}\nanother document body"  # no in-doc repeat
        df = spark.createDataFrame([(0, d0), (1, d1), (2, None)],
                                   "doc_id long, text string")
        out = {r["doc_id"]: r
               for r in textstats.dedup_lines_in_doc(df).collect()}
        assert out[0]["text"] == \
            f"{boiler}\nunique first body line\n\n--\n--"
        assert out[0]["n_lines_removed"] == 1
        assert out[1]["text"] == d1 and out[1]["n_lines_removed"] == 0
        assert out[2]["text"] == "" and out[2]["n_lines_removed"] == 0

    def test_line_dedup_removes_corpus_boilerplate(self, spark):
        """A line shared by more than max_doc_freq documents vanishes
        from every document; unique lines and sub-floor short lines
        stay; the report carries the drop counters."""
        banner = "This website uses cookies to continue browsing"
        rows = [(i, f"{banner}\nunique content line for document {i}\nOK")
                for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out, report = textstats.line_dedup(df, max_doc_freq=5,
                                           return_report=True)
        got = {r["doc_id"]: r for r in out.collect()}
        for i in range(10):
            assert got[i]["text"] == \
                f"unique content line for document {i}\nOK"
            assert got[i]["n_lines_removed"] == 1
        rep = report.first()
        assert rep["n_hot_lines"] == 1
        assert rep["lines_removed"] == 10 and rep["docs_touched"] == 10

    def test_line_dedup_boundary_and_order(self, spark):
        """doc_freq == max_doc_freq is KEPT (strict >); intra-document
        repeats count one distinct doc; removal preserves the order of
        surviving lines."""
        shared = "shared across exactly five documents here"
        five = [(i, shared + "\ntail line " + str(i) * 10)
                for i in range(5)]
        intra = [(10, "repeated inside one single document\n"
                      "repeated inside one single document")]
        df = spark.createDataFrame(five + intra, ["doc_id", "text"])
        got = {r["doc_id"]: r["text"]
               for r in textstats.line_dedup(df, max_doc_freq=5)
               .collect()}
        for i in range(5):
            assert got[i].startswith(shared)
        assert got[10].count("repeated inside") == 2
        # Order preservation around removed lines.
        boiler = "corpus boilerplate line appearing everywhere"
        docs2 = [(i, f"{boiler}\nkeep A{i}\n{boiler}\nkeep B{i}")
                 for i in range(8)]
        df2 = spark.createDataFrame(docs2, ["doc_id", "text"])
        got2 = {r["doc_id"]: r for r in
                textstats.line_dedup(df2, max_doc_freq=5).collect()}
        assert got2[0]["text"] == "keep A0\nkeep B0"
        assert got2[0]["n_lines_removed"] == 2

    def test_fingerprint_stability(self, docs):
        fp = docs.select(textstats.fingerprint(F.col("text")).alias("fp"),
                         textstats.rolling_fingerprint(F.col("text")).alias("rfp"))
        row = fp.first()
        assert len(row["fp"]) == 32
        assert isinstance(row["rfp"], int)


def _real_jpeg():
    """A deterministic baseline 4:2:0 color JPEG payload."""
    import numpy as np
    from ocr_spark.textlib import jpegcodec as jc
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    return jc.encode_jpeg_baseline(img)


class TestMultimodal:
    def test_featurize_plumbing(self, spark):
        rows = [("m1", "image", b"\x00\x01\x02" * 100,
                 {"mime": "image/png", "width": 10, "height": 10, "duration_ms": None}),
                ("m2", "audio", b"\xff" * 64,
                 {"mime": "audio/wav", "width": None, "height": None, "duration_ms": 1000})]
        df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
        out = {r["media_id"]: r for r in
               multimodal.extract_features(df, num_partitions=2).collect()}
        assert out["m1"]["n_bytes"] == 300
        assert abs(sum(out["m1"]["features"]) - 1.0) < 1e-9
        assert out["m2"]["features"][-1] == 1.0  # all 0xff bytes -> last bin
        assert out["m1"]["featurizer"] == "byte_histogram_v1"

    def test_pixel_features_real_decode(self, spark):
        import numpy as np
        from ocr_spark.textlib import imagecodec as ic
        rng = np.random.RandomState(5)
        png = rng.randint(0, 256, size=(8, 6, 3), dtype=np.uint8)
        gray = rng.randint(0, 256, size=(4, 4), dtype=np.uint8)
        rows = [
            ("png", "image", ic.encode_png(png, filter_type=-1), None),
            ("interlaced", "image", ic.encode_png(gray, interlace=True), None),
            ("ppm", "image", b"P6\n2 2\n255\n" + bytes(12), None),
            ("corrupt", "image", b"\x00\x01\x02" * 50, None),
            ("jpeg", "image", b"\xff\xd8\xff\xe0 entropy-coded", None),
            ("jpeg_real", "image", _real_jpeg(), None),
        ]
        df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
        out = {r["media_id"]: r for r in
               multimodal.extract_pixel_features(df, num_partitions=2).collect()}
        # Decoded rows carry real dimensions and the pixel featurizer...
        assert (out["png"]["width"], out["png"]["height"],
                out["png"]["channels"]) == (6, 8, 3)
        assert out["png"]["featurizer"] == "pixel_stats_v1"
        assert out["png"]["decode_error"] is None
        # ...with feature values identical to a local decode.
        assert out["png"]["features"] == pytest.approx(ic.pixel_features(png))
        assert out["interlaced"]["features"] == pytest.approx(
            ic.pixel_features(gray))
        assert out["ppm"]["features"][:3] == [2.0, 2.0, 3.0]
        # Undecodable rows fall back per row, never poison the batch.
        assert out["corrupt"]["featurizer"] == "byte_histogram_v1"
        assert out["corrupt"]["width"] is None
        assert "ImageFormatError" in out["corrupt"]["decode_error"]
        assert "ImageFormatError" in out["jpeg"]["decode_error"]
        # a REAL baseline JPEG decodes in the kernel, exact vs local
        jr = out["jpeg_real"]
        assert (jr["width"], jr["height"], jr["channels"]) == (16, 16, 3)
        assert jr["featurizer"] == "pixel_stats_v1"
        from ocr_spark.textlib import jpegcodec as jc
        assert jr["features"] == pytest.approx(
            ic.pixel_features(jc.decode_jpeg(_real_jpeg())))

    def test_audio_features_real_decode(self, spark):
        import numpy as np
        from ocr_spark.textlib import avcodec as av
        rng = np.random.RandomState(3)
        samples = rng.randint(-32768, 32768, size=(800, 2))
        rows = [
            ("wav", "audio", av.encode_wav(samples, 8000), None),
            ("mp3", "audio", b"ID3\x04rest-of-an-mp3", None),
            ("junk", "audio", b"\x01\x02" * 40, None),
        ]
        df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
        out = {r["media_id"]: r for r in
               multimodal.extract_audio_features(df, num_partitions=2).collect()}
        wav = out["wav"]
        assert (wav["n_frames"], wav["channels"], wav["sample_rate"],
                wav["duration_ms"]) == (800, 2, 8000, 100)
        assert wav["featurizer"] == "audio_stats_v1"
        assert wav["features"] == pytest.approx(
            av.audio_features(samples.astype(np.int32), 8000))
        assert "NotImplementedError" in out["mp3"]["decode_error"]
        assert "MediaFormatError" in out["junk"]["decode_error"]
        assert out["junk"]["featurizer"] == "byte_histogram_v1"

    def test_video_frame_sampling(self, spark):
        import numpy as np
        from ocr_spark.textlib import avcodec as av
        # 9-frame 4x4 video with per-frame luma ramp
        planes = [(np.full((4, 4), 16 + 20 * i, np.uint8),
                   np.full((2, 2), 128, np.uint8),
                   np.full((2, 2), 128, np.uint8)) for i in range(9)]
        y4m = av.encode_y4m(planes, 4, 4)
        rows = [("vid", "video", y4m, None),
                ("mp4", "video", b"\x00\x00\x00\x18ftypmp42....", None)]
        df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
        out = multimodal.sample_video_frames(df, every_n=4,
                                             num_partitions=2).collect()
        # mp4 contributes no rows (codec gated); y4m samples frames 0,4,8
        assert sorted((r["media_id"], r["frame_idx"]) for r in out) == [
            ("vid", 0), ("vid", 4), ("vid", 8)]
        frame0 = [r for r in out if r["frame_idx"] == 0][0]
        assert (frame0["width"], frame0["height"]) == (4, 4)
        # limited-range black frame -> zero means
        assert frame0["features"][3:6] == [0.0, 0.0, 0.0]

    def test_decode_dispatch_gates(self):
        from ocr_spark.textlib import imagecodec as ic
        # Baseline JPEG decodes natively now; corrupt JPEG bytes are a
        # format error (progressive is the remaining gated process).
        with pytest.raises(ic.ImageFormatError):
            multimodal.decode_image(b"\xff\xd8\xff\xe0 not a real jpeg")
        with pytest.raises(ic.ImageFormatError):
            multimodal.decode_image(b"px")
        # The synth fake-PNG payload has a real PNG signature but no
        # valid chunks — it must fail decode (and thus fall back), not
        # be misread as pixels.
        from ocr_spark.sources import payload as pl
        with pytest.raises(ic.ImageFormatError):
            multimodal.decode_image(pl.make_image_payload(pl.make_image(["x"])))


class TestStreaming:
    def test_available_now_ingest(self, spark, tmp_path):
        from ocr_spark import schemas
        from ocr_spark.sources import synth
        from ocr_spark.streaming.jobs import stream_extract

        in_dir = str(tmp_path / "in")
        rows = synth.generate_rows(24)
        spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA) \
            .repartition(3).write.parquet(in_dir)

        table = stream_extract(spark, in_dir, str(tmp_path / "tbl"),
                               str(tmp_path / "ckpt"))
        out = table.read(spark)
        assert out.count() == 24
        assert out.select("url").distinct().count() == 24

        # Re-run the stream over the same dir: checkpoint + anti-join
        # keep it exactly-once.
        table2 = stream_extract(spark, in_dir, str(tmp_path / "tbl"),
                                str(tmp_path / "ckpt"))
        assert table2.read(spark).count() == 24

    def test_available_now_ingest_webtext(self, spark, tmp_path):
        """The same incremental job covers the webtext axis: streamed
        web pages run the DOM extractor and commit their article text
        plus spans, exactly-once across redelivery."""
        import datetime as dt

        from ocr_spark import schemas
        from ocr_spark.sources import synth
        from ocr_spark.streaming.jobs import stream_extract

        in_dir = str(tmp_path / "win")
        ts = dt.datetime(2026, 3, 1)
        rows = [dict(synth.make_web_row(i), warc_ts=ts) for i in range(18)]
        spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA) \
            .repartition(3).write.parquet(in_dir)

        table = stream_extract(spark, in_dir, str(tmp_path / "wtbl"),
                               str(tmp_path / "wckpt"))
        out = table.read(spark)
        got = {r["url"]: r for r in out.collect()}
        assert len(got) == 18
        assert all(r["doc_type"] == "webpage" for r in got.values())
        assert all(r["extracted_text"] for r in got.values())
        assert all(r["webpage"]["n_blocks"] >= 1 for r in got.values())

        table2 = stream_extract(spark, in_dir, str(tmp_path / "wtbl"),
                                str(tmp_path / "wckpt"))
        assert table2.read(spark).count() == 18

    def test_stream_domain_cap_state_across_microbatches(self, spark,
                                                         tmp_path):
        """Custom stateful operator (applyInPandasWithState): the
        per-host admission counter persists across micro-batches AND
        across drains — a host that used its budget stays closed."""
        import datetime as dt

        from ocr_spark import schemas
        from ocr_spark.streaming.jobs import stream_domain_cap

        in_dir = str(tmp_path / "dc_in")
        ts = dt.datetime(2026, 3, 1)
        # 4 files -> 4 micro-batches: big.com sends 2 docs per file,
        # small.org sends 1 in files 0 and 3.
        for i in range(4):
            rows = [(f"https://big.com/{i}/a", ts, None, f"ba{i}", "en", None),
                    (f"https://big.com/{i}/b", ts, None, f"bb{i}", "en", None)]
            if i in (0, 3):
                rows.append((f"https://small.org/{i}", ts, None,
                             f"s{i}", "en", None))
            spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA) \
                .coalesce(1).write.mode("append").parquet(in_dir)

        out = stream_domain_cap(spark, in_dir, str(tmp_path / "dc_out"),
                                str(tmp_path / "dc_ck"), max_per_domain=3,
                                max_files_per_trigger=1)
        urls = sorted(r["url"] for r in out.collect())
        big = [u for u in urls if "big.com" in u]
        small = [u for u in urls if "small.org" in u]
        # big.com admitted exactly 3 (first-arrival order: both file-0
        # docs + one of file 1); small.org under cap passes fully.
        assert len(big) == 3
        assert big[:2] == ["https://big.com/0/a", "https://big.com/0/b"]
        assert small == ["https://small.org/0", "https://small.org/3"]

        # A LATER drain with new files: state survives the restart —
        # big.com stays closed, a fresh host gets its own budget.
        rows = [("https://big.com/9/z", ts, None, "late", "en", None),
                ("https://new.net/1", ts, None, "n", "en", None)]
        spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(in_dir)
        out2 = stream_domain_cap(spark, in_dir, str(tmp_path / "dc_out"),
                                 str(tmp_path / "dc_ck"), max_per_domain=3,
                                 max_files_per_trigger=1)
        urls2 = sorted(r["url"] for r in out2.collect())
        assert "https://big.com/9/z" not in urls2
        assert "https://new.net/1" in urls2
        assert len([u for u in urls2 if "big.com" in u]) == 3  # unchanged

        with pytest.raises(ValueError, match=">= 1"):
            stream_domain_cap(spark, in_dir, "x", "y", max_per_domain=0)

    def test_stream_exact_dedup_across_microbatches(self, spark, tmp_path):
        """Stateful streaming dedup: duplicates landing in DIFFERENT
        micro-batches (maxFilesPerTrigger=2 over 4 files) are dropped
        by the state store, first occurrence wins, batch-identical
        hash semantics."""
        import datetime as dt

        from ocr_spark import schemas
        from ocr_spark.streaming.jobs import stream_exact_dedup

        in_dir = str(tmp_path / "sd_in")
        ts = dt.datetime(2026, 3, 1)
        texts = ["alpha doc body", "beta doc body",
                 "ALPHA   doc body",  # normalizes equal to file 1's
                 "gamma doc body"]
        for i, t in enumerate(texts):
            spark.createDataFrame(
                [(f"https://s.local/{i}", ts, None, t, "en", None)],
                schema=schemas.INPUT_SCHEMA
            ).coalesce(1).write.mode("append").parquet(in_dir)

        out = stream_exact_dedup(spark, in_dir, str(tmp_path / "sd_out"),
                                 str(tmp_path / "sd_ck"),
                                 max_files_per_trigger=2)
        rows = out.collect()
        assert len(rows) == 3  # the normalized duplicate is dropped
        hashes = [r["content_hash"] for r in rows]
        assert len(set(hashes)) == 3
        # Batch parity: the same hash expression as exact_dedup.
        from ocr_spark.operators.dedup import exact_dedup
        batch = exact_dedup(
            spark.read.schema(schemas.INPUT_SCHEMA).parquet(in_dir)
            .select("url", "text"), text_col="text", id_col="url")
        assert {r["content_hash"] for r in batch.collect()} == set(hashes)

        # A no-op drain (checkpoint already covers every file) returns
        # an empty frame rather than crashing on the unread sink.
        again = stream_exact_dedup(spark, in_dir,
                                   str(tmp_path / "sd_out2"),
                                   str(tmp_path / "sd_ck"),  # same ckpt
                                   max_files_per_trigger=2)
        assert again.count() == 0

    def test_stream_exact_dedup_null_text_parity(self, spark, tmp_path):
        """NULL text and empty text are DIFFERENT dedup groups, exactly
        as in batch exact_dedup (NULL hashes NULL; NULL keys group
        together): one NULL-text survivor + one ''-text survivor."""
        import datetime as dt

        from ocr_spark import schemas
        from ocr_spark.streaming.jobs import stream_exact_dedup

        in_dir = str(tmp_path / "sn_in")
        ts = dt.datetime(2026, 3, 1)
        spark.createDataFrame(
            [("https://n.local/0", ts, None, None, "en", None),
             ("https://n.local/1", ts, None, None, "en", None),
             ("https://n.local/2", ts, None, "", "en", None)],
            schema=schemas.INPUT_SCHEMA
        ).coalesce(1).write.parquet(in_dir)
        out = stream_exact_dedup(spark, in_dir, str(tmp_path / "sn_out"),
                                 str(tmp_path / "sn_ck"))
        rows = out.collect()
        assert len(rows) == 2
        assert {r["text"] for r in rows} == {None, ""}

    def test_stream_exact_dedup_watermark_bounded(self, spark, tmp_path):
        """The watermark variant still dedups duplicates within the
        horizon (state stays bounded by eviction)."""
        import datetime as dt

        from ocr_spark import schemas
        from ocr_spark.streaming.jobs import stream_exact_dedup

        in_dir = str(tmp_path / "sw_in")
        ts = dt.datetime(2026, 3, 1)
        # The fourth row has NULL warc_ts: it must still flow through
        # (assigned processing time), never be watermark-deleted.
        rows = [("https://w.local/0", ts, None, "same body", "en", None),
                ("https://w.local/1", ts, None, "same body", "en", None),
                ("https://w.local/2", ts, None, "other body", "en", None),
                ("https://w.local/3", None, None, "null ts body", "en",
                 None)]
        for r in rows:
            spark.createDataFrame([r], schema=schemas.INPUT_SCHEMA)\
                .coalesce(1).write.mode("append").parquet(in_dir)
        out = stream_exact_dedup(spark, in_dir, str(tmp_path / "sw_out"),
                                 str(tmp_path / "sw_ck"),
                                 watermark_delay="1 hour")
        got = out.collect()
        assert len(got) == 3
        assert "_evt" not in out.columns
        assert {r["text"] for r in got} == {"same body", "other body",
                                            "null ts body"}

    def test_stream_curate_gates_and_cross_batch_dedup(self, spark,
                                                       tmp_path):
        """Curation-on-ingest: the Gopher gate, the language gate, and
        exact content dedup all apply per micro-batch with committed-
        state anti-joins, so two drains over a growing dir land exactly
        the batch-curated survivor set, with per-gate counters."""
        import datetime as dt

        from ocr_spark import schemas
        from ocr_spark.sources.snapshot import SnapshotTable
        from ocr_spark.streaming.jobs import stream_curate

        in_dir = str(tmp_path / "cu_in")
        ckpt = str(tmp_path / "cu_ck")
        root = str(tmp_path / "cu_tbl")
        ts = dt.datetime(2026, 3, 1)
        good = ("the quick brown fox jumps over the lazy dog and then "
                "walks away into the quiet evening field with no fuss")
        good2 = ("a second perfectly ordinary english document that is "
                 "not a duplicate of the first one in any way at all")
        spam = "\n".join(["buy cheap widgets now"] * 30)  # dup_line gate
        # Non-repetitive (a *3 repeat would trip the Gopher top-bigram
        # gate first and never reach the language gate).
        russian = ("съешь же ещё этих мягких французских булок да выпей "
                   "чаю пока утро тихое и никто не мешает думать о море "
                   "и далёких городах где живут совсем другие люди")

        def land(url, text):
            spark.createDataFrame(
                [(url, ts, None, text, "en", None)],
                schema=schemas.INPUT_SCHEMA
            ).coalesce(1).write.mode("append").parquet(in_dir)

        # Wave 1: good, quality-fail, non-English, duplicate-of-good.
        land("https://c.local/d0", good)
        land("https://c.local/d1", spam)
        land("https://c.local/d2", russian)
        land("https://c.local/d3", good)  # same content, other url
        table = stream_curate(spark, in_dir, root, ckpt,
                              keep_langs=("en",), max_files_per_trigger=2)
        wave1 = table.read(spark)
        assert wave1.count() == 1  # only one copy of `good` survives
        survivor = wave1.first()
        assert survivor["url"] in ("https://c.local/d0",
                                   "https://c.local/d3")
        assert survivor["lang_guess"] == "en"

        # Wave 2: a CROSS-batch duplicate (case-variant of `good` —
        # fingerprint normalizes), a new good doc, and a redelivered
        # url.
        land("https://c.local/d4", good.upper())
        land("https://c.local/d5", good2)
        land(survivor["url"], good)  # redelivery
        table = stream_curate(spark, in_dir, root, ckpt,
                              keep_langs=("en",), max_files_per_trigger=2)
        out = table.read(spark)
        assert out.count() == 2
        texts = {r["text"] for r in out.collect()}
        assert good in texts and good2 in texts

        # Batch parity: the same gates applied globally keep the same
        # content set.
        from ocr_spark.operators.dedup import exact_dedup
        from ocr_spark.operators.textstats import (gopher_quality_filter,
                                                   lang_id)
        everything = spark.read.schema(schemas.INPUT_SCHEMA) \
            .parquet(in_dir)
        batch = gopher_quality_filter(everything, text_col="text",
                                      id_col="url")
        batch = batch.withColumn("lg", lang_id(F.col("text"))) \
            .filter(F.col("lg") == "en")
        batch = exact_dedup(batch.select("url", "text"),
                            text_col="text", id_col="url")
        assert ({r["content_hash"] for r in batch.collect()}
                == {r["content_hash"] for r in out.collect()})

        # Counters: never-silent, and they reconcile exactly.
        m = spark.read.parquet(f"{root}/metrics_curate")
        sums = m.groupBy().sum().first().asDict()
        assert sums["sum(input_rows)"] == 7
        assert sums["sum(committed)"] == 2
        assert sums["sum(quality_dropped)"] == 1   # spam
        assert sums["sum(lang_dropped)"] == 1      # russian
        assert sums["sum(dup_dropped)"] == 2       # d3-or-d0, d4
        assert sums["sum(redelivered)"] == 1

        # A fresh checkpoint re-drains the whole dir: committed state
        # alone keeps it a no-op (url + content anti-joins).
        table = stream_curate(spark, in_dir, root,
                              str(tmp_path / "cu_ck2"),
                              keep_langs=("en",), max_files_per_trigger=2)
        assert table.read(spark).count() == 2

    def test_stream_neardup_within_and_cross_batch(self, spark, tmp_path):
        """Near-dup dedup-on-ingest: within-batch LSH resolve, then a
        band-sidecar bucket join against committed state drops new docs
        that near-dup anything already landed — across batches and
        across restarts, without recomputing the committed side."""
        import datetime as dt

        from ocr_spark import schemas
        from ocr_spark.streaming.jobs import stream_neardup

        in_dir = str(tmp_path / "nd_in")
        ckpt = str(tmp_path / "nd_ck")
        root = str(tmp_path / "nd_tbl")
        ts = dt.datetime(2026, 3, 1)
        base = ("the distributed analytics engine rebuilds the web corpus "
                "from raw crawl segments every night and reports totals "
                "at dawn")
        v1 = base.replace("night", "week")    # J(base,v1) ~ 0.81
        v2 = base.replace("dawn", "dusk")     # J(base,v2) ~ 0.95
        other = ("completely different content about cooking pasta with "
                 "garlic and olive oil on a slow tuesday afternoon in the "
                 "old kitchen")
        third = ("a third unrelated page describing mountain hiking "
                 "trails near the northern ridge with detailed elevation "
                 "profiles and maps")

        def land(rows):
            spark.createDataFrame(
                [(u, ts, None, t, "en", None) for u, t in rows],
                schema=schemas.INPUT_SCHEMA
            ).coalesce(1).write.mode("append").parquet(in_dir)

        # Wave 1 (one batch): base + a within-batch near-dup + a
        # distinct doc. Survivor of the {base, v2} cluster is the min
        # url (d0).
        land([("https://n.local/d0", base),
              ("https://n.local/d1", v2),
              ("https://n.local/d2", other)])
        table = stream_neardup(spark, in_dir, root, ckpt,
                               max_files_per_trigger=1)
        w1 = {r["url"]: r["text"] for r in table.read(spark).collect()}
        assert set(w1) == {"https://n.local/d0", "https://n.local/d2"}

        # Wave 2 (next batch): a CROSS-batch near-dup of committed
        # base, a genuinely new doc, a redelivered url, and a NULL-text
        # row (first NULL seen: commits, and its degenerate [NULL]
        # shingle signature claims the NULL-content cluster).
        land([("https://n.local/d3", v1),
              ("https://n.local/d4", third),
              ("https://n.local/d0", base),
              ("https://n.local/d5", None)])
        table = stream_neardup(spark, in_dir, root, ckpt,
                               max_files_per_trigger=1)
        out = table.read(spark)
        got = {r["url"]: r["text"] for r in out.collect()}
        assert set(got) == {"https://n.local/d0", "https://n.local/d2",
                            "https://n.local/d4", "https://n.local/d5"}
        assert got["https://n.local/d5"] is None

        # Counters reconcile exactly across both batches.
        m = spark.read.parquet(f"{root}/metrics_neardup")
        sums = m.groupBy().sum().first().asDict()
        assert sums["sum(input_rows)"] == 7
        assert sums["sum(redelivered)"] == 1     # d0 again
        assert sums["sum(within_dropped)"] == 1  # v2 vs base, same batch
        assert sums["sum(cross_dropped)"] == 1   # v1 vs committed base
        assert sums["sum(committed)"] == 4

        # The sidecar holds band keys for exactly the committed docs —
        # including the NULL-text one, whose [NULL]-shingle signature
        # is what lets a FUTURE NULL-text doc cross-batch-dedup (batch
        # parity: minhash_lsh_pairs scores two NULL texts jaccard 1.0).
        import os
        band_dirs = [d for d in os.listdir(f"{root}/bands")]
        bands_df = spark.read.parquet(
            *[f"{root}/bands/{d}" for d in band_dirs])
        assert (set(r["id"] for r in bands_df.select("id")
                    .distinct().collect()) == set(got))

        # Wave 3: a second NULL-text doc is a near-dup of the committed
        # one and must NOT land.
        land([("https://n.local/d6", None)])
        table = stream_neardup(spark, in_dir, root, ckpt,
                               max_files_per_trigger=1)
        assert table.read(spark).count() == 4

        # Fresh checkpoint re-drains everything: committed urls kill
        # the replays, and the band sidecar kills the near-dup variants
        # (v1/v2/d6 urls were never committed, so only the LSH state
        # can stop them re-landing).
        table = stream_neardup(spark, in_dir, root,
                               str(tmp_path / "nd_ck2"),
                               max_files_per_trigger=1)
        assert table.read(spark).count() == 4


class TestStreamScrub:
    def test_stream_curate_scrub_pii_on_ingest(self, spark, tmp_path):
        """scrub_pii=True redacts before fingerprinting: the committed
        corpus never holds raw PII, two pages differing only in PII
        dedup as content-equal, and the redaction total rides the
        metrics row."""
        import datetime as dt

        from ocr_spark import schemas
        from ocr_spark.streaming.jobs import stream_curate

        in_dir = str(tmp_path / "sp_in")
        ts = dt.datetime(2026, 3, 1)
        base = ("the quick brown fox jumps over the lazy dog and then "
                "walks away into the quiet evening field with no fuss "
                "mail me at {} today")
        rows = [("https://c.local/p0", ts, None,
                 base.format("alice@example.org"), "en", None),
                ("https://c.local/p1", ts, None,
                 base.format("bob@example.net"), "en", None)]
        spark.createDataFrame(rows, schema=schemas.INPUT_SCHEMA)\
            .coalesce(1).write.parquet(in_dir)

        table = stream_curate(spark, in_dir, str(tmp_path / "sp_tbl"),
                              str(tmp_path / "sp_ck"), keep_langs=("en",),
                              scrub_pii=True)
        out = table.read(spark).collect()
        # PII-only variants collapse to one survivor, already redacted.
        assert len(out) == 1
        assert "|||EMAIL_ADDRESS|||" in out[0]["text"]
        assert "example.org" not in out[0]["text"]
        assert out[0]["n_pii_redacted"] == 1
        m = spark.read.parquet(f"{tmp_path}/sp_tbl/metrics_curate")
        sums = m.groupBy().sum().first().asDict()
        assert sums["sum(pii_redacted)"] == 2
        assert sums["sum(dup_dropped)"] == 1

        # Default path: gate off, counter present and zero.
        in2 = str(tmp_path / "sp_in2")
        spark.createDataFrame(rows[:1], schema=schemas.INPUT_SCHEMA)\
            .coalesce(1).write.parquet(in2)
        table2 = stream_curate(spark, in2, str(tmp_path / "sp_tbl2"),
                               str(tmp_path / "sp_ck2"),
                               keep_langs=("en",))
        got = table2.read(spark).first()
        assert "alice@example.org" in got["text"]
        assert got["n_pii_redacted"] == 0


class TestTfidf:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "Apple banana  APPLE"), (2, "banana cherry"),
             (3, "   "), (4, "zeta alpha")],
            "doc_id long, text string")

    def test_doc_frequency_smoothed_idf(self, spark):
        import math

        from ocr_spark.operators import textstats
        got = {r.term: (r.df, r.idf) for r in
               textstats.doc_frequency(self._docs(spark)).collect()}
        # N = 4 documents (the whitespace-only one still counts in N)
        assert got["apple"][0] == 1
        assert got["banana"][0] == 2
        assert abs(got["apple"][1] - (math.log(5 / 2) + 1)) < 1e-12
        assert abs(got["banana"][1] - (math.log(5 / 3) + 1)) < 1e-12
        # empty doc contributes no terms; '' never a term
        assert "" not in got

    def test_tfidf_topk_scores_and_ties(self, spark):
        import math

        from ocr_spark.operators import textstats
        rows = textstats.tfidf_topk(self._docs(spark), k=2).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        # doc 1: apple tf=2 (case-folded), idf=ln(5/2)+1 -> top keyword
        top1 = sorted(by_doc[1], key=lambda r: r.rank)[0]
        assert (top1.term, top1.tf) == ("apple", 2)
        assert abs(top1.tfidf - 2 * (math.log(5 / 2) + 1)) < 1e-12
        # doc 4: equal tf and equal df -> deterministic term tiebreak
        assert [r.term for r in sorted(by_doc[4],
                                       key=lambda r: r.rank)] == \
            ["alpha", "zeta"]
        # empty doc emits nothing; k caps per-doc rows
        assert 3 not in by_doc
        assert all(len(v) <= 2 for v in by_doc.values())

    def test_tfidf_min_df_drops_rare_terms(self, spark):
        from ocr_spark.operators import textstats
        rows = textstats.tfidf_topk(self._docs(spark), k=5,
                                    min_df=2).collect()
        assert {r.term for r in rows} == {"banana"}
