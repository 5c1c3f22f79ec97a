"""IVF (inverted-file) ANN: training, probing, exactness anchors, and
the partition-pruned on-disk index."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StructField,
                               StructType)

from ocr_spark.operators import similarity

SCHEMA = StructType([StructField("vec_id", LongType()),
                     StructField("embedding", ArrayType(DoubleType()))])


def _clustered(spark, n=200, n_clusters=4, dim=16, noise=0.15, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        v = centers[i % n_clusters] + noise * rng.standard_normal(dim)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    return spark.createDataFrame(rows, SCHEMA)


class TestIVF:
    def test_trained_ivf_matches_bruteforce_on_clusters(self, spark):
        df = _clustered(spark)
        cents = similarity.ivf_train(df, nlist=4, train_iters=3)
        q = df.filter(F.col("vec_id") < 10)
        ivf = {(r["query_id"], r["rank"], r["corpus_id"])
               for r in similarity.ivf_cosine_topk(
                   q, df, k=3, centroids=cents, nprobe=1).collect()}
        brute = {(r["query_id"], r["rank"], r["corpus_id"])
                 for r in similarity.cosine_topk(q, df, k=3).collect()}
        assert len(ivf & brute) / len(brute) >= 0.9

    def test_full_probe_equals_exact_bruteforce(self, spark):
        """nprobe >= nlist probes every cell -> candidate set is the
        whole corpus minus self -> results must EQUAL cosine_topk.
        The strongest correctness anchor: the IVF tail (assignment,
        probe join, scoring, ranking) introduces no approximation."""
        df = _clustered(spark, n=120, seed=11)
        q = df.filter(F.col("vec_id") < 8)
        for iters in (0, 2):
            cents = similarity.ivf_train(df, nlist=5, train_iters=iters)
            full = {(r["query_id"], r["rank"], r["corpus_id"])
                    for r in similarity.ivf_cosine_topk(
                        q, df, k=4, centroids=cents, nprobe=5).collect()}
            brute = {(r["query_id"], r["rank"], r["corpus_id"])
                     for r in similarity.cosine_topk(q, df, k=4).collect()}
            assert full == brute

    def test_expr_and_blas_assignments_agree(self, spark):
        df = _clustered(spark, n=150, seed=3)
        cents = similarity.ivf_train(df, nlist=4, train_iters=2)
        expr = {r["vec_id"]: r["ivf_cid"] for r in similarity._ivf_cells(
            df, cents, "vec_id", "embedding", 1, "expr").collect()}
        blas = {r["vec_id"]: r["ivf_cid"] for r in similarity._ivf_cells(
            df, cents, "vec_id", "embedding", 1, "blas").collect()}
        assert expr == blas
        # Probe lists agree too (nprobe > 1 path).
        pe = sorted((r["vec_id"], r["ivf_cid"]) for r in similarity._ivf_cells(
            df, cents, "vec_id", "embedding", 2, "expr").collect())
        pb = sorted((r["vec_id"], r["ivf_cid"]) for r in similarity._ivf_cells(
            df, cents, "vec_id", "embedding", 2, "blas").collect())
        assert pe == pb

    def test_training_improves_quantizer_objective(self, spark):
        """Mean cosine-to-assigned-centroid is non-decreasing under
        Lloyd iterations (the spherical k-means objective)."""
        df = _clustered(spark, n=300, n_clusters=6, seed=13)
        mat = np.vstack([np.asarray(r["embedding"])
                         for r in df.orderBy("vec_id").collect()])

        def objective(cents):
            C = np.vstack(cents)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            return float(np.mean(np.max(mat @ Cn.T, axis=1)))

        obj0 = objective(similarity.ivf_train(df, nlist=6, train_iters=0))
        obj2 = objective(similarity.ivf_train(df, nlist=6, train_iters=2))
        assert obj2 >= obj0 - 1e-12

    def test_nlist_larger_than_corpus(self, spark):
        df = _clustered(spark, n=3, seed=5)
        cents = similarity.ivf_train(df, nlist=16, train_iters=2)
        assert 1 <= len(cents) <= 3
        out = similarity.ivf_cosine_topk(df, df, k=2, centroids=cents,
                                         nprobe=16)
        brute = similarity.cosine_topk(df, df, k=2)
        assert {tuple(r) for r in out.collect()} == \
            {tuple(r) for r in brute.collect()}

    def test_cell_cap_reports_drops(self, spark):
        """A degenerate cell above max_cell is dropped with counters."""
        df = _clustered(spark, n=100, n_clusters=2, noise=0.02, seed=19)
        cents = similarity.ivf_train(df, nlist=2, train_iters=2)
        q = df.filter(F.col("vec_id") < 2)
        out, rep = similarity.ivf_cosine_topk(
            q, df, k=3, centroids=cents, nprobe=1, max_cell=10,
            return_report=True)
        r = rep.first()
        assert r["n_hot_buckets"] == 2 and r["rows_dropped"] == 100
        assert out.count() == 0

    def test_disk_index_parity_and_partition_pruning(self, spark, tmp_path):
        df = _clustered(spark, n=160, seed=23)
        cents = similarity.ivf_train(df, nlist=4, train_iters=2)
        path = str(tmp_path / "ivf_index")
        similarity.ivf_write_index(df, path, cents)
        # Queries from ONE planted cluster (ids = 0 mod 4) so the probe
        # set is a strict subset of the cells and pruning is visible.
        q = df.filter(F.col("vec_id").isin([0, 4, 8]))
        disk = {(r["query_id"], r["rank"], r["corpus_id"])
                for r in similarity.ivf_search_index(
                    spark, path, q, cents, k=3, nprobe=1).collect()}
        mem = {(r["query_id"], r["rank"], r["corpus_id"])
               for r in similarity.ivf_cosine_topk(
                   q, df, k=3, centroids=cents, nprobe=1).collect()}
        assert disk == mem
        # Pruning is observable at the source: the probed-cells filter
        # reads strictly fewer files than the full index.
        probed = {r["ivf_cid"] for r in similarity._ivf_cells(
            q.select(F.col("vec_id").alias("query_id"),
                     F.col("embedding").alias("qv")),
            cents, "query_id", "qv", 1, "blas").collect()}
        idx = spark.read.parquet(path)
        all_files = idx.select(F.input_file_name()).distinct().count()
        pruned_files = (idx.filter(
            F.col("ivf_cid").isin([int(x) for x in probed]))
            .select(F.input_file_name()).distinct().count())
        assert pruned_files < all_files

    def test_empty_queries(self, spark):
        df = _clustered(spark, n=50, seed=29)
        cents = similarity.ivf_train(df, nlist=4, train_iters=1)
        q = df.filter(F.col("vec_id") < 0)
        assert similarity.ivf_cosine_topk(q, df, k=3, centroids=cents,
                                          nprobe=2).count() == 0


class TestStringIds:
    def test_disk_index_string_ids_expr_mode(self, spark, tmp_path):
        """Non-integer ids ride the expr assignment path end to end:
        index write, probe, and search must preserve the id type (a
        long coercion would crash at plan construction)."""
        base = _clustered(spark, n=80, seed=31)
        df = base.select(F.concat(F.lit("doc-"),
                                  F.col("vec_id").cast("string"))
                         .alias("vec_id"), "embedding")
        cents = similarity.ivf_train(df, nlist=4, train_iters=1)
        path = str(tmp_path / "ivf_sidx")
        similarity.ivf_write_index(df, path, cents, assign_mode="expr")
        q = df.filter(F.col("vec_id").isin(["doc-0", "doc-4"]))
        got = similarity.ivf_search_index(
            spark, path, q, cents, k=3, nprobe=2,
            assign_mode="expr").collect()
        assert len(got) == 6
        assert all(isinstance(r["query_id"], str)
                   and isinstance(r["corpus_id"], str) for r in got)
        mem = {(r["query_id"], r["rank"], r["corpus_id"])
               for r in similarity.ivf_cosine_topk(
                   q, df, k=3, centroids=cents, nprobe=2,
                   assign_mode="expr").collect()}
        assert {(r["query_id"], r["rank"], r["corpus_id"])
                for r in got} == mem


class TestSemanticDedup:
    def test_within_cluster_pairs_found(self, spark):
        """Planted: two tight semantic clusters -> every within-cluster
        pair is emitted, no cross-cluster pair is (orthogonal centers,
        cos ~ 0)."""
        rows = []
        a = np.zeros(8); a[0] = 1.0
        b = np.zeros(8); b[4] = 1.0
        rng = np.random.default_rng(5)
        for i in range(6):
            base = a if i < 3 else b
            v = base + 0.02 * rng.standard_normal(8)
            rows.append((i, (v / np.linalg.norm(v)).tolist()))
        df = spark.createDataFrame(rows, SCHEMA)
        pairs = {(r["id_a"], r["id_b"])
                 for r in similarity.semantic_dedup_pairs(
                     df, threshold=0.9, nlist=2, train_iters=2).collect()}
        assert pairs == {(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)}

    def test_matches_within_cell_bruteforce(self, spark):
        """The operator is exactly 'brute force restricted to the
        learned cells': recompute that restriction independently and
        compare sets (scores included, rounded)."""
        df = _clustered(spark, n=80, seed=9)
        cents = similarity.ivf_train(df, nlist=4, train_iters=2)
        got = {(r["id_a"], r["id_b"], round(r["cos_sim"], 6))
               for r in similarity.semantic_dedup_pairs(
                   df, threshold=0.8, centroids=cents).collect()}
        cells = {r["vec_id"]: r["ivf_cid"] for r in similarity._ivf_cells(
            df, cents, "vec_id", "embedding", 1, "expr").collect()}
        vecs = {r["vec_id"]: np.array(r["embedding"])
                for r in df.collect()}
        want = set()
        ids = sorted(vecs)
        for i in ids:
            for j in ids:
                if i < j and cells[i] == cells[j]:
                    c = float(vecs[i] @ vecs[j]
                              / (np.linalg.norm(vecs[i])
                                 * np.linalg.norm(vecs[j])))
                    if c >= 0.8:
                        want.add((i, j, round(c, 6)))
        assert got == want

    def test_expr_and_blas_agree(self, spark):
        df = _clustered(spark, n=60, seed=2)
        cents = similarity.ivf_train(df, nlist=3, train_iters=1)
        out = []
        for mode in ("expr", "blas"):
            out.append(sorted(
                (r["id_a"], r["id_b"], round(r["cos_sim"], 9))
                for r in similarity.semantic_dedup_pairs(
                    df, threshold=0.8, centroids=cents,
                    assign_mode=mode).collect()))
        assert out[0] == out[1]

    def test_cell_cap_reports_drops(self, spark):
        df = _clustered(spark, n=40, n_clusters=1, seed=4)
        pairs, report = similarity.semantic_dedup_pairs(
            df, threshold=0.0, nlist=1, train_iters=0, max_cell=10,
            return_report=True)
        [rep] = report.collect()
        # cap_buckets drops a hot cell ENTIRELY (the quantizer carries
        # no information there) and the report says so.
        assert rep["rows_dropped"] == 40
        assert rep["n_hot_buckets"] == 1
        assert pairs.count() == 0

    def test_pairs_feed_dedup_resolve(self, spark):
        """End of the SemDeDup recipe: pairs -> connected components ->
        one survivor per semantic group."""
        from ocr_spark.operators import dedup
        rows = []
        a = np.zeros(8); a[1] = 1.0
        b = np.zeros(8); b[6] = 1.0
        rng = np.random.default_rng(12)
        for i in range(6):
            base = a if i < 3 else b
            v = base + 0.02 * rng.standard_normal(8)
            rows.append((i, (v / np.linalg.norm(v)).tolist()))
        df = spark.createDataFrame(rows, SCHEMA)
        pairs = similarity.semantic_dedup_pairs(
            df, threshold=0.9, nlist=2, train_iters=2)
        resolved = dedup.dedup_resolve(
            pairs.select("id_a", "id_b"), id_col="vec_id")
        survivors = {r["vec_id"] for r in
                     resolved.filter("keep").collect()}
        assert survivors == {0, 3}
