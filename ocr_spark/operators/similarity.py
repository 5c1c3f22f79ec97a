"""Approximate-nearest-neighbor search over an embedding column.

Brute-force cosine top-k is the correctness baseline (still distributed:
queries broadcast, corpus scanned once, per-query heap via window).
The scale path is sign-LSH bucketing with deterministic hyperplanes —
candidates come from matching buckets only, so corpus fanout per query
is bounded by bucket occupancy instead of |corpus|.

Dot products use F.zip_with + F.aggregate — JVM-side, left-to-right
summation order (deterministic, matches a sequential oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                query_id: str = "vec_id", corpus_id: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against
    the corpus scan; rank per query with a window, deterministic
    tie-break on corpus id."""
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(corpus_id).alias("corpus_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "corpus_id",
        cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    ).filter(F.col("query_id") != F.col("corpus_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def lsh_sign_bucket(vec, planes: int = 12, dim: int | None = None):
    """Deterministic random-hyperplane signature packed into a BIGINT.

    Plane weights derive from xxhash64(plane, dim_index) mapped to
    [-0.5, 0.5] — no RNG state, identical on every executor and run.
    """
    def _weights(plane: int):
        return F.transform(
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda d: (F.pmod(F.xxhash64(F.lit(plane), d), F.lit(1000))
                       .cast("double") / 1000.0 - 0.5))

    sig = F.lit(0).cast("long")
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(vec, _weights(p), lambda x, w: x * w),
            F.lit(0.0), lambda acc, v: acc + v)
        sig = sig.bitwiseOR(
            F.when(proj > 0, F.lit(1 << p).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return sig


def lsh_cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                    planes: int = 12, query_id: str = "vec_id",
                    corpus_id: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """ANN: bucket corpus and queries by LSH signature, score only
    within-bucket candidates. Recall trades off with `planes`."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", lsh_sign_bucket(F.col("qv"), planes))
    c = corpus.select(
        F.col(corpus_id).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", lsh_sign_bucket(F.col("cv"), planes))
    scored = (
        c.join(F.broadcast(q), "bucket", "inner")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select("query_id", "corpus_id",
                cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                             planes: int = 10, id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", lsh_sign_bucket(F.col("v"), planes))
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(r, "bucket", "inner")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                cosine(F.col("l.v"), F.col("r.v")).alias("cos_sim"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cos_sim") >= threshold)
    )
