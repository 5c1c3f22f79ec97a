"""Deduplication operators for web-scale corpus curation.

All candidate generation is expression-only (whole-stage codegen):
shingling via sequence+substring, MinHash via seeded xxhash64, SimHash
via bit arithmetic — no Python UDFs anywhere. The verify stages are
exact n-gram Jaccard, also pure expressions.

Scale design: every operator is a bounded-fanout bucket join (LSH bands
/ simhash chunks), never an all-pairs cross join; exact dedup is one
hash aggregation with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(c):
    """Canonical form for hashing: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized-text hash; survivor = min id per group.
    One shuffle on the 128-bit digest; partial agg combines map-side."""
    h = F.md5(normalize_text(F.col(text_col)).cast("binary")).alias("content_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("survivor_id"),
             F.count("*").alias("dup_count"))
    )


def shingles(c, k: int = 8):
    """Distinct character k-grams of the normalized text (expression)."""
    norm = normalize_text(c)
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda j: F.substring(norm, j, k)))


_MERSENNE31 = 2_147_483_647  # 2^31 - 1, prime


def _perm_consts(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic 31-bit affine constants (A_p odd in [1,2^31),
    B_p in [0,2^31)), one pair per permutation, via a fixed-seed LCG —
    no RNG state, identical on every executor and run."""
    consts = []
    x = 0x9E3779B97F4A7C15
    for _ in range(num_perm):
        x = (x * 6364136223846793005 + 1442695040888963407) % 2**64
        a = (x >> 33) | 1
        x = (x * 6364136223846793005 + 1442695040888963407) % 2**64
        consts.append((a, x >> 33))
    return consts


def shingle_hashes(shingle_arr):
    """31-bit hash of every shingle — materialize this ONCE (its own
    projection) before fanning out to permutations."""
    return F.transform(
        shingle_arr,
        lambda s: F.xxhash64(s).bitwiseAND(F.lit(0x7FFFFFFF).cast("long")))


def minhash_signature(hash_arr, num_perm: int = 32):
    """One-hash MinHash over pre-hashed shingles: permutation p is the
    classic universal hash h -> (h * A_p + B_p) mod (2^31 - 1). With
    31-bit h and constants the product stays under 2^62, so the long
    arithmetic can never overflow (Spark 4 runs ANSI mode). One string
    hash + num_perm multiply-add-mods per shingle instead of num_perm
    string hashes. Pass shingle_hashes(...) as input."""
    return F.array(*[
        F.array_min(F.transform(
            hash_arr,
            lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE31))))
        for a, b in _perm_consts(num_perm)])


def jaccard(a, b):
    """Exact Jaccard over two shingle arrays (expression)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def _spread(df: DataFrame) -> DataFrame:
    """Small scans (one parquet file -> one task) would serialize the
    compute-heavy signature stages on a single core; spread them to the
    cluster's parallelism. At production scale the scan already has
    >= defaultParallelism splits and this is a no-op (no shuffle)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 8,
                      num_perm: int = 32, bands: int = 8,
                      threshold: float = 0.7) -> DataFrame:
    """MinHash + LSH near-dup pairs: shingle -> minhash -> band buckets ->
    bucket self-join -> exact-Jaccard verify.

    Shuffles once on (band, band_hash); candidate fanout is bounded by
    bucket size, never all-pairs. rows_per_band = num_perm // bands.
    """
    rows_per_band = num_perm // bands
    df = _spread(df)
    # hs materialized in its own projection so the 8-gram string hashes
    # run once per doc; the num_perm permutations are multiply-adds over
    # hs (CollapseProject won't inline an alias referenced num_perm
    # times, so the scan stays single-pass).
    sig = (
        df.select(F.col(id_col).alias("id"),
                  shingles(F.col(text_col), k).alias("sh"))
        .withColumn("hs", shingle_hashes(F.col("sh")))
        .withColumn("mh", minhash_signature(F.col("hs"), num_perm))
    )
    # Band rows carry ONLY (id, band, band_hash): at 10^12 docs the
    # bands-x duplication of shingle arrays through the shuffle would
    # dominate the job; ids shuffle in bytes, shingles re-derive later
    # for the (small) candidate set.
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(
                        ",", F.slice(F.col("mh"), b * rows_per_band + 1,
                                     rows_per_band))).alias("band_hash")),
            )).alias("bb"),
    ).select("id", "bb.band", "bb.band_hash")

    cand = (
        banded.alias("l").join(banded.alias("r"),
                               on=["band", "band_hash"], how="inner")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_df = df.select(F.col(id_col).alias("id"),
                      shingles(F.col(text_col), k).alias("sh"))
    return (
        cand.join(sh_df.select(F.col("id").alias("id_a"),
                               F.col("sh").alias("sh_a")), "id_a")
        .join(sh_df.select(F.col("id").alias("id_b"),
                           F.col("sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def token_hashes(c):
    """xxhash64 of every whitespace token — materialize ONCE (its own
    projection) before the per-bit vote fanout."""
    return F.transform(F.split(F.trim(normalize_text(c)), " "),
                       lambda t: F.xxhash64(t))


def simhash_from_hashes(hash_arr, bits: int = 64):
    """Classic one-hash SimHash packed into a BIGINT: bit b of the
    fingerprint is 1 iff the sum over tokens of (+1 if bit b of the
    token's hash is set, else -1) is positive. One string hash per
    token; the 64 per-bit votes are shift/and/add arithmetic (the old
    form re-hashed every token once per bit). Statically unrolled —
    shift amounts must be Python ints in the DataFrame API."""
    fp = F.lit(0).cast("long")
    for b in range(bits):
        # vote_b = sum(2*bit_b(h) - 1) over tokens
        vote = F.aggregate(
            hash_arr, F.lit(0).cast("long"),
            lambda a, h: a + F.shiftrightunsigned(h, b)
            .bitwiseAND(F.lit(1).cast("long")) * 2 - 1)
        val = 1 << b
        if val >= 1 << 63:  # sign bit: wrap to the signed-long bit pattern
            val -= 1 << 64
        fp = fp.bitwiseOR(
            F.when(vote > 0, F.lit(val).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return fp


def simhash(c, bits: int = 64):
    """SimHash of a text column (convenience wrapper; inside a plan
    prefer materializing token_hashes in its own projection first so
    the token hashing runs once, not once per bit)."""
    return simhash_from_hashes(token_hashes(c), bits)


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprint, candidate buckets by
    16-bit chunk (pigeonhole: hamming<=3 pairs share >=1 of 4 chunks),
    verified with bit_count(xor)."""
    fp = (_spread(df)
          .select(F.col(id_col).alias("id"),
                  token_hashes(F.col(text_col)).alias("hs"))
          .select("id", simhash_from_hashes(F.col("hs")).alias("fp")))
    chunked = fp.select(
        "id", "fp",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(F.col("fp"), i * 16)
                .bitwiseAND(F.lit(0xFFFF)).alias("chunk_val"))
            for i in range(4)])).alias("cc"),
    ).select("id", "fp", "cc.chunk", "cc.chunk_val")
    l, r = chunked.alias("l"), chunked.alias("r")
    return (
        l.join(r, on=["chunk", "chunk_val"], how="inner")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                F.bit_count(F.col("l.fp").bitwiseXOR(F.col("r.fp"))).alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        threshold: float = 0.5,
                        length_band: int = 32) -> DataFrame:
    """Exact n-gram Jaccard pairs with length-band blocking (docs whose
    lengths differ by more than a band can't reach high Jaccard)."""
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), k).alias("sh"),
        F.floor(F.length(normalize_text(F.col(text_col))) / length_band).alias("band"),
    )
    banded = base.select(
        "id", "sh", F.explode(F.array(F.col("band"), F.col("band") + 1)).alias("b"))
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(r, on=["b"], how="inner")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                jaccard(F.col("l.sh"), F.col("r.sh")).alias("jaccard"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("jaccard") >= threshold)
    )
