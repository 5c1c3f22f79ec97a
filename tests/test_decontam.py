"""Benchmark decontamination (operators/decontam.py): 13-gram overlap
flagging/removal vs an eval corpus (Brown et al. 2020 Appendix C)."""

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import decontam

# 20 distinct tokens -> 8 distinct 13-grams.
SENT = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
        "kilo lima mike november oscar papa quebec romeo sierra tango")
CLEAN = ("one two three four five six seven eight nine ten eleven twelve "
         "thirteen fourteen fifteen sixteen seventeen eighteen nineteen "
         "twenty")


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(spark, [
        (0, "intro words here " + SENT + " outro words"),  # contaminated
        (1, CLEAN),                                        # clean, long
        (2, "short doc only"),                             # < 13 tokens
        (3, SENT.upper()),                                 # case-folded hit
    ])


@pytest.fixture(scope="module")
def bench(spark):
    return _docs(spark, [(100, SENT)]).select("text")


class TestNgrams:
    def test_counts_and_normalization(self, spark):
        df = _docs(spark, [(0, "  A  b\tc d e f g h i j k l m n ")])
        [row] = df.select(decontam.word_ngrams(F.col("text"), 13)
                          .alias("g")).collect()
        # 14 tokens -> 2 13-grams, lowercased, whitespace collapsed.
        assert row["g"] == ["a b c d e f g h i j k l m",
                            "b c d e f g h i j k l m n"]

    def test_short_and_empty_docs_yield_nothing(self, spark):
        df = _docs(spark, [(0, "only five tokens right here"), (1, ""),
                           (2, "   ")])
        rows = df.select(decontam.word_ngrams(F.col("text"), 13)
                         .alias("g")).collect()
        assert all(r["g"] == [] for r in rows)

    def test_exactly_n_tokens_is_one_gram(self, spark):
        df = _docs(spark, [(0, " ".join(f"t{i}" for i in range(13)))])
        [row] = df.select(decontam.word_ngrams(F.col("text"), 13)
                          .alias("g")).collect()
        assert len(row["g"]) == 1


class TestContamination:
    def test_hits(self, corpus, bench):
        got = {r["doc_id"]: r["hit_count"]
               for r in decontam.contamination(corpus, bench).collect()}
        # Docs 0 and 3 contain the full benchmark sentence = all 8 of
        # its 13-grams; doc 1 shares none; doc 2 is too short.
        assert got == {0: 8, 3: 8}

    def test_md5_twin_matches_production_hash(self, corpus, bench):
        a = sorted(map(tuple, decontam.contamination(
            corpus, bench, hash_mode="xxhash64").collect()))
        b = sorted(map(tuple, decontam.contamination(
            corpus, bench, hash_mode="md5").collect()))
        assert a == b

    def test_no_broadcast_path_matches(self, corpus, bench):
        a = sorted(map(tuple, decontam.contamination(
            corpus, bench).collect()))
        b = sorted(map(tuple, decontam.contamination(
            corpus, bench, broadcast_benchmark=False).collect()))
        assert a == b

    def test_empty_benchmark(self, spark, corpus):
        empty = spark.createDataFrame([], "text string")
        assert decontam.contamination(corpus, empty).count() == 0

    def test_partial_overlap_counts(self, spark, corpus):
        # Benchmark = first 14 tokens of SENT -> 2 shared 13-grams.
        part = " ".join(SENT.split()[:14])
        bench = _docs(spark, [(0, part)]).select("text")
        got = {r["doc_id"]: r["hit_count"]
               for r in decontam.contamination(corpus, bench).collect()}
        assert got == {0: 2, 3: 2}


class TestDecontaminate:
    def test_remove(self, corpus, bench):
        kept = decontam.decontaminate(corpus, bench)
        assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2]
        assert kept.columns == corpus.columns  # schema preserved

    def test_flag(self, corpus, bench):
        got = {r["doc_id"]: r["contam_hits"]
               for r in decontam.decontaminate(
                   corpus, bench, mode="flag").collect()}
        assert got == {0: 8, 1: 0, 2: 0, 3: 8}

    def test_min_hits_threshold(self, spark, corpus):
        part = " ".join(SENT.split()[:14])  # 2 shared grams
        bench = _docs(spark, [(0, part)]).select("text")
        assert sorted(r["doc_id"] for r in decontam.decontaminate(
            corpus, bench, min_hits=3).collect()) == [0, 1, 2, 3]
        assert sorted(r["doc_id"] for r in decontam.decontaminate(
            corpus, bench, min_hits=2).collect()) == [1, 2]

    def test_duplicated_span_counts_once(self, spark, bench):
        # The same contaminated 13-gram repeated in a doc is ONE
        # distinct hit, not two (distinct-shingle semantics).
        docs = _docs(spark, [(0, SENT + " filler " + SENT)])
        [r] = decontam.contamination(docs, bench).collect()
        assert r["hit_count"] == 8

    def test_bad_args(self, corpus, bench):
        with pytest.raises(ValueError):
            decontam.decontaminate(corpus, bench, mode="nope")
        with pytest.raises(ValueError):
            decontam.decontaminate(corpus, bench, min_hits=0)


# 10 distinct tokens -> 6 distinct 5-grams.
SPAN_A = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
SPAN_B = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"


class TestSubstringDuplication:
    @pytest.fixture(scope="class")
    def span_corpus(self, spark):
        return _docs(spark, [
            (0, SPAN_A),              # owner of every A-span
            (1, "x y z " + SPAN_A),   # 9 grams, 6 owned by doc 0
            (2, SPAN_B),              # unrelated
            (3, SPAN_A),              # verbatim copy of doc 0
            (4, "tiny doc"),          # < 5 tokens: no spans
        ])

    def test_counts_and_keep_first(self, span_corpus):
        got = {r["doc_id"]: (r["n_ngrams"], r["dup_ngrams"],
                             r["dup_fraction"])
               for r in decontam.substring_duplication(
                   span_corpus, n=5).collect()}
        # Doc 4 has no spans -> no row; min-id owners never self-dup.
        assert got == {0: (6, 0, 0.0), 1: (9, 6, 0.666667),
                       2: (6, 0, 0.0), 3: (6, 6, 1.0)}

    def test_md5_twin_matches_production_hash(self, span_corpus):
        a = sorted(map(tuple, decontam.substring_duplication(
            span_corpus, n=5, hash_mode="xxhash64").collect()))
        b = sorted(map(tuple, decontam.substring_duplication(
            span_corpus, n=5, hash_mode="md5").collect()))
        assert a == b

    def test_dedup_thresholds(self, span_corpus):
        def kept(frac):
            return sorted(r["doc_id"] for r in decontam.substring_dedup(
                span_corpus, n=5, max_dup_fraction=frac).collect())
        assert kept(0.7) == [0, 1, 2, 4]   # only the verbatim copy goes
        assert kept(0.5) == [0, 2, 4]
        assert kept(0.0) == [0, 2, 4]      # any shared span drops

    def test_dedup_is_fixed_point(self, span_corpus):
        once = decontam.substring_dedup(span_corpus, n=5,
                                        max_dup_fraction=0.0)
        twice = decontam.substring_dedup(once, n=5, max_dup_fraction=0.0)
        assert (sorted(r["doc_id"] for r in once.collect())
                == sorted(r["doc_id"] for r in twice.collect()))
        assert once.columns == span_corpus.columns

    def test_bad_fraction(self, span_corpus):
        with pytest.raises(ValueError):
            decontam.substring_dedup(span_corpus, max_dup_fraction=1.5)
        with pytest.raises(ValueError):
            decontam.substring_duplication(span_corpus, sample_mod=0)

    def test_anchor_sampling_still_catches_copies(self, spark):
        # 64-token docs, n=5: doc 1 is a verbatim copy of doc 0, doc 2
        # is unrelated. Content-defined anchors select the same
        # shingles in both copies, so the copy's sampled dup_fraction
        # is exactly 1.0 and the sampled set is smaller than exact.
        text_a = " ".join(f"w{i * 37 % 101}x{i}" for i in range(64))
        text_b = " ".join(f"q{i * 53 % 97}y{i}" for i in range(64))
        docs = _docs(spark, [(0, text_a), (1, text_a), (2, text_b)])
        exact = {r["doc_id"]: r for r in decontam.substring_duplication(
            docs, n=5).collect()}
        samp = {r["doc_id"]: r for r in decontam.substring_duplication(
            docs, n=5, sample_mod=4).collect()}
        assert samp[1]["dup_fraction"] == 1.0
        assert samp[2]["dup_ngrams"] == 0
        assert 0 < samp[1]["n_ngrams"] < exact[1]["n_ngrams"]
