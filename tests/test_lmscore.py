"""CCNet-style char-ngram LM quality scoring (operators/lmscore.py)."""

import math

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import lmscore


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestTrain:
    def test_counts_and_vocab(self, spark):
        ref = _df(spark, [(0, "abab"), (1, "abc")])
        m = lmscore.train_char_lm(ref)
        grams = {r["gram"]: r["cnt"] for r in m["grams"].collect()}
        # "abab" -> aba, bab; "abc" -> abc
        assert grams == {"aba": 1, "bab": 1, "abc": 1}
        ctx = {r["ctx"]: r["ctx_cnt"] for r in m["contexts"].collect()}
        assert ctx == {"ab": 2, "ba": 1}
        assert m["vocab"] == 3  # {a, b, c}

    def test_normalization_feeds_grams(self, spark):
        # Case folds and whitespace collapses before gram extraction.
        m1 = lmscore.train_char_lm(_df(spark, [(0, "AB  AB")]))
        m2 = lmscore.train_char_lm(_df(spark, [(0, "ab ab")]))
        assert sorted(map(tuple, m1["grams"].collect())) == \
            sorted(map(tuple, m2["grams"].collect()))


class TestScore:
    def test_hand_computed_bits(self, spark):
        ref = _df(spark, [(0, "abab")])       # grams aba:1 bab:1; ctx ab:1 ba:1
        m = lmscore.train_char_lm(ref)
        v = m["vocab"]                        # {a, b} -> 2
        assert v == 2
        out = {r["doc_id"]: r for r in lmscore.lm_score(
            _df(spark, [(1, "aba"), (2, "zzz"), (3, "a")]), m).collect()}
        # doc 1: one gram "aba": p = (1+1)/(1+2) = 2/3
        assert out[1]["n_grams"] == 1
        assert out[1]["bits_per_char"] == round(-math.log2(2 / 3), 6)
        # doc 2: unseen gram AND unseen context: p = 1/(0+2)
        assert out[2]["bits_per_char"] == round(-math.log2(1 / 2), 6)
        # doc 3: too short for a trigram.
        assert out[3]["n_grams"] == 0
        assert out[3]["bits_per_char"] is None

    def test_natural_beats_noise(self, spark):
        """The signal the operator exists for: reference-like text
        scores fewer bits/char than keyboard mash."""
        sent = ("the quick brown fox jumps over the lazy dog and then "
                "the dog chases the fox around the quiet garden again")
        ref = _df(spark, [(i, sent) for i in range(4)])
        docs = _df(spark, [
            (1, "the brown dog jumps over the quiet fox again"),
            (2, "xq zvkj qpwxo vnrml zzkty qqqwj pzvxm rrklt"),
        ])
        out = {r["doc_id"]: r["bits_per_char"]
               for r in lmscore.lm_quality(docs, ref).collect()}
        assert out[1] < out[2] - 1.0, out

    def test_shuffle_join_fallback_matches(self, spark):
        ref = _df(spark, [(0, "abcdefg hij")])
        docs = _df(spark, [(1, "abc hij xyz"), (2, "defg")])
        m = lmscore.train_char_lm(ref)
        a = sorted(map(tuple, lmscore.lm_score(docs, m).collect()))
        b = sorted(map(tuple, lmscore.lm_score(
            docs, m, broadcast=False).collect()))
        assert a == b

    def test_null_text(self, spark):
        m = lmscore.train_char_lm(_df(spark, [(0, "abcd")]))
        df = spark.createDataFrame([(1, None)],
                                   "doc_id: long, text: string")
        r = lmscore.lm_score(df, m).collect()[0]
        assert r["n_grams"] == 0 and r["bits_per_char"] is None


class TestCCNetBuckets:
    def _scored(self, spark, rows, schema="doc_id long, lang string, "
                                          "bits_per_char double"):
        return spark.createDataFrame(rows, schema)

    def test_global_split_thirds(self, spark):
        rows = [(i, "en", float(i)) for i in range(1, 10)]  # 1..9
        out = {r["doc_id"]: (r["bucket"], r["cut_head"], r["cut_tail"])
               for r in lmscore.ccnet_buckets(
                   self._scored(spark, rows), exact=True).collect()}
        # exact percentiles of 1..9 at 1/3, 2/3 -> 3.6667, 6.3333
        assert [out[i][0] for i in range(1, 10)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3)

    def test_per_lang_cutoffs_independent(self, spark):
        rows = ([(i, "en", float(i)) for i in range(1, 7)]
                + [(10 + i, "de", 100.0 + i) for i in range(1, 7)])
        out = lmscore.ccnet_buckets(self._scored(spark, rows),
                                    lang_col="lang", exact=True)
        got = {r["doc_id"]: r["bucket"] for r in out.collect()}
        # each language splits on ITS OWN quantiles: de's 101..106
        # would all be 'tail' under en's cutoffs
        assert got[1] == "head" and got[6] == "tail"
        assert got[11] == "head" and got[16] == "tail"

    def test_boundary_is_inclusive(self, spark):
        # score exactly at the lower cutoff -> head (<=), at the
        # upper -> middle
        rows = [(1, "en", 1.0), (2, "en", 2.0), (3, "en", 3.0),
                (4, "en", 4.0)]
        out = lmscore.ccnet_buckets(self._scored(spark, rows),
                                    cutoffs=(0.25, 0.75), exact=True)
        got = {r["doc_id"]: (r["bucket"], r["cut_head"], r["cut_tail"])
               for r in out.collect()}
        assert got[2][1] == 1.75 and got[2][0] == "middle"
        assert got[1][0] == "head"

    def test_null_score_and_null_lang_get_null_bucket(self, spark):
        rows = [(1, "en", 1.0), (2, "en", 2.0), (3, "en", 3.0),
                (4, "en", None), (5, None, 2.0)]
        out = lmscore.ccnet_buckets(self._scored(spark, rows),
                                    lang_col="lang", exact=True)
        got = {r["doc_id"]: r["bucket"] for r in out.collect()}
        assert got[4] is None and got[5] is None
        assert None not in (got[1], got[2], got[3])

    def test_approx_matches_exact_on_small_data(self, spark):
        rows = [(i, "en", float(i * i % 17)) for i in range(1, 40)]
        a = {r["doc_id"]: r["bucket"]
             for r in lmscore.ccnet_buckets(
                 self._scored(spark, rows), exact=True).collect()}
        b = {r["doc_id"]: r["bucket"]
             for r in lmscore.ccnet_buckets(
                 self._scored(spark, rows), exact=False).collect()}
        assert a == b

    def test_bad_cutoffs_rejected(self, spark):
        df = self._scored(spark, [(1, "en", 1.0)])
        with pytest.raises(ValueError):
            lmscore.ccnet_buckets(df, cutoffs=(0.7, 0.3))

    def test_composes_with_lm_quality(self, spark):
        sent = ("the quick brown fox jumps over the lazy dog near "
                "the quiet river bank every single morning")
        ref = _df(spark, [(i, sent) for i in range(3)])
        docs = _df(spark, [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quiet river bank every morning again"),
            (3, "zzkty qqqwj pzvxm rrklt xq zvkj qpwxo"),
        ])
        scored = lmscore.lm_quality(docs, ref)
        out = {r["doc_id"]: r["bucket"]
               for r in lmscore.ccnet_buckets(scored,
                                              exact=True).collect()}
        assert out[3] == "tail"  # noise ranks worst
